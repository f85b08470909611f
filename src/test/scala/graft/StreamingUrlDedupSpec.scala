package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 29th streaming twin
  * (`StreamingUrlDedup`): after every stream prefix, the streamed
  * first-occurrence marking equals the batch
  * canonicalize→min-doc_id marking over the same prefix (q285's
  * recipe), on RocksDB — including spellings that only collide AFTER
  * canonicalization (case, www, tracking params, percent-escapes,
  * param order), null-canon passthrough, and re-delivered rows keeping
  * their original flags.
  */
class StreamingUrlDedupSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("streamed URL dedup equals batch q285 marking at every prefix, " +
      "on RocksDB; re-delivery re-emits the same flags") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // 40 docs in doc_id order; 4 spellings per site that all
      // canonicalize to https://site<k>.com/a?z=1, plus a null-canon
      // row every 10th doc
      val docs = (1L to 40L).map { id =>
        val k = id % 5
        val url = (id % 10) match {
          case 0 => "not a url"
          case m if m % 4 == 1 => s"https://site$k.com/a?z=1"
          case m if m % 4 == 2 => s"https://WWW.site$k.com/a/?z=1#f"
          case m if m % 4 == 3 => s"https://site$k.com/a?utm_source=x&z=1"
          case _ => s"https://site$k.com/%61?fbclid&z=1"
        }
        (id, url)
      }
      val batches = docs.grouped(10).toSeq

      val input = MemoryStream[(Long, String)](spark)
      val marked = graft.streaming.StreamingUrlDedup.markUrls(
        input.toDS().toDF("doc_id", "url"), "doc_id", "url")
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Boolean)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sud").toString
      val q = marked.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(Long, String, Boolean)],
           _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      var delivered = Seq.empty[(Long, String)]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val expected = graft.streaming.StreamingUrlDedup.batchMark(
            delivered.toDF("doc_id", "url"), "doc_id", "url")
          .as[(Long, Option[String], Boolean)].collect()
          .map(r => (r._1, r._2.orNull, r._3)).toSet
        assert(sink.toSet === expected,
          s"prefix of ${delivered.size} docs: marking differs")
      }
      // canonicalization must actually be doing the bucketing: each
      // site keeps exactly ONE of its many spellings
      val kept = sink.filter(r => r._3 && r._2 != null)
      assert(kept.map(_._2).toSet.size === kept.size)
      assert(kept.size === 5, "one keeper per canonical site bucket")
      assert(sink.count(r => r._2 == null && r._3) === 4,
        "null-canon rows all pass through kept")

      // re-delivery: the same rows again -> byte-identical flags, no
      // keeper churn
      val before = sink.toSet
      input.addData(batches.head: _*)
      q.processAllAvailable()
      assert(sink.toSet === before,
        "re-delivered rows must re-emit the original flags")
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
