package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 26th streaming twin
  * (`StreamingDomainCaps`): after every stream prefix, the version-max
  * snapshot assembly equals the batch per-domain top-k over the same
  * prefix — with arrival order shuffled so late-arriving smaller
  * priorities EVICT previously-kept docs (the retroactive verdict a
  * per-arrival design cannot repair), and per-domain state bounded at
  * k pairs however many docs stream through.
  */
class StreamingDomainCapsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("snapshot assembly equals batch per-domain top-k at every " +
      "prefix, on RocksDB, with late evictions") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 3
      // 2 domains x 40 docs, delivered in a seed-shuffled order so
      // every batch can reshuffle some domain's top-3
      val docs = (1L to 80L).map { id =>
        val host = if (id % 2 == 0) s"www.evens.com" else s"www.odds.com"
        (id, host)
      }
      val shuffled = new scala.util.Random(7).shuffle(docs)
      val batches = shuffled.grouped(20).toSeq

      val input = MemoryStream[(Long, String)](spark)
      val grouped = graft.streaming.StreamingDomainCaps.events(
          input.toDS().toDF("doc_id", "host"), "doc_id", "host")
        .as[(String, Long, Long)].groupByKey(_._1)
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sdc").toString
      val q = graft.streaming.StreamingDomainCaps.caps(grouped, k)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long, Long, Long, Long)],
           _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      def batchTopK(delivered: Seq[(Long, String)])
          : Map[String, Seq[(Long, Long, Long)]] = {
        val ev = delivered.toDF("doc_id", "host")
        graft.streaming.StreamingDomainCaps.events(ev, "doc_id", "host")
          .as[(String, Long, Long)].collect()
          .groupBy(_._1).map { case (dom, rows) =>
            dom -> rows.map(r => (r._3, r._2)).sorted.take(k)
              .zipWithIndex
              .map { case ((p, d), i) => (d, p, (i + 1).toLong) }.toSeq
          }
      }

      var delivered = Seq.empty[(Long, String)]
      var sawEviction = false
      var lastKept = Map.empty[String, Set[Long]]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val assembled = graft.streaming.StreamingDomainCaps.assembleKept(
            sink.toSeq.toDF("domain", "doc_id", "prio", "rnk", "version"))
          .as[(String, Long, Long, Long)].collect()
          .groupBy(_._1).map { case (dom, rows) =>
            dom -> rows.sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq
          }
        val expected = batchTopK(delivered)
        assert(assembled === expected,
          s"prefix of ${delivered.size} docs: top-k marking differs")
        val kept = assembled.map { case (d2, rs) =>
          d2 -> rs.map(_._1).toSet }
        if (lastKept.exists { case (d2, s2) =>
            kept.get(d2).exists(now => (s2 -- now).nonEmpty) })
          sawEviction = true
        lastKept = kept
      }
      q.stop()
      assert(sawEviction,
        "fixture must evict a previously-kept doc mid-stream")
      // bounded state: every snapshot carries at most k rows per domain
      sink.groupBy(r => (r._1, r._5)).values.foreach { rows =>
        assert(rows.size <= k)
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("assembleKept is idempotent under at-least-once re-delivery of " +
      "the latest snapshot") {
    // the same version-2 snapshot delivered twice (sink replay) must
    // not duplicate (domain, doc_id) rows in the assembly
    val once = Seq(
      ("a.com", 1L, 10L, 1L, 1L),
      ("a.com", 1L, 10L, 1L, 2L), ("a.com", 2L, 20L, 2L, 2L))
    val replayed = once ++ Seq(
      ("a.com", 1L, 10L, 1L, 2L), ("a.com", 2L, 20L, 2L, 2L))
    def kept(rows: Seq[(String, Long, Long, Long, Long)]) =
      graft.streaming.StreamingDomainCaps.assembleKept(
          rows.toDF("domain", "doc_id", "prio", "rnk", "version"))
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(kept(replayed) === kept(once))
    assert(kept(once) === Seq(("a.com", 1L, 10L, 1L),
      ("a.com", 2L, 20L, 2L)))
  }
}
