package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 31st streaming twin
  * (`StreamingIvfLists`): after every stream prefix, the profile
  * assembled from the monotone per-list counters equals the per-list
  * membership of the batch `ivfBuildWith` over the same prefix under
  * the same FIXED quantizer, on RocksDB — zero-member lists visible,
  * state bounded by the list count.
  */
class StreamingIvfListsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("streamed list counters equal the batch index build at every " +
      "prefix, on RocksDB; empty lists stay visible; state is bounded " +
      "by the list count") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val emb = graft.core.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val all = emb.as[(Long, Seq[Double])].collect().sortBy(_._1)
      assert(all.length >= 30)
      // the fixed quantizer: an index built on "day 0" from the 8
      // smallest ids, PLUS one zero-norm centroid no vector can ever
      // win (its cosine is null -> the -2.0 sentinel, below any real
      // score) — the always-empty list the profile must keep visible
      val quantizer: Seq[(Long, Seq[Double])] =
        all.take(8).map { case (id, v) => (id, v) } :+
          (9999L, Seq.fill(64)(0.0))
      val quantDf = quantizer.toDF("cid", "cv")

      // three arrival waves
      val batches = Seq(
        all.slice(0, all.length / 3),
        all.slice(all.length / 3, 2 * all.length / 3),
        all.slice(2 * all.length / 3, all.length))

      val input = MemoryStream[(Long, Seq[Double])](spark)
      val grouped = graft.streaming.StreamingIvfLists.assignEvents(
          input.toDS().toDF("vec_id", "v"), "v", quantizer)
        .as[String].groupByKey(identity)
      val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sil").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      var delivered = Seq.empty[(Long, Seq[Double])]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val streamed = graft.streaming.StreamingIvfLists
          .assembleProfile(sink.toSeq.toDF("k", "n"), quantizer)
          .select(col("cid"), col("n_members"))
          .as[(Long, Long)].collect().toMap
        val batchLists = graft.llm.Similarity.ivfBuildWith(
            delivered.toDF("vec_id", "v"), "vec_id", "v", quantDf)
          .lists.groupBy(col("cid"))
          .agg(count(lit(1)).cast("long").as("n"))
          .as[(Long, Long)].collect().toMap
        val batchAll = quantizer.map(_._1)
          .map(c => c -> batchLists.getOrElse(c, 0L)).toMap
        assert(streamed === batchAll,
          s"prefix of ${delivered.size} vectors: list sizes differ")
        assert(streamed.values.sum === delivered.size.toLong,
          "every arrival lands in exactly one list")
        assert(streamed(9999L) === 0L, "the empty list stays visible")
      }
      q.stop()
      // bounded state: one counter per list that ever received a
      // member — never more keys than lists
      assert(sink.map(_._1).toSet.size <= quantizer.size)
      // share column sums to 1 over the final profile
      val shares = graft.streaming.StreamingIvfLists
        .assembleProfile(sink.toSeq.toDF("k", "n"), quantizer)
        .select(col("share")).as[Double].collect()
      assert(math.abs(shares.sum - 1.0) < 1e-9)
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
