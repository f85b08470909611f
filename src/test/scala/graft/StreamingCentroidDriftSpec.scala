package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twin #28: the streamed per-(label, pos) centroid sums assemble, at
  * every stream prefix, to the EXACT batch q294 drift report over the
  * delivered vectors — including the signed-sum subtlety (component
  * sums are not monotone, so the assembly picks the latest emission by
  * its monotone contribution count, never max(sum)).
  */
class StreamingCentroidDriftSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def tab(df: org.apache.spark.sql.DataFrame) = df
    .select(col("label"), col("n_vecs"), col("cos_to_global"),
      col("centroid_norm"))
    .as[(Long, Long, Double, Double)].collect()
    .map(r => r._1 -> (r._2,
      java.lang.Double.doubleToRawLongBits(r._3),
      java.lang.Double.doubleToRawLongBits(r._4))).toMap

  test("streamed centroid sums assemble to the EXACT batch q294 at " +
      "every prefix with bounded |labels|*(d+1) state (RocksDB)") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val vecs = graft.core.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("label"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val batches = vecs.grouped((vecs.size + 2) / 3).toSeq
      val input = MemoryStream[(Long, Seq[Float], Int)](spark)
      val events = graft.streaming.StreamingCentroidDrift.componentEvents(
        input.toDS().toDF("vec_id", "embedding", "label"),
        "embedding", "label")
      val grouped = events.as[(String, Long)].groupByKey(_._1)
      val sink = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-scd").toString
      val q = graft.streaming.StreamingCentroidDrift.sums(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long, Long)],
           _: Long) =>
            b.collect().foreach { case (k, n, s) => sink(k) = (n, s) }
            ()
        }.start()
      var delivered = Seq.empty[(Long, Seq[Float], Int)]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        // bounded-state invariant: |labels|*(d+1) keys, no more
        val labels = delivered.map(_._3).distinct.size
        assert(sink.size <= labels * 65,
          "state must stay at |labels|*(d+1) entries")
        val assembled = tab(
          graft.streaming.StreamingCentroidDrift.assembleDrift(
            sink.toSeq.map { case (k, (n, s)) => (k, n, s) }
              .toDF("k", "n", "s")))
        val expected = tab(graft.llm.Similarity.centroidDrift(
          delivered.toDF("vec_id", "embedding", "label"),
          "vec_id", "embedding", "label"))
        assert(assembled === expected,
          s"prefix of ${delivered.size} vectors: drift reports differ")
      }
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

  test("assembleDrift dedupes the RAW appended history by the monotone " +
      "contribution count, not by max(sum) (signed sums shrink)") {
    // key c|0|0 history: sums 5 -> 2 (a negative component arrived):
    // the n=3 row must win even though its sum is SMALLER
    val appended = Seq(
      ("c|0|0", 2L, 5L), ("c|0|0", 3L, 2L),
      ("c|0|1", 1L, 4L),
      ("c|1|0", 1L, 3L), ("c|1|1", 2L, -6L),
      ("n|0", 3L, 3L), ("n|1", 2L, 2L)).toDF("k", "n", "s")
    val latestOnly = Seq(
      ("c|0|0", 3L, 2L), ("c|0|1", 1L, 4L),
      ("c|1|0", 1L, 3L), ("c|1|1", 2L, -6L),
      ("n|0", 3L, 3L), ("n|1", 2L, 2L)).toDF("k", "n", "s")
    val a = tab(graft.streaming.StreamingCentroidDrift
      .assembleDrift(appended))
    val b = tab(graft.streaming.StreamingCentroidDrift
      .assembleDrift(latestOnly))
    assert(a === b, "appended history must collapse to the latest totals")
  }
}
