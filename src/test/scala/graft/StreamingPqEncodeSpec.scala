package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 37th streaming twin
  * (`StreamingPqEncode`): after every stream prefix, the accumulated
  * PQ-encoded rows equal the batch `Pq.encodeLists` over the
  * `ivfBuildWith` lists of the same prefix — same coarse-assignment
  * ties, same integer-grid code ties, same exact Σ‖c‖² — on RocksDB,
  * with per-list state bounded by the list count (the encode itself is
  * stateless and narrow).
  */
class StreamingPqEncodeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("twin #37: streamed PQ encode equals the batch encodeLists at " +
      "every prefix on RocksDB; per-list counters stay bounded and " +
      "consistent") {
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
      // day-0 artifacts, both FIXED for the whole stream: the coarse
      // quantizer (8 seed centroids) and the per-subspace codebooks
      // trained on the 1-in-10 day-0 sample (q320's parameters)
      val quantizer: Seq[(Long, Seq[Double])] =
        all.take(8).map { case (id, v) => (id, v) }
      val quantDf = quantizer.toDF("cid", "cv")
      val cb = graft.llm.Pq.collectCodebooks(graft.llm.Pq.trainCodebooks(
        emb.where(col("vec_id") % 10 === 0), "vec_id", "v",
        dims = 64, m = 4, ksub = 8, iters = 2))

      val batches = Seq(
        all.slice(0, all.length / 3),
        all.slice(all.length / 3, 2 * all.length / 3),
        all.slice(2 * all.length / 3, all.length))

      val input = MemoryStream[(Long, Seq[Double])](spark)
      val enc = graft.streaming.StreamingPqEncode.encodeArrivals(
        input.toDS().toDF("vec_id", "v"), "vec_id", "v", quantizer, cb)
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Seq[Long], Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-spq").toString
      val q = enc
        .select(col("cid"), col("member"), col("codes"), col("pnrm2"))
        .as[(Long, Long, Seq[Long], Long)]
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(Long, Long, Seq[Long], Long)],
           _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      var delivered = Seq.empty[(Long, Seq[Double])]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val streamed = sink.toSeq.sortBy(r => (r._1, r._2))
        val batchRows = graft.llm.Pq.encodeLists(
            graft.llm.Similarity.ivfBuildWith(
              delivered.toDF("vec_id", "v"), "vec_id", "v", quantDf)
              .lists, cb)
          .select(col("cid"), col("member"), col("codes"), col("pnrm2"))
          .as[(Long, Long, Seq[Long], Long)].collect()
          .sortBy(r => (r._1, r._2)).toSeq
        assert(streamed === batchRows,
          s"prefix of ${delivered.size} vectors: encoded rows differ")
        // every member encoded exactly once; codes stay m-wide
        assert(streamed.map(_._2).distinct.size === delivered.size)
        assert(streamed.forall(_._3.size == 4))
      }
      q.stop()
      // the stateless encode pairs with twin #31's bounded per-list
      // counters: the encoded rows' per-list sizes ARE the counter
      // values a counter stream over the same arrivals would hold
      val perList = sink.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(perList.keySet.subsetOf(quantizer.map(_._1).toSet))
      assert(perList.values.sum === all.length.toLong)
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
