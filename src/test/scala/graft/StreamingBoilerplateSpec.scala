package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 24th streaming twin
  * (`StreamingBoilerplate`): after every stream prefix, assembling
  * the emitted counters reproduces batch `Boilerplate.sourceMass`
  * over the same prefix — including lines that only BECOME
  * boilerplate once enough repeats have arrived (the ratio-verdict
  * case a per-arrival design cannot report).
  */
class StreamingBoilerplateSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("streaming boilerplate counters assemble to the batch mass " +
      "report at every prefix, on RocksDB") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)].collect().toSeq
      val batches = docs.grouped((docs.size + 2) / 3).toSeq
      val input = MemoryStream[(Long, String, String)](spark)
      val events = graft.streaming.StreamingBoilerplate.lineEvents(
        input.toDS().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source")
      val grouped = events.as[(String, Long, Long)].groupByKey(_._1)
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sbp").toString
      val q = graft.streaming.StreamingBoilerplate.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long, Long, Long)],
           _: Long) =>
            sink ++= b.collect()
            ()
        }.start()
      def audit(df: org.apache.spark.sql.DataFrame)
          : Map[String, (Long, Long, Long, Long, Long)] =
        df.collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_lines"),
            r.getAs[Long]("boiler_lines"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("removed_tokens"))).toMap
      var delivered = Seq.empty[(Long, String, String)]
      var sawLateBoiler = false
      var lastBoiler = Map.empty[String, Long]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val assembled = audit(
          graft.streaming.StreamingBoilerplate.assembleMass(
            sink.toSeq.toDF("k", "df", "occ", "toks")))
        val expected = audit(graft.llm.Boilerplate.sourceMass(
          delivered.toDF("doc_id", "text", "source"),
          "doc_id", "text", "source", c = 10, seed = 11))
        assert(assembled === expected,
          s"prefix of ${delivered.size} docs: mass reports differ")
        // a source whose boiler_lines GREW exercises the
        // becomes-boilerplate transition
        val bl = assembled.map { case (s, v) => s -> v._3 }
        if (bl.exists { case (s, n) =>
            n > 0 && lastBoiler.getOrElse(s, -1L) >= 0 &&
              n > lastBoiler(s) }) sawLateBoiler = true
        lastBoiler = bl
      }
      q.stop()
      assert(lastBoiler.values.exists(_ > 0),
        "fixture must produce some boilerplate by the end")
      assert(sawLateBoiler,
        "fixture must exercise lines becoming boilerplate mid-stream")
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
