package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 23rd streaming twin
  * (`StreamingLeakage`): after every stream prefix, assembling the
  * emitted chunk counters reproduces the chunk-level split-leakage
  * audit an independent brute-force replay derives from the same
  * prefix — including the arrival-order case where an eval chunk
  * lands BEFORE its train twin (not leaked at that prefix, leaked at
  * the next), which an emit-at-arrival design could never report
  * correctly.
  */
class StreamingLeakageSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def h(s: String): Long =
    graft.llm.Similarity.portableHashLocal(s)

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filterNot(_.isEmpty)

  private def splitOf(id: Long): String = {
    val b = h(s"21|$id") % 100
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  /** Brute-force q268 audit over a delivered prefix. */
  private def brute(docs: Seq[(Long, String)])
      : Map[String, (Long, Long, Long)] = {
    val chunks = docs.flatMap { case (id, text) =>
      toks(text).grouped(20).map(c =>
        (splitOf(id), c.length.toLong, h(s"7|${c.mkString(" ")}")))
    }
    val trainSet = chunks.collect { case ("train", _, ch) => ch }.toSet
    chunks.filterNot(_._1 == "train").groupBy(_._1).map {
      case (split, rows) =>
        val leaked = rows.filter(r => trainSet.contains(r._3))
        split -> (rows.size.toLong, leaked.size.toLong,
          leaked.map(_._2).sum)
    }
  }

  test("streaming leakage counters assemble to the brute-force audit " +
      "at every prefix, on RocksDB, surviving eval-before-train arrival") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
      // deliver NON-train docs first within each third: eval chunks
      // whose train twin arrives in a later batch exercise the
      // becomes-leaked transition
      val reordered = docs.sortBy { case (id, _) =>
        (splitOf(id) == "train", id)
      }
      val batches = reordered.grouped((docs.size + 2) / 3).toSeq
      val input = MemoryStream[(Long, String)](spark)
      val events = graft.streaming.StreamingLeakage.chunkEvents(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text")
      val grouped = events.as[(Long, Long, Long)].groupByKey(_._1)
      // RAW appended sink — every emitted snapshot kept, so the
      // assembly's monotone-max dedupe is exercised for real
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Boolean, Long, Long, Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-slk").toString
      val q = graft.streaming.StreamingLeakage.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[
             (Long, Boolean, Long, Long, Long, Long)], _: Long) =>
            sink ++= b.collect()
            ()
        }.start()
      var delivered = Seq.empty[(Long, String)]
      var sawPending = false
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val assembled = graft.streaming.StreamingLeakage.assembleAudit(
            sink.toSeq.toDF("chash", "train_seen", "val_n", "val_toks",
              "test_n", "test_toks"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val expected = brute(delivered)
        assert(assembled === expected,
          s"prefix of ${delivered.size} docs: audits differ")
        // the transition case is only proven if some prefix has
        // unleaked eval chunks that later prefixes convert
        if (expected.values.exists(v => v._2 < v._1)) sawPending = true
      }
      q.stop()
      assert(sawPending,
        "fixture must exercise eval chunks pending their train twin")
      val finalAudit = brute(delivered)
      assert(finalAudit.values.exists(_._2 > 0),
        "fixture must contain actual leaks at the end")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("assembleAudit matches batch q268 on the full fixture") {
    val counters = graft.llm.ChunkDedup.chunkMembership(
        graft.core.Tables.documents(spark, sfDir), "doc_id", "text", 20, 7)
      .withColumn("split",
        graft.llm.TextFunctions.splitAssign(col("doc_id")))
      .groupBy(col("chash"))
      .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.when(col("split") === "train",
            true).otherwise(false)).as("train_seen"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("split") === "val", 1L)
            .otherwise(0L)).as("val_n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("split") === "val",
            col("ctoks")).otherwise(0L)).as("val_toks"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("split") === "test", 1L)
            .otherwise(0L)).as("test_n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("split") === "test",
            col("ctoks")).otherwise(0L)).as("test_toks"))
    val assembled = graft.streaming.StreamingLeakage
      .assembleAudit(counters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    val batch = SparkEntry.queries("q268_split_leakage")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    assert(assembled === batch,
      "counter-table assembly must equal the batch audit")
  }

  test("counters survive stop/restart from checkpoint (RocksDB): the " +
      "post-restart assembly still equals the batch audit") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-slk-restart").toString
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
        .sortBy { case (id, _) => (splitOf(id) == "train", id) }
      def addFile(tag: String, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/stage")
        val part = new java.io.File(s"$dir/stage").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$dir/in"))
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/in/$tag.parquet"))
      }
      val cut = (docs.size * 2) / 3
      addFile("a", docs.take(cut))
      val schema = spark.read.parquet(s"$dir/in").schema
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Boolean, Long, Long, Long, Long)]
      def run(): Unit = {
        val stream = spark.readStream.schema(schema)
          .parquet(s"$dir/in")
        val events = graft.streaming.StreamingLeakage.chunkEvents(
          stream, "doc_id", "text")
        val q = graft.streaming.StreamingLeakage.counters(
            events.as[(Long, Long, Long)].groupByKey(_._1))
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[
               (Long, Boolean, Long, Long, Long, Long)], _: Long) =>
              sink ++= b.collect()
              ()
          }.start()
        q.processAllAvailable(); q.stop()
      }
      run()
      // the train tail lands while the query is DOWN — the restart must
      // resume the per-chash state, not recount the first file
      addFile("b", docs.drop(cut))
      run()
      val assembled = graft.streaming.StreamingLeakage.assembleAudit(
          sink.toSeq.toDF("chash", "train_seen", "val_n", "val_toks",
            "test_n", "test_toks"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(assembled === brute(docs),
        "restarted counters must assemble to the full-corpus audit")
      assert(assembled.values.exists(_._2 > 0), "leaks present at the end")
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
