package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 30th streaming twin
  * (`StreamingBpeVocab`): after every stream prefix, retraining on the
  * accumulated word census equals the batch `Bpe.train` over the same
  * prefix rule for rule, on RocksDB — with fresh vocabulary arriving
  * mid-stream so later prefixes genuinely CHANGE earlier merge
  * decisions (a retrain, not an append), and state bounded by the
  * distinct-word vocabulary.
  */
class StreamingBpeVocabSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("census retrain equals batch train at every prefix, on RocksDB; " +
      "late vocabulary flips an early merge decision") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // batch 1 makes (a,b) dominate; batch 2 floods (c,d) pairs so a
      // retrain reorders the merge list; batch 3 adds chaining words
      val batches = Seq(
        Seq((1L, "ab ab ab abx"), (2L, "cd ye ye")),
        Seq((3L, "cd cd cd cd cd cd"), (4L, "abcd")),
        Seq((5L, "abab cdcd abcdab"), (6L, "ye ab cd")))
      val rounds = 4

      val input = MemoryStream[(Long, String)](spark)
      val grouped = graft.streaming.StreamingBpeVocab.wordEvents(
          input.toDS().toDF("doc_id", "text"), "text")
        .as[String].groupByKey(identity)
      val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sbv").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      def rulesOf(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(col("merge_round"))
          .select(col("merge_round"), col("x"), col("y"), col("pair_n"),
            col("mass_after"))
          .as[(Long, String, String, Long, Long)].collect().toSeq

      var delivered = Seq.empty[(Long, String)]
      val perPrefix = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, String, String, Long, Long)]]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val streamed = rulesOf(graft.streaming.StreamingBpeVocab
          .assembleTrain(sink.toSeq.toDF("k", "n"), rounds))
        val batchRules = rulesOf(graft.llm.Bpe.train(
          delivered.toDF("doc_id", "text"), "text", rounds))
        assert(streamed === batchRules,
          s"prefix of ${delivered.size} docs: merge rules differ")
        perPrefix += streamed
      }
      q.stop()
      // the retrain is a RETRAIN: batch 2's (c,d) flood must change
      // prefix 1's first merge, not just append to it
      assert(perPrefix(0).head._2 + perPrefix(0).head._3 === "ab")
      assert(perPrefix(1).head._2 + perPrefix(1).head._3 === "cd",
        "late vocabulary must flip the first merge decision")
      // bounded state: one counter per DISTINCT word ever seen
      val words = delivered.flatMap(_._2.split("\\s+")).toSet
      assert(sink.map(_._1).toSet === words)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("twin #32: SEGMENT census retrain (byte-level, case/space " +
      "preserved) equals the batch segment train at every prefix on " +
      "RocksDB; a flood of space-prefixed segments flips the first " +
      "merge; state = one counter per distinct segment") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val g = graft.llm.ByteLevel.byteToChar(0x20) // Ġ
      // batch 1 makes (s, o) dominate; batch 2 floods " xq" segments
      // so the retrain's FIRST merge becomes the space-prefixed
      // (Ġ, x) — a decision a lowercase word census cannot express;
      // batch 3 adds mixed case (distinct segments, not folded)
      val batches = Seq(
        Seq((1L, "so so soso"), (2L, "It's so")),
        Seq((3L, "xq xq xq xq xq xq xq xq xq xq xq")),
        Seq((4L, "So SO so xq")))
      val rounds = 4

      val input = MemoryStream[(Long, String)](spark)
      val grouped = graft.streaming.StreamingBpeVocab.segmentEvents(
          input.toDS().toDF("doc_id", "text"), "text")
        .as[String].groupByKey(identity)
      val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sbv32").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      def rulesOf(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(col("merge_round"))
          .select(col("merge_round"), col("x"), col("y"), col("pair_n"),
            col("mass_after"))
          .as[(Long, String, String, Long, Long)].collect().toSeq

      var delivered = Seq.empty[(Long, String)]
      val perPrefix = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, String, String, Long, Long)]]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val streamed = rulesOf(graft.streaming.StreamingBpeVocab
          .assembleTrainBytes(sink.toSeq.toDF("k", "n"), rounds))
        val batchRules = rulesOf(graft.llm.Bpe.trainFromVocab(
          graft.llm.Bpe.segmentVocabBytes(
            delivered.toDF("doc_id", "text"), "text"), rounds))
        assert(streamed === batchRules,
          s"prefix of ${delivered.size} docs: segment merge rules differ")
        perPrefix += streamed
      }
      q.stop()
      assert(perPrefix(0).head._2 + perPrefix(0).head._3 === "so")
      // flood arithmetic: (x,q) = 11 (one bare "xq" + ten " xq"),
      // (Ġ,x) = 10 — so round 1 flips to (x, q) and round 2 learns
      // the SPACE-PREFIXED (Ġ, xq), which a word census cannot
      assert(perPrefix(1).head._2 + perPrefix(1).head._3 === "xq",
        "the flood must flip the first merge")
      assert(perPrefix(1)(1)._2 === g && perPrefix(1)(1)._3 === "xq",
        "round 2 must learn the space-prefixed merge")
      // bounded state: one counter per DISTINCT segment (case
      // preserved — "So"/"SO"/" so" are distinct keys)
      val segs = delivered
        .flatMap(d => graft.llm.PreTokenize.segments(d._2)).toSet
      assert(sink.map(_._1).toSet === segs)
      assert(Seq(" so", "So", " SO").forall(segs.contains))
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
