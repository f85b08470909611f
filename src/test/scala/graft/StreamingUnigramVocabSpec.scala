package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 35th streaming twin
  * (`StreamingUnigramVocab`): after every stream prefix, retraining
  * the unigram-LM on the accumulated segment census equals the batch
  * `Unigram.train` over the same prefix piece for piece, on RocksDB —
  * with a mid-stream vocabulary flood that genuinely CHANGES earlier
  * seed/Viterbi decisions (a retrain, not an append), and state
  * bounded by the distinct-segment vocabulary.
  */
class StreamingUnigramVocabSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("twin #35: census retrain equals batch unigram train at every " +
      "prefix on RocksDB; a flood changes the trained vocabulary; " +
      "state = one counter per distinct segment") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (maxP, minC, rounds, lmax) = (4, 2L, 2, 12)
      // batch 1 establishes "ab"-heavy pieces; batch 2 floods "cdcd"
      // so substrings of it enter the seed (count >= 2) and win
      // Viterbi segmentations batch 1 never saw; batch 3 mixes
      val batches = Seq(
        Seq((1L, "ab ab abba"), (2L, "it ab")),
        Seq((3L, "cdcd cdcd cdcd cdcd cdcd cdcd")),
        Seq((4L, "ab cdcd ba it")))

      val input = MemoryStream[(Long, String)](spark)
      val grouped = graft.streaming.StreamingUnigramVocab.segmentEvents(
          input.toDS().toDF("doc_id", "text"), "text", lmax)
        .as[String].groupByKey(identity)
      val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-suv").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      def vocabOf(d: org.apache.spark.sql.DataFrame) =
        d.select(col("piece"), col("n_cnt"), col("score"))
          .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

      var delivered = Seq.empty[(Long, String)]
      val perPrefix = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(String, Long, Long)]]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val streamed = vocabOf(graft.streaming.StreamingUnigramVocab
          .assembleTrain(sink.toSeq.toDF("k", "n"), maxP, minC, rounds))
        val batchVocab = vocabOf(graft.llm.Unigram.train(
          delivered.toDF("doc_id", "text"), "text", maxP, minC, rounds,
          lmax))
        assert(streamed === batchVocab,
          s"prefix of ${delivered.size} docs: trained vocab differs")
        perPrefix += streamed
      }
      q.stop()
      // the retrain is a RETRAIN: the flood introduces multi-char
      // pieces absent from prefix 1, and re-scores everything (total
      // count changed, so even surviving pieces' scores move)
      val p1 = perPrefix(0).map(_._1).toSet
      val p2 = perPrefix(1).map(_._1).toSet
      assert((p2 -- p1).exists(_.length > 1),
        "the flood must introduce new multi-char pieces")
      val common = (p1 & p2).head
      val s1 = perPrefix(0).find(_._1 == common).get._3
      val s2 = perPrefix(1).find(_._1 == common).get._3
      assert(s1 != s2, "scores must re-normalize on retrain")
      // bounded state: one counter per DISTINCT segment ever seen
      val segs = delivered
        .flatMap(d => graft.llm.PreTokenize.segments(d._2))
        .filter(_.length <= lmax).toSet
      assert(sink.map(_._1).toSet === segs)
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
