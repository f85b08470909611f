package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 36th streaming twin
  * (`StreamingWordPieceVocab`): after every stream prefix, retraining
  * WordPiece on the accumulated word census equals the batch
  * `WordPiece.train` over the same prefix rule for rule and score for
  * score, on RocksDB — with a mid-stream flood of SINGLE-SYMBOL words
  * that flips the published-score argmax without adding one pair
  * occurrence (only the denominators move), and state bounded by the
  * distinct-word vocabulary.
  */
class StreamingWordPieceVocabSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("twin #36: census retrain equals batch WordPiece train at " +
      "every prefix on RocksDB; a unit-count flood flips the score " +
      "argmax; state = one counter per distinct word") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rounds = 4
      // batch 1: (a,b) wins round 1 — score 2/(2·2)=0.5 beats (c,d)'s
      // 3/(3·3)=0.33. batch 2 floods the single-symbol word "a": m_a
      // jumps to 12, score(a,b) = 2/(12·2) ≈ 0.083 — (c,d) now wins
      // round 1 with NO new pair anywhere. batch 3 mixes.
      val batches = Seq(
        Seq((1L, "ab ab cd cd cd")),
        Seq((2L, "a a a a a a a a a a")),
        Seq((3L, "ab cd a ef")))

      val input = MemoryStream[(Long, String)](spark)
      val grouped = graft.streaming.StreamingWordPieceVocab.wordEvents(
          input.toDS().toDF("doc_id", "text"), "text")
        .as[String].groupByKey(identity)
      val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-swpv").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      def rulesOf(d: org.apache.spark.sql.DataFrame) =
        d.select(col("merge_round"), col("x"), col("y"), col("pair_n"),
            col("score"))
          .as[(Long, String, String, Long, Double)].collect()
          .sortBy(_._1).toSeq

      var delivered = Seq.empty[(Long, String)]
      val perPrefix = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, String, String, Long, Double)]]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val streamed = rulesOf(graft.streaming.StreamingWordPieceVocab
          .assembleTrain(sink.toSeq.toDF("k", "n"), rounds))
        val batchRules = rulesOf(graft.llm.WordPiece.train(
          delivered.toDF("doc_id", "text"), "text", rounds))
        assert(streamed === batchRules,
          s"prefix of ${delivered.size} docs: trained rules differ")
        perPrefix += streamed
      }
      q.stop()
      // the flood flipped round 1's argmax: (a,b) before, (c,d) after
      assert(perPrefix(0).head._2 == "a" && perPrefix(0).head._3 == "b",
        s"prefix 1 round 1 must merge (a,b): ${perPrefix(0).head}")
      assert(perPrefix(1).head._2 == "c" && perPrefix(1).head._3 == "d",
        s"the flood must flip round 1 to (c,d): ${perPrefix(1).head}")
      // bounded state: one counter per DISTINCT word ever seen
      val words = delivered.flatMap(_._2.split("\\s+"))
        .filter(_.nonEmpty).map(_.toLowerCase).toSet
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
}
