package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composition contract for the streaming faces of pipeline stages
  * 0b→2b: streamed boilerplate COUNTERS (stateful, RocksDB) plus
  * streamed chunk MEMBERSHIP, assembled purely, must equal the batch
  * composition `Boilerplate.strip` → re-chunk retained text →
  * `ChunkDedup.firstOccurrence` over the same prefix — at EVERY
  * prefix, including the retroactive case where a line becoming
  * boilerplate mid-stream strips chunks that were previously kept
  * (and re-seats keepers onto later survivors).
  */
class StreamingCompositionSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def batchComposed(docs: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), (Long, Long, Long)] = {
    val stripped = graft.llm.Boilerplate
      .strip(docs, "doc_id", "text", "source", c = 10, seed = 11)
      .where(col("kept_tokens") > 0L)
      .select(col("doc_id"), col("retained_text"))
    val marked = graft.llm.ChunkDedup.firstOccurrence(
      graft.llm.ChunkDedup.chunkMembership(stripped, "doc_id",
        "retained_text", c = 10, seed = 11))
    collectPerChunk(marked)
  }

  /** (doc_id, chash) → (occurrences, kept, kept tokens). */
  private def collectPerChunk(marked: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), (Long, Long, Long)] =
    marked.groupBy(col("doc_id"), col("chash"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nk"),
        sum(when(col("kept"), col("ctoks")).otherwise(0L)).as("kt"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (d, h, n, nk, kt) => (d, h) -> ((n, nk, kt)) }.toMap

  test("streamed counters + membership assemble to the batch " +
      "strip->dedup composition at every prefix, on RocksDB, " +
      "including retroactive boilerplate strips") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // fixture: at prefix 1 the header lives in ONE web doc (df=1 <
      // minDf, its chunk is kept); batch 2 brings two more web
      // repeats (df=3 of nd=20, 15% >= 5% -> boilerplate), stripping
      // the prefix-1 chunk RETROACTIVELY. The same header in source
      // "alt" stays below threshold there (per-source verdicts), so
      // the header chash's keeper re-seats from web's doc 1 onto
      // alt's doc 30. Doc 13 duplicates doc 1's surviving line so
      // ordinary cross-doc dedup runs alongside.
      def filler(tag: String, n: Int) =
        (0 until n).map(i => s"$tag$i").mkString(" ")
      val header = filler("hdr", 10) // one 10-token line
      val web1: Seq[(Long, String, String)] =
        (Seq(1L -> s"$header ${filler("a", 10)}") ++
          (2L to 10L).map(i => i -> s"${filler(s"c$i", 20)}"))
          .map { case (id, t) => (id, t, "web") }
      val web2: Seq[(Long, String, String)] =
        (Seq(11L -> s"$header ${filler("d", 10)}",
          12L -> s"$header ${filler("e", 10)}",
          13L -> s"${filler("a", 10)} ${filler("f", 10)}") ++
          (14L to 20L).map(i => i -> s"${filler(s"g$i", 20)}"))
          .map { case (id, t) => (id, t, "web") }
      val alt2: Seq[(Long, String, String)] =
        Seq((30L, s"$header ${filler("z", 10)}", "alt"))
      val batches = Seq(web1, web2 ++ alt2)

      val input = MemoryStream[(Long, String, String)](spark)
      val streamDf = input.toDS().toDF("doc_id", "text", "source")
      val grouped = graft.streaming.StreamingBoilerplate
        .lineEvents(streamDf, "doc_id", "text", "source")
        .as[(String, Long, Long)].groupByKey(_._1)
      val counterSink = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long)]
      val memberSink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, String)]
      val ckpt1 = java.nio.file.Files
        .createTempDirectory("graft-comp1").toString
      val ckpt2 = java.nio.file.Files
        .createTempDirectory("graft-comp2").toString
      val q1 = graft.streaming.StreamingBoilerplate.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt1)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long, Long, Long)],
           _: Long) =>
            counterSink ++= b.collect()
            ()
        }.start()
      val q2 = graft.streaming.StreamingChunkDedup
        .membershipEvents(streamDf, "doc_id", "text", "source")
        .as[(Long, Long, Long, Long, String)]
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt2)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(Long, Long, Long, Long, String)],
           _: Long) =>
            memberSink ++= b.collect()
            ()
        }.start()

      var delivered = Seq.empty[(Long, String, String)]
      var prefix1Kept = Set.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (batch, bi) =>
        input.addData(batch: _*)
        q1.processAllAvailable()
        q2.processAllAvailable()
        delivered ++= batch
        val assembled = collectPerChunk(
          graft.streaming.StreamingChunkDedup.assembleStripped(
            counterSink.toSeq.toDF("k", "df", "occ", "toks"),
            memberSink.toSeq
              .toDF("doc_id", "chunk_idx", "ctoks", "chash", "source")))
        val expected = batchComposed(
          delivered.toDF("doc_id", "text", "source"))
        assert(assembled === expected,
          s"prefix ${delivered.size}: composed marking differs")
        if (bi == 0)
          prefix1Kept = assembled.filter(_._2._2 > 0).keySet
      }
      q1.stop(); q2.stop()
      // the retroactive transition really fired: a chunk kept at
      // prefix 1 (doc 1's header line) is GONE from the final
      // marking because its line became boilerplate...
      val finalMarked = collectPerChunk(
        graft.streaming.StreamingChunkDedup.assembleStripped(
          counterSink.toSeq.toDF("k", "df", "occ", "toks"),
          memberSink.toSeq
            .toDF("doc_id", "chunk_idx", "ctoks", "chash", "source")))
      val vanished = prefix1Kept -- finalMarked.keySet
      assert(vanished.nonEmpty,
        "fixture must strip a previously-kept chunk retroactively")
      // ...and its chash's keeper re-seated onto the alt-source copy
      val headerKeepers = finalMarked.collect {
        case ((d, h), (_, nk, _)) if vanished.exists(_._2 == h) && nk > 0 => d
      }
      assert(headerKeepers.toSet === Set(30L),
        "the surviving alt-source copy must become the keeper")
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
