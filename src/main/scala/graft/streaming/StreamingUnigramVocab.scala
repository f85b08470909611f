package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the q321 unigram-LM trainer — the 35th twin: the
  * hard-EM train is a pure function of the SEGMENT-frequency census
  * (seed substrings, every Viterbi E-step, and the M-step are all
  * derived from it), so an unbounded document stream only maintains
  * one long counter per DISTINCT segment (the [[StreamingLm]] counter
  * pattern — state bounded by content, never stream length), and
  * retraining on the accumulated census ([[assembleTrain]] →
  * [[graft.llm.Unigram.trainFromCensus]]) IS the batch train over the
  * delivered prefix, piece for piece.
  *
  * This closes the tokenizer-refresh loop for the second tokenizer
  * family exactly like twin #32 ([[StreamingBpeVocab]]) does for BPE:
  * each snapshot answers "what unigram vocabulary would we train right
  * now" without rescanning ingested text.
  */
object StreamingUnigramVocab {

  /** One count event per GPT-2 segment occurrence, with the batch
    * trainer's maxSegLen filter applied BEFORE the keyBy (the census
    * the twin maintains is exactly [[graft.llm.Unigram.segmentCensus]]).
    */
  def segmentEvents(docs: DataFrame, textCol: String,
                    maxSegLen: Int): DataFrame =
    docs.select(explode(
        graft.llm.PreTokenize.gptSegments(col(textCol))).as("k"))
      .where(length(col("k")) <= maxSegLen)

  /** Batch unigram train over any (k, n) counter table emitted by
    * [[StreamingLm.counters]] on [[segmentEvents]] — dedupes cumulative
    * re-emissions via max (counters are monotone, so an at-least-once
    * sink cannot inflate the census), then runs the full hard-EM loop.
    */
  def assembleTrain(counts: DataFrame, maxPieceLen: Int,
                    minCount: Long, rounds: Int): DataFrame =
    graft.llm.Unigram.trainFromCensus(
      counts.groupBy(col("k")).agg(max(col("n")).cast("long")
          .as("weight"))
        .select(col("k").as("w"), col("weight")),
      maxPieceLen, minCount, rounds)
}
