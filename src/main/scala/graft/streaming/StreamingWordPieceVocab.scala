package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the q323 WordPiece trainer — the 36th twin: the
  * published-score train (pair census, UNIT census, score argmax,
  * greedy rewrite — all per round) is a pure function of the
  * WORD-frequency census, so an unbounded document stream only
  * maintains one long counter per DISTINCT lowercase word (the
  * [[StreamingLm]] counter pattern — state bounded by content, never
  * stream length), and retraining on the accumulated census
  * ([[assembleTrain]] → [[graft.llm.WordPiece.trainFromWords]]) IS the
  * batch train over the delivered prefix, rule for rule and score for
  * score.
  *
  * This closes the tokenizer-refresh loop for the THIRD family exactly
  * like twins #32 (BPE) and #35 (unigram) — and unlike a raw-count
  * trainer, a flood of SINGLE-symbol words can flip a score argmax
  * without adding a single pair occurrence (the denominators move),
  * which the twin spec exercises.
  */
object StreamingWordPieceVocab {

  /** One count event per lowercase word occurrence (exactly the
    * census [[graft.llm.Bpe.charVocab]] aggregates).
    */
  def wordEvents(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
      graft.llm.TextFunctions.tokens(col(textCol))).as("k"))

  /** Batch WordPiece train over any (k, n) counter table emitted by
    * [[StreamingLm.counters]] on [[wordEvents]] — dedupes cumulative
    * re-emissions via max (counters are monotone, so an at-least-once
    * sink cannot inflate the census), then runs the full score-argmax
    * loop.
    */
  def assembleTrain(counts: DataFrame, rounds: Int): DataFrame =
    graft.llm.WordPiece.trainFromWords(
      counts.groupBy(col("k")).agg(max(col("n")).cast("long")
          .as("weight"))
        .select(col("k").as("w"), col("weight")),
      rounds)
}
