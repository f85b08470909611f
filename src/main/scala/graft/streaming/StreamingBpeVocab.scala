package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** Streaming face of the q272 BPE trainer (the 30th twin): a
  * continuously maintained tokenizer-training CENSUS over an unbounded
  * document stream. The insight that makes this a bounded-state twin:
  * BPE training is a pure function of the word-frequency table, not of
  * the documents — so the stream only has to maintain one long counter
  * per DISTINCT word (the [[StreamingLm]] counter pattern, state
  * bounded by the vocabulary, never by stream length), and retraining
  * on the accumulated census ([[assembleTrain]] →
  * [[graft.llm.Bpe.trainFromVocab]]) IS the batch train over the
  * delivered prefix, rule for rule.
  *
  * This is the online form of the tokenizer-refresh loop: as a crawl
  * grows, each snapshot answers "what would the tokenizer look like if
  * we retrained now" without ever rescanning ingested text.
  *
  * Exactness contract (spec-verified on RocksDB): after any prefix of
  * batches, `assembleTrain(counters, rounds)` equals
  * `Bpe.train(prefixDocs, textCol, rounds)` row for row — counter
  * merging is addition, the census is monotone (latest total per word
  * = max, so an at-least-once OUTPUT sink re-delivering snapshot rows
  * cannot inflate it), and the train loop is deterministic (total
  * argmax order).
  */
object StreamingBpeVocab {

  /** One count event per token occurrence — the word-census feed
    * (same tokenization as batch [[graft.llm.Bpe.charVocab]]).
    */
  def wordEvents(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
      graft.llm.TextFunctions.tokens(col(textCol))).as("k"))

  /** Batch trainer over any (k, n) counter table emitted by
    * [[StreamingLm.counters]] on [[wordEvents]] — dedupes cumulative
    * re-emissions via max (counters are monotone), rebuilds the
    * char-split vocabulary exactly like `charVocab`, and trains.
    */
  def assembleTrain(counts: DataFrame, rounds: Int): DataFrame = {
    val wv = counts.groupBy(col("k")).agg(max(col("n")).as("weight"))
      .select(col("weight"),
        Bpe.applyMerges(col("k"), Nil).as("s")) // = charVocab's splitter
    Bpe.trainFromVocab(wv, rounds)
  }

  /** The PRODUCTION census feed (twin #32's stateless half): one count
    * event per GPT-2 SEGMENT — case preserved, spaces attached — the
    * same segmentation as batch [[graft.llm.Bpe.segmentVocabBytes]].
    * Segmentation is the codegen'd scanner; no shuffle before keyBy.
    */
  def segmentEvents(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
      graft.llm.PreTokenize.gptSegments(col(textCol))).as("k"))

  /** Byte-level retrain over the accumulated SEGMENT census — the
    * document-faithful tokenizer-refresh loop: equals
    * `Bpe.trainFromVocab(Bpe.segmentVocabBytes(prefixDocs, textCol))`
    * rule for rule at every prefix (the twin-#32 spec contract); the
    * learned merges live in the byte-remap symbol space (Ġ-prefixed
    * words merge), so they are drop-in rules for
    * `encodeIdsWith(byteLevel = true, preTokenize = true)`.
    */
  def assembleTrainBytes(counts: DataFrame, rounds: Int): DataFrame = {
    val wv = counts.groupBy(col("k")).agg(max(col("n")).as("weight"))
      .select(col("weight"),
        Bpe.applyMergesBytes(col("k"), Nil).as("s"))
    Bpe.trainFromVocab(wv, rounds)
  }
}
