package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: assign documents to fixed
  * token-budget chunks (the standard concat-and-chunk formulation — docs
  * are laid out in a deterministic order and cut every `tokenBudget`
  * tokens, so chunk membership is a pure function of the corpus).
  *
  * Scale design: packing is inherently sequential WITHIN a stream of
  * documents, so the corpus is sharded first — (lang, doc_id % shards) —
  * and each shard packs independently. Shard count scales with corpus
  * size; the per-shard running sum is one window over a hash-partitioned,
  * locally-sorted shard (Spark's window sort spills), never a global sort.
  * Downstream loaders consume (lang, shard, chunk_id) groups.
  */
object Packing {

  /** One row per doc: (doc_id, lang, shard, tok_count, chunk_id).
    * chunk_id = which `tokenBudget`-sized chunk the document STARTS in,
    * per (lang, shard), docs ordered by id.
    */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
                 langCol: String, tokenBudget: Int, shards: Int): DataFrame =
    packChunksByCount(
      docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        TextFunctions.tokenCount(col(textCol)).as("tok_count")),
      "doc_id", "lang", "tok_count", tokenBudget, shards)

  /** [[packChunks]] over a PRECOMPUTED token count — the integration
    * point for real tokenizer counts ([[Bpe.encodeIds]]'s n_symbols):
    * pack boundaries then reflect what the trainer actually loads,
    * not the whitespace proxy.
    */
  def packChunksByCount(docs: DataFrame, idCol: String, langCol: String,
                        countCol: String, tokenBudget: Int,
                        shards: Int): DataFrame = {
    require(tokenBudget > 0 && shards > 0)
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(countCol).cast("long").as("tok_count"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("chunk_id",
        floor((sum(col("tok_count")).over(w) - col("tok_count"))
          / lit(tokenBudget.toLong)))
  }

  /** Overlapping fixed-size chunking (RAG / context-window prep): split
    * each document's token stream into `window`-token chunks starting
    * every `stride` tokens (overlap = window − stride). Starts are
    * 0, stride, 2·stride, …, up to the smallest multiple of stride whose
    * chunk reaches the tail — every token is covered and no chunk is
    * pure overlap; the final chunk may be shorter than `window`. A doc
    * with no tokens yields one empty chunk (the doc stays addressable).
    *
    * One generator + narrow map per document — no shuffle, and the
    * per-doc fan-out is len/stride rows, a constant factor of input size.
    */
  def chunkWithOverlap(docs: DataFrame, idCol: String, textCol: String,
                       window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    // integer ceil((n-window)/stride) via double floor — exact for any
    // real document length, engine-portable (mirrors the oracle verbatim)
    val extra = when(col("n_tok") > window,
      floor((col("n_tok") - lit(window) + lit(stride - 1))
        / lit(stride.toDouble)).cast("long")).otherwise(lit(0L))
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("n_tok", size(col("t")).cast("long"))
      .withColumn("n_chunks", lit(1L) + extra)
      .select(col("doc_id"), col("n_tok"), col("t"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        least(lit(window.toLong),
          col("n_tok") - col("col") * stride).as("chunk_tokens"),
        concat_ws(" ", slice(col("t"),
          (col("col") * stride + 1).cast("int"),
          lit(window))).as("chunk_text"))
  }

  /** Deterministic epoch shuffle: a pure-function permutation of the
    * corpus for training-data ordering. `shard` routes each doc to a
    * loader shard by portable hash; `pos` orders within the shard by a
    * second, independent hash (ties by id). A new epoch is a new `seed` —
    * no RNG state, reproducible on any engine or cluster layout, and each
    * shard orders independently (one window per hash partition whose sort
    * spills; never a global sort).
    */
  def epochShuffle(docs: DataFrame, idCol: String, shards: Int,
                   seed: Int): DataFrame = {
    require(shards > 0)
    val h = (s: Int) => TextFunctions.portableHash(
      col("doc_id").cast("string"), seed = s)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sort_key"), col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"))
      .withColumn("shard", pmod(h(seed), lit(shards.toLong)))
      .withColumn("sort_key", h(seed + 1))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }
}
