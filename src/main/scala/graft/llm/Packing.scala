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
  /** CROSS-DOCUMENT token packing — the GPT-style pretraining layout,
    * at the ID level: per shard, documents' id sequences concatenate
    * in doc_id order and cut every `blockTokens` ids, so block
    * boundaries genuinely cross documents (what the loader actually
    * mmaps; [[packChunks]] only assigns START chunks, and the per-doc
    * `Bpe.idBlocks` pads at doc boundaries).
    *
    * Scale shape: each doc's global offset is one per-shard window
    * cumsum over (doc_id, n_ids) rows (tiny — ids stay packed the
    * whole way); the (shard, block) aggregation is the linear
    * reshuffle any physical re-layout of the token stream must pay,
    * and it carries ONE (doc, block) row per id-array SLICE — never a
    * row per token (r16: blockTokens× fewer exchange rows, the ids
    * ride as packed arrays). Shard count is the parallelism knob — the
    * same contract as [[packChunks]] (a window per shard, never a
    * global sort).
    *
    * @param enc (doc_id, ids) — e.g. [[Bpe.encodeIds]] /
    *            [[Bpe.encodeIdsWith]] output
    * @return one row per (shard, block_id): n_ids (= blockTokens
    *         except each shard's truncating tail), n_docs contributing,
    *         first_doc, and the block's exact id hash
    */
  def packTokenBlocks(enc: DataFrame, idCol: String, idsCol: String,
                      blockTokens: Int, shards: Int): DataFrame = {
    require(blockTokens >= 1 && shards >= 1, "blockTokens, shards >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val off = enc.select(col(idCol).cast("long").as("doc_id"),
        col(idsCol).as("ids"))
      .where(size(col("ids")) > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("ns", size(col("ids")).cast("long"))
      .withColumn("off", dupGuardedOffset(w))
    // one SLICE row per (doc, block) instead of one row per TOKEN
    // (r16): a doc's ids are contiguous in the stream, so the
    // re-layout exchange carries blockTokens× fewer rows — the ids
    // stay packed as arrays — and each block reassembles by sorting
    // its disjoint slices by start offset. Values are identical: the
    // flattened slice order IS the gpos order.
    docBlockSlices(off, blockTokens)
      .groupBy(col("shard"), col("block_id"))
      .agg(sum(size(col("sl"))).cast("long").as("n_ids"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        sort_array(collect_list(struct(col("gpos0"), col("sl"))))
          .as("ord"))
      .select(col("shard"), col("block_id"), col("n_ids"), col("n_docs"),
        col("first_doc"),
        TextFunctions.portableHash(
          array_join(transform(flatten(col("ord.sl")),
            i => i.cast("string")), ","),
          31).as("block_hash"))
  }

  /** The (doc, block) slice rows behind [[packTokenBlocks]] /
    * [[packTokenBlocksLoader]]: for each doc spanning blocks
    * b0 = off div B .. b1 = (off+ns−1) div B, its id sub-array inside
    * each block, with the slice's global start `gpos0` (unique per
    * (block, doc) — slices of one block are disjoint ranges) and
    * whether the slice carries the doc's FIRST token (`has_start`,
    * the loader's attention-reset marker).
    */
  private def docBlockSlices(off: DataFrame,
                             blockTokens: Int): DataFrame = {
    val b = lit(blockTokens.toLong)
    // ns = 0 guard INSIDE the helper, not only at the callers: for an
    // empty doc whose offset sits exactly on a block boundary,
    // sequence(off div B, (off+ns-1) div B) is DESCENDING and would emit
    // spurious empty-slice rows that count the doc in n_docs/first_doc —
    // the old per-token posexplode form dropped such docs entirely
    off.where(col("ns") > 0)
      .select(col("shard"), col("doc_id"), col("off"), col("ns"),
        col("ids"),
        explode(sequence(expr(s"off div $blockTokens"),
          expr(s"(off + ns - 1) div $blockTokens"))).as("block_id"))
      .select(col("shard"), col("doc_id"), col("block_id"), col("off"),
        greatest(col("block_id") * b - col("off"), lit(0L)).as("s0"),
        least(col("ns"), (col("block_id") + 1) * b - col("off")).as("s1"),
        col("ids"))
      .select(col("shard"), col("doc_id"), col("block_id"),
        (col("off") + col("s0")).as("gpos0"),
        slice(col("ids"), (col("s0") + 1).cast("int"),
          (col("s1") - col("s0")).cast("int")).as("sl"),
        (col("s0") === 0).as("has_start"))
  }

  /** [[packTokenBlocks]] with the two details a real pretraining
    * loader additionally needs: an EOS separator id appended to every
    * document (GPT-2's <|endoftext|> — documents must not bleed into
    * each other without a boundary token) and, per block, the sorted
    * 0-based OFFSETS where a new document starts (the attention-reset
    * map: positions whose attention must not look back past them).
    * Same per-shard cumsum + explode + (shard, block) agg shape — the
    * boundary offsets ride the same aggregate (doc-start tokens are
    * marked before the explode, no extra pass).
    *
    * @return (shard, block_id, n_ids, n_docs, first_doc, block_hash,
    *         boundaries) — `boundaries` is the comma-joined offsets of
    *         doc-start tokens inside the block ("" when the block is
    *         pure continuation).
    */
  def packTokenBlocksLoader(enc: DataFrame, idCol: String,
                            idsCol: String, blockTokens: Int,
                            shards: Int, eosId: Long): DataFrame = {
    require(blockTokens >= 1 && shards >= 1, "blockTokens, shards >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val off = enc.select(col(idCol).cast("long").as("doc_id"),
        concat(col(idsCol), array(lit(eosId))).as("ids"))
      .where(size(col("ids")) > 1) // >1: ids + the appended EOS
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("ns", size(col("ids")).cast("long"))
      .withColumn("off", dupGuardedOffset(w))
    // (doc, block) slice rows, not per-token rows — see
    // [[packTokenBlocks]]; the doc-start boundary is the slice that
    // carries the doc's first token, at offset gpos0 mod blockTokens
    docBlockSlices(off, blockTokens)
      .groupBy(col("shard"), col("block_id"))
      .agg(sum(size(col("sl"))).cast("long").as("n_ids"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        sort_array(collect_list(struct(col("gpos0"), col("sl"))))
          .as("ord"),
        sort_array(collect_list(when(col("has_start"),
          pmod(col("gpos0"), lit(blockTokens.toLong))))).as("bnd"))
      .select(col("shard"), col("block_id"), col("n_ids"), col("n_docs"),
        col("first_doc"),
        TextFunctions.portableHash(
          array_join(transform(flatten(col("ord.sl")),
            i => i.cast("string")), ","),
          47).as("block_hash"),
        array_join(transform(col("bnd"), b => b.cast("string")), ",")
          .as("boundaries"))
  }

  /** The per-shard cumulative start offset, with a LOUD duplicate-id
    * guard: the cumsum runs under the window's default RANGE frame, so
    * two rows with the SAME doc_id in a shard would get identical
    * offsets and silently interleave their ids inside blocks
    * (corrupting contents, hashes, and boundary maps). Duplicates are
    * adjacent under the window's doc_id sort, so a `lag` over the SAME
    * window spec detects them inside the one Window exec — no extra
    * exchange, no extra pass — and raises instead of corrupting.
    */
  private def dupGuardedOffset(
      w: org.apache.spark.sql.expressions.WindowSpec)
      : org.apache.spark.sql.Column =
    when(lag(col("doc_id"), 1).over(w) === col("doc_id"),
      raise_error(concat(lit("duplicate doc_id in packing input: "),
        col("doc_id").cast("string"))).cast("long"))
      .otherwise(sum(col("ns")).over(w) - col("ns"))

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
