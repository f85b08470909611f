package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-document (chunk-level) dedup building blocks — the
  * RefinedWeb/CCNet paragraph-dedup analog over fixed token windows
  * (the corpus has no newline structure; a newline-aware splitter would
  * slot into `chunkStructs` without touching anything downstream).
  *
  * Shared by the batch query (q232) and [[graft.streaming.StreamingChunkDedup]]
  * so both faces band, hash, and encode identically — the agreement
  * contract between them is structural, not coincidental.
  *
  * 100 TB posture: the chunk STRING never leaves the projection that
  * builds it — downstream shuffles see only the 64-bit `portableHash`
  * and two small longs, so the dedup groupBy and the join back are
  * keyed on fixed-width values.
  */
object ChunkDedup {

  /** Non-overlapping `c`-token windows of the token array `t`, as an
    * array of (ctoks, chash) structs (chunk token count + 64-bit chunk
    * hash). Pure column expression — narrow, streaming-safe. An empty
    * token array yields an empty chunk array (guarded: `sequence(0,
    * -1)` would otherwise default its step to -1 and fabricate two
    * chunks of the empty slice).
    */
  def chunkStructs(t: Column, c: Int, seed: Int): Column =
    ChunkStructsExpr(t, c, stride = c, seed)

  /** Column-composed reference form of [[chunkStructs]] — kept as the
    * spec cross-check for the native expression (identical output;
    * per-chunk slice+concat_ws allocations make it the slower path).
    */
  def chunkStructsHof(t: Column, c: Int, seed: Int): Column = {
    require(c >= 1, s"chunk size must be >= 1, got $c")
    val nChunks = ((size(t) + lit(c - 1)) / lit(c)).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1), i =>
      struct(
        size(slice(t, i * lit(c) + lit(1), lit(c))).cast("long").as("ctoks"),
        TextFunctions.portableHash(
          concat_ws(" ", slice(t, i * lit(c) + lit(1), lit(c))), seed)
          .as("chash")))
    when(size(t) > 0, chunks)
      .otherwise(array().cast("array<struct<ctoks:bigint,chash:bigint>>"))
  }

  /** OVERLAPPING `c`-token windows with `stride` step — the RAG-index
    * layout (each passage window overlaps its neighbor by c − stride
    * tokens so no answer span straddles a boundary unseen). Window
    * count is the standard max(1, ceil((n − c)/stride) + 1), computed
    * in integers; the tail window truncates. Same (ctoks, chash)
    * struct contract as [[chunkStructs]], so [[firstOccurrence]] and
    * both dedup faces consume it unchanged.
    */
  def slidingChunkStructs(t: Column, c: Int, stride: Int,
                          seed: Int): Column =
    ChunkStructsExpr(t, c, stride, seed)

  /** Column-composed reference form of [[slidingChunkStructs]] (spec
    * cross-check for the native expression).
    */
  def slidingChunkStructsHof(t: Column, c: Int, stride: Int,
                             seed: Int): Column = {
    require(c >= 1, s"window size must be >= 1, got $c")
    require(stride >= 1 && stride <= c,
      s"stride must be in [1, $c], got $stride")
    val n = size(t)
    val nw = when(n <= lit(c), lit(1))
      .otherwise(floor((n - lit(c) + lit(stride - 1)).cast("double")
        / lit(stride.toDouble)).cast("int") + lit(1))
    val chunks = transform(sequence(lit(0), nw - 1), i =>
      struct(
        size(slice(t, i * lit(stride) + lit(1), lit(c))).cast("long")
          .as("ctoks"),
        TextFunctions.portableHash(
          concat_ws(" ", slice(t, i * lit(stride) + lit(1), lit(c))), seed)
          .as("chash")))
    when(size(t) > 0, chunks)
      .otherwise(array().cast("array<struct<ctoks:bigint,chash:bigint>>"))
  }

  /** (doc_id, chunk_idx, ctoks, chash) membership rows for every
    * non-empty document — one narrow pass; empty token arrays drop out
    * (they have no chunks).
    */
  def chunkMembership(docs: DataFrame, idCol: String, textCol: String,
                      c: Int, seed: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), posexplode(chunkStructs(col("t"), c, seed)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.ctoks").as("ctoks"), col("col.chash").as("chash"))

  /** The (doc_id, chunk_idx) → single-long encoding both dedup faces
    * key first-occurrence on. Collision-free while chunk_idx < 1e6 —
    * note the margin is STRIDE-dependent: non-overlapping 20-token
    * chunks need a 20M-token doc to break it, but stride-10 sliding
    * windows ([[slidingChunkStructs]]) halve that to 10M tokens.
    * [[firstOccurrence]] enforces the bound per row (raise, not
    * silent wrong keeper selection).
    */
  val IdxEncode = 1000000L

  /** Batch first-occurrence marking: membership rows plus a `kept`
    * flag — true iff this (doc_id, chunk_idx) is the corpus-wide
    * minimum for its chunk hash. One hash aggregate + one hash-keyed
    * join; no windows. Rows with chunk_idx ≥ [[IdxEncode]] raise at
    * execution (the encoding would collide across documents).
    */
  /** Guarded (doc_id, chunk_idx) → long encoding: raises at execution
    * past the [[IdxEncode]] margin instead of silently colliding
    * keeper keys across documents. Use this everywhere the encoding
    * appears (firstOccurrence, the incremental-ingest audit, manual
    * keeper math) — an unguarded re-derivation is exactly the latent
    * hole the margin doc warns about.
    */
  def encodeIdx(docId: Column, chunkIdx: Column): Column =
    docId * lit(IdxEncode) +
      when(chunkIdx < lit(IdxEncode), chunkIdx)
        .otherwise(raise_error(format_string(
          "chunk_idx %s >= IdxEncode 1e6: first-occurrence keys would " +
            "collide across documents (doc longer than the encoding margin)",
          chunkIdx)).cast("long"))

  def firstOccurrence(membership: DataFrame): DataFrame = {
    val k = encodeIdx(col("doc_id"), col("chunk_idx"))
    val keep = membership.groupBy(col("chash")).agg(min(k).as("keeper"))
    membership.join(keep, "chash")
      .withColumn("kept", k === col("keeper"))
      .drop("keeper")
  }
}
