package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.llm.ChunkDedup

/** Streaming sub-document dedup — the streaming face of the q232
  * chunk-dedup pass: as documents arrive, each 20-token chunk is kept
  * iff its hash has never been seen before, so an incremental corpus
  * build strips repeated spans (near-dup bodies, boilerplate runs)
  * without re-scanning everything already ingested.
  *
  * Chunking/hashing is the SAME column expression as the batch path
  * ([[graft.llm.ChunkDedup.chunkStructs]] — narrow, no pre-shuffle);
  * the only shuffle is the keyBy routing chunk hashes to their state
  * partition. Per-key state is ONE long (the keeper's encoded
  * (doc_id, chunk_idx)), so total state is one entry per DISTINCT chunk
  * — the honest cost of global first-occurrence semantics (a production
  * run backs this with RocksDB exactly like a persistent dedup KV;
  * q240's duplicate-gap profile is the sizing diagnostic for a
  * bounded-horizon variant, where state beyond the observed gap mass
  * evicts under TTL).
  *
  * Replay-stable: the keeper is pinned in state, so a re-delivered
  * micro-batch re-emits the SAME kept flags (the keeper row stays kept,
  * duplicates stay dropped) — agreement with the batch marking holds at
  * every prefix when ingestion follows doc_id order, and is asserted by
  * the StreamingSpec twin test.
  */
object StreamingChunkDedup {

  /** (doc_id, chunk_idx, ctoks, chash, source) membership events for
    * the COMPOSED boilerplate→chunk-dedup face. Same chunking
    * constants as [[StreamingBoilerplate.lineEvents]] so line hashes
    * and chunk hashes coincide: with c_line == c_chunk, stripping
    * whole lines keeps every remaining chunk boundary on a c-token
    * multiple, which is exactly what makes batch strip-then-re-chunk
    * reproducible from the ORIGINAL chunking (indices shift, spans
    * don't).
    */
  def membershipEvents(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, c: Int = 10, seed: Int = 11)
      : DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        graft.llm.TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), col("source"),
        posexplode(ChunkDedup.chunkStructs(col("t"), c, seed)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.ctoks").as("ctoks"), col("col.chash").as("chash"),
        col("source"))

  /** Pure assembly of the composed pipeline stages 0b→2b from streamed
    * state: the boilerplate counter table
    * ([[StreamingBoilerplate.counters]] output — monotone, so verdicts
    * apply RETROACTIVELY, exactly like the batch screen re-run on the
    * prefix) decides which line hashes are boilerplate per source;
    * those lines are stripped from the accumulated membership; then
    * first-occurrence marking runs over the SURVIVORS. Equals batch
    * `Boilerplate.strip` → re-chunk → `ChunkDedup.firstOccurrence`
    * over the same prefix at EVERY prefix — including chunks whose
    * keeper changes because an earlier occurrence's line became
    * boilerplate (an arrival-time keeper could never repair that; the
    * counter-plus-assembly split can, the [[StreamingLm]] pattern).
    */
  def assembleStripped(counts: DataFrame, membership: DataFrame,
                       minDf: Int = 2, pct: Int = 5): DataFrame = {
    val latest = counts.groupBy(col("k")).agg(max(col("df")).as("df"))
    val nd = latest.where(col("k").startsWith("d|"))
      .select(substring(col("k"), 3, Int.MaxValue).as("source"),
        col("df").as("nd"))
    val boiler = latest.where(col("k").startsWith("l|"))
      .select(split(col("k"), "\\|", 3).getItem(1).as("source"),
        split(col("k"), "\\|", 3).getItem(2).cast("long").as("chash"),
        col("df"))
      .join(nd, "source")
      .where(col("df") >= lit(minDf.toLong)
        && col("df") * lit(100L) >= col("nd") * lit(pct.toLong))
      .select(col("source"), col("chash"))
    val surv = membership.join(boiler, Seq("source", "chash"),
      "left_anti")
    ChunkDedup.firstOccurrence(surv)
  }

  /** (doc_id, chunk_idx, ctoks, kept) for every arriving chunk. */
  def markChunks(docs: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int = 20, seed: Int = 7)
      : Dataset[(Long, Long, Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ch = docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.llm.TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"),
        posexplode(ChunkDedup.chunkStructs(col("t"), chunkTokens, seed)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.ctoks").as("ctoks"), col("col.chash").as("chash"))
      .as[(Long, Long, Long, Long)]
    val grouped = ch.groupByKey(_._4)
    KeyedStateOps.processWithMapState[Long, (Long, Long, Long, Long),
        Int, Long, (Long, Long, Long, Boolean)](grouped) { (_, rows, ms) =>
      // single-entry map: key 0 → the keeper's encoded (doc_id, idx).
      var keeper = ms.get(0)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Boolean)]
      // min-encoded-first within the slice: which row becomes keeper in
      // a multi-arrival batch is a pure function of the data, matching
      // the batch marking's min() when the batch IS the corpus
      rows.toArray.sortBy(r => r._1 * ChunkDedup.IdxEncode + r._2)
        .foreach { r =>
          val enc = r._1 * ChunkDedup.IdxEncode + r._2
          val kept = keeper match {
            case None => ms.put(0, enc); keeper = Some(enc); true
            case Some(k) => k == enc // replayed keeper row stays kept
          }
          out += ((r._1, r._2, r._3, kept))
        }
      out.iterator
    }
  }
}
