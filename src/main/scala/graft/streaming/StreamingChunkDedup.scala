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
