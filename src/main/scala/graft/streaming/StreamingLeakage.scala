package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import graft.llm.ChunkDedup

/** Streaming face of the q268 split-leakage audit (the 23rd twin):
  * a continuously maintained chunk-level contamination report over an
  * unbounded document stream — after any prefix of batches, the audit
  * equals batch q268 over the same prefix.
  *
  * Same decomposition as [[StreamingLm]]: the STATEFUL half is
  * trivially mergeable per-chunk-hash counters — has a TRAIN
  * occurrence of this chunk been seen, and how many val/test
  * occurrences (with token mass) — and the audit assembly
  * ([[assembleAudit]]) is a PURE function of the counter table. This
  * sidesteps the arrival-order problem an emit-at-eval-arrival design
  * would have (an eval chunk arriving before its train twin is not
  * leaked *yet*, and becomes leaked when the twin lands — a
  * per-arrival verdict could never match the batch audit at every
  * prefix, but the counter snapshot does, exactly).
  *
  * State is bounded by the DISTINCT chunk domain (5 longs per hash),
  * the same honest cost as [[StreamingChunkDedup]]; the split label
  * is q85's pure hash function of doc_id, so membership is identical
  * on both faces by construction.
  */
object StreamingLeakage {

  /** Chunk events for the counter processor: (chash, split_code,
    * ctoks) with split_code 0=train, 1=val, 2=test. Chunking/hashing
    * is the batch column expression — narrow, no pre-shuffle.
    */
  def chunkEvents(docs: DataFrame, idCol: String, textCol: String,
                  c: Int = 20, seed: Int = 7): DataFrame = {
    val sp = graft.llm.TextFunctions.splitAssign(col("doc_id"))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.llm.TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"),
        posexplode(ChunkDedup.chunkStructs(col("t"), c, seed)))
      .select(col("col.chash").as("chash"),
        when(sp === "train", 0L).when(sp === "val", 1L).otherwise(2L)
          .as("split_code"),
        col("col.ctoks").as("ctoks"))
  }

  /** Keyed counter processor: per chunk hash, five monotone longs —
    * train-seen flag, val occurrences/tokens, test occurrences/tokens.
    * Emits the key's updated snapshot whenever a batch touches it
    * (append mode — [[assembleAudit]] dedupes to the latest).
    */
  def counters(grouped: KeyValueGroupedDataset[Long, (Long, Long, Long)])(
      implicit mkEnc: Encoder[Int], mvEnc: Encoder[Long],
      outEnc: Encoder[(Long, Boolean, Long, Long, Long, Long)])
      : Dataset[(Long, Boolean, Long, Long, Long, Long)] =
    KeyedStateOps.processWithMapState[Long, (Long, Long, Long), Int, Long,
        (Long, Boolean, Long, Long, Long, Long)](grouped) { (chash, rows, ms) =>
      def g(k: Int) = ms.get(k).getOrElse(0L)
      var ts = g(0); var vn = g(1); var vt = g(2); var tn = g(3); var tt = g(4)
      rows.foreach { case (_, splitCode, toks) =>
        splitCode match {
          case 0L => ts = 1L
          case 1L => vn += 1L; vt += toks
          case _  => tn += 1L; tt += toks
        }
      }
      ms.put(0, ts); ms.put(1, vn); ms.put(2, vt)
      ms.put(3, tn); ms.put(4, tt)
      Iterator.single((chash, ts == 1L, vn, vt, tn, tt))
    }

  /** q268's audit over any counter table — the consumer-side half:
    * (split, n_chunks, n_leaked, leaked_tokens, leak_rate) for the
    * val/test splits with at least one chunk. Counters are monotone,
    * so the latest snapshot per chash is the field-wise max — deduped
    * internally, making the function total over both a
    * latest-row-per-key map AND the raw appended table (same contract
    * as [[StreamingLm.assembleWeights]]).
    */
  def assembleAudit(counts: DataFrame): DataFrame = {
    val latest = counts.groupBy(col("chash"))
      .agg(max(col("train_seen")).as("hit"),
        max(col("val_n")).as("val_n"), max(col("val_toks")).as("val_toks"),
        max(col("test_n")).as("test_n"),
        max(col("test_toks")).as("test_toks"))
    latest.select(explode(array(
        struct(lit("val").as("split"), col("val_n").as("n"),
          col("val_toks").as("tk"), col("hit")),
        struct(lit("test").as("split"), col("test_n").as("n"),
          col("test_toks").as("tk"), col("hit")))).as("r"))
      .select(col("r.split").as("split"), col("r.n").as("n"),
        col("r.tk").as("tk"), col("r.hit").as("hit"))
      .where(col("n") > 0L)
      .groupBy(col("split"))
      .agg(sum(col("n")).cast("long").as("n_chunks"),
        sum(when(col("hit"), col("n")).otherwise(0L)).cast("long")
          .as("n_leaked"),
        sum(when(col("hit"), col("tk")).otherwise(0L)).cast("long")
          .as("leaked_tokens"))
      .select(col("split"), col("n_chunks"), col("n_leaked"),
        col("leaked_tokens"),
        (col("n_leaked").cast("double") / col("n_chunks").cast("double"))
          .as("leak_rate"))
  }
}
