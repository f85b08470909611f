package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import graft.llm.ChunkDedup

/** Streaming face of the q271/q273 boilerplate screen (the 24th
  * twin): a continuously maintained per-source boilerplate-mass report
  * over an unbounded document stream — after any prefix of batches the
  * report equals batch `Boilerplate.sourceMass` over the same prefix.
  *
  * Boilerplate verdicts are RATIOS of growing counts (a line's
  * document frequency vs its source's doc count), so — like
  * [[StreamingLeakage]] — a per-arrival verdict could never match the
  * batch screen at every prefix (a line becomes boilerplate only once
  * enough repeats land). The stateful half is therefore just monotone
  * counters, and the verdicts live entirely in the pure assembly:
  *  - per `d|source` key: docs seen (the denominator);
  *  - per `l|source|chash` key: distinct docs containing the line,
  *    line instances, token mass.
  *
  * Contract: each document arrives EXACTLY ONCE (an ingest stream),
  * so all instances of a (doc, line) pair land in one batch and the
  * processor can count distinct docs from the batch slice alone —
  * per-key state stays 3 longs, never a doc set. Source names must
  * not contain '|' (the key separator).
  */
object StreamingBoilerplate {

  /** Count events: one `d|source` row per non-empty doc and one
    * `l|source|chash` row per LINE INSTANCE (ctoks carried). Same
    * chunking/normalization as the batch strip.
    */
  def lineEvents(docs: DataFrame, idCol: String, textCol: String,
                 sourceCol: String, c: Int = 10, seed: Int = 11)
      : DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        graft.llm.TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
    val d = base.select(concat(lit("d|"), col("source")).as("k"),
      col("doc_id"), lit(0L).as("ctoks"))
    val l = base.select(col("doc_id"), col("source"),
        posexplode(ChunkDedup.chunkStructs(col("t"), c, seed)))
      .select(concat(lit("l|"), col("source"), lit("|"),
          col("col.chash")).as("k"),
        col("doc_id"), col("col.ctoks").as("ctoks"))
    d.unionAll(l)
  }

  /** Keyed counter processor: 3 monotone longs per key — distinct
    * docs, instances, token mass (the d| keys use only the first).
    * Emits the key's updated snapshot whenever a batch touches it.
    */
  def counters(grouped: KeyValueGroupedDataset[String, (String, Long, Long)])(
      implicit mkEnc: Encoder[Int], mvEnc: Encoder[Long],
      outEnc: Encoder[(String, Long, Long, Long)])
      : Dataset[(String, Long, Long, Long)] =
    KeyedStateOps.processWithMapState[String, (String, Long, Long),
        Int, Long, (String, Long, Long, Long)](grouped) { (k, rows, ms) =>
      def g(i: Int) = ms.get(i).getOrElse(0L)
      var df = g(0); var occ = g(1); var toks = g(2)
      val arr = rows.toArray
      // each doc arrives once, so its instances are all in this slice
      df += arr.iterator.map(_._2).toSet.size.toLong
      occ += arr.length.toLong
      toks += arr.iterator.map(_._3).sum
      ms.put(0, df); ms.put(1, occ); ms.put(2, toks)
      Iterator.single((k, df, occ, toks))
    }

  /** q273's per-source mass report over any counter table — the
    * consumer-side half, with the SAME thresholds as the batch screen
    * (boiler iff df ≥ minDf AND df·100 ≥ n_docs·pct, integer
    * compare). Dedupes the raw appended table internally (max of
    * monotone counters per key).
    */
  def assembleMass(counts: DataFrame, minDf: Int = 2, pct: Int = 5)
      : DataFrame = {
    val latest = counts.groupBy(col("k"))
      .agg(max(col("df")).as("df"), max(col("occ")).as("occ"),
        max(col("toks")).as("toks"))
    val nd = latest.where(col("k").startsWith("d|"))
      .select(substring(col("k"), 3, Int.MaxValue).as("source"),
        col("df").as("nd"))
    val lines = latest.where(col("k").startsWith("l|"))
      .select(split(col("k"), "\\|", 3).getItem(1).as("source"),
        col("df"), col("occ"), col("toks"))
    lines.join(nd, "source")
      .withColumn("boiler", col("df") >= lit(minDf.toLong)
        && col("df") * lit(100L) >= col("nd") * lit(pct.toLong))
      .groupBy(col("source"), col("nd"))
      .agg(sum(col("occ")).cast("long").as("n_lines"),
        sum(when(col("boiler"), col("occ")).otherwise(0L)).cast("long")
          .as("boiler_lines"),
        sum(col("toks")).cast("long").as("n_tokens"),
        sum(when(col("boiler"), col("toks")).otherwise(0L)).cast("long")
          .as("removed_tokens"))
      .select(col("source"), col("nd").as("n_docs"), col("n_lines"),
        col("boiler_lines"), col("n_tokens"), col("removed_tokens"),
        (col("removed_tokens").cast("double")
          / col("n_tokens").cast("double")).as("boiler_share"))
  }
}
