package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-based boilerplate line removal — the CCNet/RefinedWeb
  * pre-dedup pass that strips repeated headers/footers/nav junk before
  * any dedup or LM statistic sees the corpus (leaving it in silently
  * inflates every downstream dup-rate and deflates every perplexity).
  *
  * "Line" here is the repo's paragraph analog over the newline-free
  * fixture: a fixed `c`-token window of the normalized token stream
  * ([[TextFunctions.tokens]] = lower/trim/whitespace-split — the
  * normalization IS the line normalization). A real newline corpus
  * swaps the splitter inside [[ChunkDedup.chunkStructs]]; everything
  * downstream is splitter-agnostic.
  *
  * A line is boilerplate WITHIN ITS SOURCE when its document frequency
  * clears both an absolute floor (`minDf` docs) and a share of the
  * source (`df·100 ≥ n_docs·pct` — integer comparison, no float
  * boundary). Per-source, not global: a license header ubiquitous in
  * one crawl is ordinary prose in another.
  *
  * 100 TB posture: line text collapses to the 64-bit portable hash
  * before anything shuffles — the DF aggregate, the boiler set, and
  * the flag join are all keyed (source, chash). The boiler SET (lines
  * past the threshold) is the only broadcast-shaped intermediate, and
  * retained text is rebuilt per-row from each doc's own token array
  * (an index-filter lambda), so document strings never leave their
  * row. Output is one row per non-empty document.
  */
object Boilerplate {

  /** Per-document strip report: (doc_id, source, n_lines, boiler_lines,
    * kept_tokens, removed_tokens, retained_text). `retained_text` is
    * the space-joined surviving tokens — identical to joining the
    * surviving lines with single spaces, since lines partition the
    * normalized token stream.
    */
  def strip(docs: DataFrame, idCol: String, textCol: String,
            sourceCol: String, c: Int, seed: Int,
            minDf: Int = 2, pct: Int = 5): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would mark every line boilerplate: $minDf")
    require(pct >= 0 && pct <= 100, s"pct must be a percentage: $pct")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .transform(graft.core.Caching.persist)
    val mem = base.select(col("doc_id"), col("source"),
        posexplode(ChunkDedup.chunkStructs(col("t"), c, seed)))
      .select(col("doc_id"), col("source"),
        col("pos").cast("long").as("idx"),
        col("col.ctoks").as("ctoks"), col("col.chash").as("chash"))
    val nd = base.groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val boiler = mem.groupBy(col("source"), col("chash"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .join(nd, "source")
      .where(col("df") >= lit(minDf.toLong)
        && col("df") * lit(100L) >= col("nd") * lit(pct.toLong))
      .select(col("source"), col("chash"), lit(true).as("boiler"))
    val perDoc = mem.join(boiler, Seq("source", "chash"), "left")
      .withColumn("boiler", coalesce(col("boiler"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("boiler_lines"),
        sum(when(!col("boiler"), col("ctoks")).otherwise(0L))
          .cast("long").as("kept_tokens"),
        sum(when(col("boiler"), col("ctoks")).otherwise(0L))
          .cast("long").as("removed_tokens"),
        // nulls (non-boiler) drop out of collect_list; sort_array makes
        // the per-doc index set deterministic
        sort_array(collect_list(when(col("boiler"), col("idx"))))
          .as("bidx"))
    base.join(perDoc, "doc_id")
      .select(col("doc_id"), col("source"), col("n_lines"),
        col("boiler_lines"), col("kept_tokens"), col("removed_tokens"),
        concat_ws(" ", filter(col("t"), (_, i) =>
          !array_contains(col("bidx"), (i / lit(c)).cast("long"))))
          .as("retained_text"))
  }

  /** Per-source boilerplate mass: how much of each source's token
    * stream the strip removes — the one-row-per-source planning number
    * (a source past ~30% repeated mass is a scrape problem, not a
    * corpus). Pure aggregate of [[strip]]; output is O(sources) rows
    * at any corpus size.
    */
  def sourceMass(docs: DataFrame, idCol: String, textCol: String,
                 sourceCol: String, c: Int, seed: Int,
                 minDf: Int = 2, pct: Int = 5): DataFrame =
    strip(docs, idCol, textCol, sourceCol, c, seed, minDf, pct)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_lines")).cast("long").as("n_lines"),
        sum(col("boiler_lines")).cast("long").as("boiler_lines"),
        sum(col("kept_tokens") + col("removed_tokens")).cast("long")
          .as("n_tokens"),
        sum(col("removed_tokens")).cast("long").as("removed_tokens"))
      .select(col("source"), col("n_docs"), col("n_lines"),
        col("boiler_lines"), col("n_tokens"), col("removed_tokens"),
        (col("removed_tokens").cast("double")
          / col("n_tokens").cast("double")).as("boiler_share"))
}
