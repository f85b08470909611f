package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition the individual
  * operators exist for. quality-gate → near-dup removal (MinHash-LSH
  * candidates, exact-Jaccard confirm, keep the lowest doc_id of each
  * duplicate cluster edge) → corpus stats.
  *
  * Each stage is one of the already-verified operators; the composition
  * stays fully declarative, so Catalyst fuses the quality filter into the
  * scan. The drop-set anti-join is deliberately NOT hinted: the set is
  * O(duplicate-fraction × corpus) — unbounded at 100 TB — so a forced
  * broadcast would OOM the driver. AQE still picks a broadcast join at
  * runtime whenever the set turns out small.
  */
object Curation {

  /** Returns the curated corpus: documents above `minQuality`, keeping
    * exactly ONE document (the cluster-minimum id) per transitive
    * near-duplicate cluster. Cluster resolution matters: dropping the
    * higher id of each PAIR keeps two survivors from {1↔9, 5↔9} even
    * though 1 and 5 are transitive duplicates; connected components keep
    * only 1.
    */
  def curate(docs: DataFrame, stopwords: Seq[String],
             minQuality: Double = 0.4,
             jaccardThreshold: Double = 0.5): DataFrame = {
    val quality = docs.withColumn("quality",
      TextFunctions.qualityScore(col("text"), stopwords))
    // kept feeds both the near-dup pipeline and the final anti-join: one
    // materialized quality pass instead of two token-level rescans
    val kept = quality.where(col("quality") >= minQuality)
      .transform(graft.core.Caching.persist)
    val clusters = Dedup.connectedComponents(
      Dedup.nearDuplicatePairs(kept, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = jaccardThreshold))
    val dupDrop = clusters.where(col("cluster_id") =!= col("node"))
      .select(col("node").as("doc_id"))
    kept.join(dupDrop, Seq("doc_id"), "left_anti")
  }
}
