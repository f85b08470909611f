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

  /** Returns the curated corpus: documents above `minQuality` that are not
    * the higher-id side of any confirmed near-duplicate pair.
    */
  def curate(docs: DataFrame, stopwords: Seq[String],
             minQuality: Double = 0.4,
             jaccardThreshold: Double = 0.5): DataFrame = {
    val quality = docs.withColumn("quality",
      TextFunctions.qualityScore(col("text"), stopwords))
    // kept feeds both the near-dup pipeline and the final anti-join: one
    // materialized quality pass instead of two token-level rescans
    val kept = quality.where(col("quality") >= minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupDrop = Dedup.nearDuplicatePairs(kept, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    kept.join(dupDrop, Seq("doc_id"), "left_anti")
  }
}
