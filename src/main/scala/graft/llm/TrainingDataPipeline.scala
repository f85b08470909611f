package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-corpus build as ONE composable call — the workload
  * every individual operator in this package exists to serve:
  *
  *   quality gate → near-dup removal (keep the BEST-quality member of
  *   each cluster) → benchmark decontamination → mixture balancing →
  *   deterministic train/val/test split → sequence packing of the train
  *   split — plus a per-stage manifest for the survivorship report.
  *
  * Every stage is an already-oracle-verified operator (q38/q58/q130
  * quality+dedup, q73 contamination, q79 mixture, q85 split, q69
  * packing); this object contributes the composition, which stays fully
  * declarative end to end — Catalyst fuses the quality filter into the
  * scan, AQE decides the anti-join build sides, and nothing collects to
  * the driver.
  *
  * Scale posture: the corpus shuffles once for the LSH signature pass
  * and once per keyed aggregation; the eval-set n-grams and the mixture
  * rate table broadcast; every sampling decision is a deterministic pure
  * function of ids (reruns and stragglers cannot change membership).
  */
object TrainingDataPipeline {

  /** @param mixtureTargets per-source target proportions (empty = skip
    *                       the balancing stage)
    * @param contaminationMax drop docs whose eval-shingle overlap share
    *                         exceeds this (docs too short to shingle
    *                         cannot match and are kept)
    */
  final case class Config(
      minQuality: Double = 0.4,
      jaccardThreshold: Double = 0.5,
      contamN: Int = 3,
      contaminationMax: Double = 0.2,
      mixtureTargets: Map[String, Double] = Map.empty,
      tokenBudget: Int = 512,
      shards: Int = 4)

  /** @param corpus  surviving docs with `quality` and `split` columns
    * @param packed  (doc_id, lang, shard, tok_count, chunk_id) of the
    *                train split
    * @param manifest (stage, n_docs) survivorship ledger, stage-ordered
    */
  final case class Result(corpus: DataFrame, packed: DataFrame, manifest: DataFrame)

  def run(docs: DataFrame, evalNgrams: DataFrame, stopwords: Seq[String],
          cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. quality gate — one token pass, fused into the scan
    val scored = docs.withColumn("quality",
      TextFunctions.qualityScore(col("text"), stopwords))
    val kept = scored.where(col("quality") >= cfg.minQuality)
      .transform(graft.core.Caching.persist)

    // 2. near-dup clusters over the kept set; keep the best-quality
    // member per cluster (q130 policy: exact 1e-9 quality grid,
    // min(struct(-grid, id)) — deterministic under ties, no window)
    val clusters = Dedup.nearDuplicateClusters(kept, "doc_id", "text",
      shingleN = 3, k = 8, bands = 4, threshold = cfg.jaccardThreshold)
    val winners = clusters
      .join(kept.select(col("doc_id"),
        floor(col("quality") * lit(1e9)).cast("long").as("qg")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(min(struct(negate(col("qg")).as("nq"), col("doc_id").as("d"))).as("best"))
      .select(col("best.d").as("doc_id"))
    val dupDrop = clusters.select(col("doc_id"))
      .exceptAll(winners.select(col("doc_id")))
    // unhinted anti-join: the drop set is O(dup-fraction x corpus) — AQE
    // may broadcast it when small, a forced hint would OOM at 100 TB
    val deduped = kept.join(dupDrop, Seq("doc_id"), "left_anti")

    // 3. decontamination: drop docs overlapping the benchmark above the
    // threshold; shingle-less (short) docs cannot match and stay
    val contaminated = Contamination
      .contaminationScore(deduped, evalNgrams, "doc_id", "text", cfg.contamN)
      .where(col("contamination") > cfg.contaminationMax)
      .select(col("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 4. mixture balancing by source (deterministic hash membership)
    val balanced =
      if (cfg.mixtureTargets.isEmpty) clean
      else Mixture.balanceToTargets(clean, "doc_id", "source", cfg.mixtureTargets)

    // 5. deterministic split — a pure function of the id
    val corpus = balanced.withColumn("split",
      TextFunctions.splitAssign(col("doc_id")))

    // 6. pack the train split into token-budget chunks
    val packed = Packing.packChunks(
      corpus.where(col("split") === "train"), "doc_id", "text", "lang",
      cfg.tokenBudget, cfg.shards)

    val manifest = Seq(
      ("0_input", docs.count()),
      ("1_quality_gate", kept.count()),
      ("2_near_dup", deduped.count()),
      ("3_decontaminated", clean.count()),
      ("4_mixture", balanced.count()),
      ("5_train_packed", packed.count())
    ).toDF("stage", "n_docs")

    Result(corpus, packed, manifest)
  }
}
