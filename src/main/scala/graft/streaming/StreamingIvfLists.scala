package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Incremental IVF list maintenance — the 31st streaming twin, and the
  * persisted index's ([[graft.llm.Similarity.ivfBuild]]/q305) natural
  * ingestion face: an ANN index is built ONCE, then vectors keep
  * arriving; each arrival assigns to its inverted list against the
  * FIXED coarse quantizer, and per-list membership counters keep the
  * q300 `ivfListProfile` health readout continuously true without ever
  * rescanning the corpus.
  *
  * Shape: assignment is a STATELESS narrow map — the bounded quantizer
  * (√n centroids) folds into the row expression as literals (the
  * batch build's `broadcast(cents)` in task-binary form, the
  * [[graft.operators.KMeans]] assignment pattern), so arriving vectors
  * never shuffle for it; the only stateful piece is ONE monotone long
  * counter per list ([[StreamingLm.counters]], state bounded by the
  * list count, never by stream length), RocksDB-backed at scale.
  * Counters are monotone, so an at-least-once sink re-delivering
  * snapshot rows cannot inflate the profile (latest = max).
  *
  * Exactness contract (spec-verified on RocksDB): after any stream
  * prefix, [[assembleProfile]] equals the per-list membership of the
  * batch [[graft.llm.Similarity.ivfBuildWith]] over the same prefix
  * under the same quantizer — same deterministic tie rule (6-decimal
  * rounded cosine, ties to the smallest cid, zero-norm sentinel), and
  * zero-member lists stay visible exactly like `ivfListProfile`.
  */
object StreamingIvfLists {

  /** The batch build's assignment rule over literal centroids: best
    * cid by (rounded cosine desc, cid asc), zero-norm vectors pinned
    * to the −2.0 sentinel — the SAME (negated-score, cid) min-struct
    * `ivfBuildWith` aggregates, here as `array_min` over a per-row
    * score array so the expression stays LINEAR in the centroid count
    * (a when/otherwise fold would duplicate its accumulator per level
    * — the ~4^k tree the BPE family already banned).
    */
  def assignExpr(v: Column, quantizer: Seq[(Long, Seq[Double])]): Column = {
    require(quantizer.nonEmpty, "empty quantizer")
    val scored = quantizer.sortBy(_._1).map { case (cid, cv) =>
      struct(
        negate(coalesce(round(Similarity.cosine(v, typedlit(cv)), 6),
          lit(-2.0))).as("ns"),
        lit(cid).as("cid"))
    }
    array_min(array(scored: _*)).getField("cid")
  }

  /** One `cid` count event per arriving vector (string-keyed for the
    * shared counter processor) — a stateless, shuffle-free projection.
    */
  def assignEvents(vecs: DataFrame, vecCol: String,
                   quantizer: Seq[(Long, Seq[Double])]): DataFrame =
    vecs.select(assignExpr(col(vecCol).cast("array<double>"), quantizer)
      .cast("string").as("k"))

  /** Rebuild the q300-style list profile from any (k, n) counter table
    * emitted by [[StreamingLm.counters]] over [[assignEvents]]:
    * (cid, n_members, share), EVERY quantizer list visible (zero
    * members included — the left join from the centroid set, exactly
    * like `ivfListProfile`). Dedupes cumulative re-emissions via max;
    * the total is the counter sum (every arrival lands in exactly one
    * list) — a bounded driver-side aggregate over ≤ |lists| rows.
    */
  def assembleProfile(counts: DataFrame,
                      quantizer: Seq[(Long, Seq[Double])]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val latest = counts.groupBy(col("k"))
      .agg(max(col("n")).as("n_members"))
      .select(col("k").cast("long").as("cid"), col("n_members"))
      .transform(graft.core.Caching.persist)
    val total = latest.agg(coalesce(sum(col("n_members")), lit(0L)))
      .as[Long].head()
    val cents = quantizer.map(_._1).toDF("cid")
    cents.join(latest, Seq("cid"), "left_outer")
      .select(col("cid"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        (coalesce(col("n_members"), lit(0L)).cast("double")
          / lit(math.max(total, 1L).toDouble)).as("share"))
  }
}
