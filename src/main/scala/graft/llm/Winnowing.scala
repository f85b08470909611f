package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm): hash every positional k-gram, slide a window of `w`
  * consecutive hashes, and select the minimum of each window (rightmost
  * position on ties). The selected (position, hash) set is the document's
  * fingerprint sketch, with the classic guarantee: any substring match of
  * at least w + k − 1 tokens between two documents shares at least one
  * selected fingerprint VALUE — so partial-copy detection joins sketches
  * (density ~2/(w+1) of all grams) instead of full gram sets.
  *
  * Docs with fewer than `w` grams winnow as a single whole-doc window
  * (one fingerprint); docs shorter than k tokens emit nothing.
  *
  * Shape: positional hashes explode once; each position fans out to the
  * ≤ w windows it participates in (O(L·w) narrow rows of ids + two
  * longs); per-window selection is ONE hash aggregate —
  * min(struct(h, −pos)) — no ranking window, map-side combinable. Text
  * never shuffles. [[SubstringDedup]] finds exact spans by keeping every
  * duplicated gram; winnowing is the sub-linear sketch for the same
  * detection problem when the full gram join is too big.
  */
object Winnowing {

  private val Seed = 17

  /** (doc_id, pos, fp): the winnowed fingerprint set per document. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1)
    val base = docs
      .select(col(idCol).as("doc_id"),
        ShinglesExpr.occurrences(col(textCol), k).as("g"))
      .where(size(col("g")) > 0)
      .select(col("doc_id"), size(col("g")).as("len"),
        posexplode(transform(col("g"),
          gr => TextFunctions.portableHash(gr, Seed))))
      .toDF("doc_id", "len", "pos", "h")
    // every position belongs to windows max(0, pos−w+1) .. min(pos, L−w)
    // (clamped to window 0 when the doc has fewer than w grams)
    val wins = base.select(col("doc_id"), col("pos"), col("h"),
      explode(sequence(
        greatest(lit(0), col("pos") - lit(w - 1)),
        least(col("pos"), greatest(col("len") - lit(w), lit(0))))).as("wi"))
    wins.groupBy(col("doc_id"), col("wi"))
      .agg(min(struct(col("h"), negate(col("pos")).as("np"),
        col("pos"))).as("s"))
      .select(col("doc_id"), col("s.pos").cast("long").as("pos"),
        col("s.h").as("fp"))
      .distinct()
  }

  /** Candidate partial-copy pairs: documents sharing a fingerprint value,
    * with the shared-fingerprint count (the MOSS match score numerator).
    * The join runs on the winnowed sketch — ~2/(w+1) the size of the full
    * gram table.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, w: Int, maxBucket: Int = 10000): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp"))
      .distinct()
      .transform(graft.core.Caching.persist)
    // guardedCandidates DEDUPES pairs (one row per pair, not per shared
    // fingerprint), so the match-score numerator is recovered by
    // resolving both sides' sketches for exactly the surviving pairs —
    // work bounded by Σ per-candidate-pair sketch sizes
    LshGuard.guardedCandidates(fp, keyCols = Seq("fp"), idCol = "doc_id",
        maxBucket = maxBucket, ordered = true)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .join(fp.select(col("doc_id").as("doc_a"), col("fp")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("fp")), Seq("doc_b", "fp"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
  }
}
