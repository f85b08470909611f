package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: the fraction of a document's
  * word n-grams that appear in an evaluation set's n-gram table — the
  * standard train/test-overlap gate run before any corpus ships.
  *
  * Scale design: the eval n-gram table is small by construction (a few
  * benchmarks), so it broadcasts; each document's shingle set is derived
  * in one narrow scan (native ShinglesExpr) and the overlap is a
  * broadcast LEFT SEMI join on the exploded shingles — no shuffle of the
  * corpus, candidate work linear in total shingle count. Per-doc counts
  * come back through one hash aggregate keyed by doc_id.
  */
object Contamination {

  /** Per-doc overlap: (doc_id, n_shingles, n_matched, contamination).
    * Documents shorter than `n` tokens have no shingles and are excluded
    * (nothing to test). `evalNgrams` needs one string column `g`.
    */
  def contaminationScore(docs: DataFrame, evalNgrams: DataFrame,
                         idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        Dedup.shinglesText(col(textCol), n).as("s"))
      .where(size(col("s")) > 0)
    val ex = sh.select(col("doc_id"), explode(col("s")).as("g"))
    val matched = ex
      .join(broadcast(evalNgrams.select(col("g")).distinct()), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
    sh.select(col("doc_id"), size(col("s")).cast("long").as("n_shingles"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast("double")
          / col("n_shingles").cast("double")).as("contamination"))
  }
}
