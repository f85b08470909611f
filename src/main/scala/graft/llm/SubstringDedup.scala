package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication: for every document, the maximal
  * token spans whose every k-gram also occurs in ANOTHER document — the
  * distributed re-expression of suffix-array substring dedup (Lee et
  * al., "Deduplicating Training Data Makes Language Models Better",
  * which scans one big suffix array for cross-corpus repeats ≥ a length
  * floor). Positional k-grams find exactly the same spans: a run of t
  * consecutive duplicated k-gram start positions IS a repeated substring
  * of t + k − 1 tokens, and a repeated substring of m ≥ k tokens shows
  * up as its m − k + 1 duplicated k-gram positions.
  *
  * Scale design: nothing here ever shuffles document text. The corpus
  * explodes to (doc_id, pos, gram) rows once; cross-doc grams are found
  * with a hash aggregate on the gram (min ≠ max doc id ⟺ ≥ 2 distinct
  * docs — no count-distinct expansion), duplicated positions come back
  * through a semi-join on that (typically small) gram table, and span
  * merging is the islands trick under a per-document window — each
  * partition sorts only its own documents' duplicated positions. At
  * 100 TB the gram JOIN KEY would be xxhash64(gram) to shrink shuffle
  * bytes (collisions only ever over-mark a position as duplicated);
  * kept as the gram string here so the DuckDB oracle is expressible
  * verbatim.
  *
  * The reference has no substring-dedup surface at all (its exactly-once
  * keyed state dedups whole records by key); this operator is part of
  * this library's LLM-pipeline extension surface, like [[Contamination]].
  */
object SubstringDedup {

  /** Per-document duplicated-span profile against the rest of the corpus.
    *
    * Output: (doc_id, n_dup_grams, n_spans, longest_span) where
    * `n_dup_grams` counts k-gram positions whose gram appears in some
    * other document, `n_spans` counts maximal consecutive runs of such
    * positions, and `longest_span` is the longest run in TOKENS
    * (run length + k − 1). Documents with no cross-doc repeat — or
    * shorter than k tokens — report zeros.
    *
    * Within-doc repeats are deliberately out of scope (q65's repetition
    * score owns those): a gram occurring twice in one document and
    * nowhere else marks nothing.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
        posexplode(ShinglesExpr.occurrences(col(textCol), k)))
      .toDF("doc_id", "pos", "gram")
      .transform(graft.core.Caching.persist)
    // min ≠ max doc id ⟺ the gram crosses documents; the aggregate is
    // one narrow shuffle of (gram, id, id) partials
    val crossDoc = grams.groupBy("gram")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .where(col("mn") =!= col("mx"))
      .select("gram")
    val dupPos = grams.join(crossDoc, Seq("gram"), "left_semi")
      .select("doc_id", "pos")
    // islands: consecutive positions share (pos − row_number) within a doc
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dupPos
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("run"))
    val perDoc = spans.groupBy("doc_id").agg(
      sum("run").as("n_dup_grams"),
      count(lit(1)).as("n_spans"),
      (max("run") + lit(k - 1)).as("longest_span"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_grams"), lit(0L)).cast("bigint").as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).cast("bigint").as("n_spans"),
        coalesce(col("longest_span"), lit(0L)).cast("bigint").as("longest_span"))
  }
}
