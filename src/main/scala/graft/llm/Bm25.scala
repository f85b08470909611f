package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring (Robertson/Okapi) — rank documents against a
  * fixed query term set. The retrieval half of a training-data pipeline:
  * targeted corpus search, quality probes ("find docs about X"), and the
  * relevance side of contamination screens (the membership side is
  * `Contamination`).
  *
  * Engine-portable determinism, same discipline as `LmScore`: the single
  * transcendental (ln in idf) is computed once per QUERY TERM and
  * quantized to integer micro-units — |Q| logs total, never one per row.
  * Every per-(doc, term) contribution is micro-quantized before the
  * per-document sum, so the reduction is integer addition:
  * order-independent at any parallelism, bit-equal on any engine that
  * reproduces the formula (the DuckDB oracle does, term by term).
  *
  * Scale shape: one explode of the token column, map-side-combined tf
  * counts filtered to |Q| terms BEFORE the shuffle (the per-term fan-in is
  * |docs containing t|, not corpus token count), a broadcast of the |Q|-row
  * idf table, one keyed sum. Corpus-level stats (N, avgdl, df) are a
  * one-row / |Q|-row broadcast, never a driver collect of row-scale data.
  */
object Bm25 {

  /** score_micro(d) = Σ_{t ∈ Q ∩ d} round( idf_micro(t) · tf_factor(t,d) )
    * with idf_micro(t) = round(1e6 · ln((N − df + 0.5)/(df + 0.5))) and
    * tf_factor = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Output: (doc_id, n_terms, score_micro, score) for documents matching
    * ≥ 1 query term; score = score_micro / 1e6 (display only — ranking and
    * the oracle compare use the exact integer).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val spark = docs.sparkSession

    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))

    // Two streaming scans of the corpus, NOTHING corpus-sized cached: at
    // 100 TB two map-side-partial passes beat persisting a per-doc row.
    // corpus stats: one row. sum/count of exact longs; avgdl division
    // happens later in double on exact operands (deterministic IEEE).
    val stats = toks.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("sum_dl"))

    // tf per (doc, query term): explode + an In predicate (whole-stage
    // codegen end to end — filter(array, λ) evaluates interpreted per
    // element). Persisted: consumed twice (df counts + scoring) and it is
    // the |matching docs|·|Q|-bounded table, not the corpus token stream.
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .transform(graft.core.Caching.persist)

    // df per query term (+ explicit zero rows so idf exists for unmatched
    // terms — keeps the |Q|-row broadcast total even when a term is absent)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val allQ = spark.createDataFrame(queryTerms.map(Tuple1(_))).toDF("term")
    val dfFull = allQ.join(df, Seq("term"), "left_outer")
      .select(col("term"), coalesce(col("df"), lit(0L)).as("df"))

    // idf_micro per term: the only transcendental, |Q| evaluations.
    val idf = dfFull.crossJoin(broadcast(stats))
      .select(col("term"),
        round(lit(1e6) * log(
          (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5))))
          .cast("long").as("idf_micro"),
        col("n_docs"), col("sum_dl"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val tfFactor = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))

    tf.join(broadcast(idf), Seq("term"))
      .select(col("doc_id"),
        round(col("idf_micro").cast("double") * tfFactor).cast("long").as("c_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
           sum(col("c_micro")).cast("long").as("score_micro"))
      .select(col("doc_id"), col("n_terms"), col("score_micro"),
        (col("score_micro").cast("double") / lit(1e6)).as("score"))
  }

  /** The oracle's formula, parameterized identically — kept next to the
    * implementation so the two can only drift visibly.
    */
  def oracleSql(queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): String = {
    val qList = queryTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH tk AS (SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         FROM documents),
       d AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM tk),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
       occ AS (SELECT doc_id, dl, unnest(t) AS term FROM d),
       tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
         FROM occ WHERE list_contains($qList, term) GROUP BY 1, 2, 3),
       dfq AS (SELECT q.term, CAST(coalesce(n.df, 0) AS BIGINT) AS df
         FROM (SELECT unnest($qList) AS term) q
         LEFT JOIN (SELECT term, count(*) AS df FROM tf GROUP BY term) n
           ON q.term = n.term),
       idf AS (SELECT term,
           CAST(round(1e6 * ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
             / (CAST(df AS DOUBLE) + 0.5))) AS BIGINT) AS idf_micro,
           n_docs, sum_dl
         FROM dfq CROSS JOIN stats)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(c_micro) AS BIGINT) AS score_micro,
         CAST(sum(c_micro) AS DOUBLE) / 1e6 AS score
       FROM (
         SELECT tf.doc_id,
           CAST(round(CAST(idf.idf_micro AS DOUBLE)
             * (CAST(tf.tf AS DOUBLE) * ${k1 + 1.0}
                / (CAST(tf.tf AS DOUBLE)
                   + $k1 * (${1.0 - b} + $b * CAST(tf.dl AS DOUBLE)
                            / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
             AS BIGINT) AS c_micro
         FROM tf JOIN idf ON tf.term = idf.term)
       GROUP BY doc_id"""
  }
}
