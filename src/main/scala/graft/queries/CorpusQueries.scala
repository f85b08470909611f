package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.TextFunctions

/** Round-8 widening: corpus-surgery operators a training-data pipeline
  * runs BETWEEN near-dup detection and mixing — sub-document (chunk)
  * dedup with document reassembly (the RefinedWeb/CCNet paragraph-dedup
  * analog, expressed over fixed token windows because the fixture text
  * has no newline structure), cross-document n-gram repetition mass
  * (the boilerplate screen), and pairwise corpus drift between sources
  * (Jensen–Shannon divergence over unigram distributions). Every query
  * carries a DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *  - q232/q233 chunk tables are corpus-sized but never wider than
  *    (ids, 64-bit chunk hash, token count): the chunk STRING collapses
  *    to `portableHash` before any shuffle, so the dedup groupBy and the
  *    join back are both keyed on a fixed-width long. First-occurrence
  *    keep is a single hash aggregate (min of an encoded (doc, idx)
  *    key) — no windows, no sorts.
  *  - q234 collapses the corpus in the first (source, token) hash
  *    aggregate; everything after runs on per-source vocabularies
  *    (a token-keyed self-join producing |vocab|·O(sources²) rows,
  *    nothing corpus-sized). Divergence terms follow the established
  *    float discipline: exact decimal products inside `ln`, one
  *    fixed-order float expression per row, 1e-9-grid quantization
  *    before the order-independent sum.
  */
object CorpusQueries {

  /** Non-overlapping `c`-token windows of `t` as (idx, n_tokens, hash)
    * structs — the shared chunker for q232/q233. The chunk string exists
    * only inside this projection; downstream sees the 64-bit hash.
    */
  private def chunks(t: org.apache.spark.sql.Column, c: Int, seed: Int) = {
    val nChunks = ((size(t) + lit(c - 1)) / lit(c)).cast("int")
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(
        size(slice(t, i * lit(c) + lit(1), lit(c))).cast("long").as("ctoks"),
        TextFunctions.portableHash(
          concat_ws(" ", slice(t, i * lit(c) + lit(1), lit(c))), seed)
          .as("chash")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sub-document dedup with reassembly: split every document into
    // non-overlapping 20-token chunks, keep only each chunk's FIRST
    // occurrence corpus-wide (min encoded (doc_id, chunk_idx) — a pure
    // function of the data), and report per-document retention — the
    // paragraph-dedup pass RefinedWeb-style pipelines run after exact
    // dedup and before mixing. One hash aggregate finds keepers; one
    // hash-keyed join marks them; one aggregate reassembles.
    "q232_chunk_dedup" -> ((s, dir) => {
      val ch = graft.core.Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .select(col("doc_id"), col("source"),
          posexplode(chunks(col("t"), 20, 7)))
        .select(col("doc_id"), col("source"),
          col("pos").cast("long").as("chunk_idx"),
          col("col.ctoks").as("ctoks"), col("col.chash").as("chash"))
      // encoded first-occurrence key: chunk_idx < 1e6 (docs are far
      // shorter), so the encoding is collision-free and order-exact
      val k = col("doc_id") * lit(1000000L) + col("chunk_idx")
      val keep = ch.groupBy(col("chash")).agg(min(k).as("keeper"))
      ch.join(keep, "chash")
        .withColumn("kept", k === col("keeper"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("kept"), lit(1L)).otherwise(lit(0L))).as("kept_chunks"),
          sum(col("ctoks")).as("n_tokens"),
          sum(when(col("kept"), col("ctoks")).otherwise(lit(0L)))
            .as("kept_tokens"))
        .select(col("doc_id"), col("source"), col("n_chunks"),
          col("kept_chunks"), col("n_tokens"), col("kept_tokens"),
          (col("kept_tokens").cast("double") / col("n_tokens").cast("double"))
            .as("retention"))
    }),

    // Cross-document n-gram repetition mass (the boilerplate screen):
    // non-overlapping 3-token windows, document frequency per window
    // type corpus-wide, then per-source share of chunk occurrences whose
    // type recurs in >= 2 distinct documents. A production pipeline
    // raises the threshold to "appears in > p% of a crawl's pages" and
    // strips those windows; the fixture has no injected boilerplate, so
    // the screen measures near-dup-driven repetition mass instead —
    // identical plumbing (two hash aggregates + one hash-keyed join).
    "q233_repeated_ngram_mass" -> ((s, dir) => {
      val ch = graft.core.Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .select(col("doc_id"), col("source"),
          explode(chunks(col("t"), 3, 13)).as("c"))
        .select(col("doc_id"), col("source"), col("c.chash").as("chash"))
      val df = ch.groupBy(col("chash"))
        .agg(countDistinct(col("doc_id")).as("dfreq"))
      ch.join(df, "chash")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("dfreq") >= 2, lit(1L)).otherwise(lit(0L)))
            .as("rep_chunks"))
        .select(col("source"), col("n_chunks"), col("rep_chunks"),
          (col("rep_chunks").cast("double") / col("n_chunks").cast("double"))
            .as("rep_rate"))
    }),

    // Pairwise corpus drift: Jensen–Shannon divergence between every
    // two sources' unigram distributions — the drift matrix a mixing
    // stage consults before re-weighting sources. Matched-token terms:
    // p·ln(2p/(p+q)) with the ln argument assembled from EXACT decimal
    // integer products (2·c_a·T_b over c_a·T_b + c_b·T_a — the count
    // form of 2p/(p+q)), one fixed-order float expression per (pair,
    // token) row, quantized to the 1e-9 grid before the sum; the
    // disjoint-support mass contributes the closed-form ½·ln2·(miss_a/
    // T_a + miss_b/T_b) from exact integer sums. JS is symmetric,
    // bounded by ln 2, and zero iff the distributions agree.
    "q234_js_divergence" -> ((s, dir) => {
      val cnt = graft.core.Tables.documents(s, dir)
        .select(col("source"), explode(TextFunctions.tokens(col("text")))
          .as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("tt"))
      val v = cnt.join(broadcast(tot), "source")
      val a = v.select(col("source").as("src_a"), col("tok"),
        col("c").as("ca"), col("tt").as("ta"))
      val b = v.select(col("source").as("src_b"), col("tok"),
        col("c").as("cb"), col("tt").as("tb"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val x = dec(col("ca")) * dec(col("tb")) // overflow rule: decimal
      val y = dec(col("cb")) * dec(col("ta")) // BEFORE the product
      def term(c: org.apache.spark.sql.Column,
               t: org.apache.spark.sql.Column,
               num: org.apache.spark.sql.Column) =
        floor((c.cast("double") / t.cast("double"))
          * log((lit(2.0) * num.cast("double"))
            / (x + y).cast("double")) * lit(1e9)).cast("long")
      val g = a.join(b, Seq("tok")).where(col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"), col("ca"), col("cb"),
          col("ta"), col("tb"),
          term(col("ca"), col("ta"), x).as("ga"),
          term(col("cb"), col("tb"), y).as("gb"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_common"),
          min(col("ta")).as("ta"), min(col("tb")).as("tb"),
          sum(col("ca")).as("ma"), sum(col("cb")).as("mb"),
          sum(col("ga")).as("sa"), sum(col("gb")).as("sb"))
      g.select(col("src_a"), col("src_b"), col("n_common"),
        (lit(0.5) * log(lit(2.0))
          * ((col("ta") - col("ma")).cast("double") / col("ta").cast("double")
            + (col("tb") - col("mb")).cast("double")
              / col("tb").cast("double"))
          + lit(0.5) * (col("sa").cast("double") / lit(1e9)
            + col("sb").cast("double") / lit(1e9))).as("js"))
    })
  )

  // DuckDB oracle twins. Shared shapes: `tk` tokenizes exactly like
  // TextFunctions.tokens; portableHash(x, seed) is the first 8 md5 hex
  // digits of "seed|x" as a BIGINT on both engines.
  private val tkCte =
    """tk AS (SELECT doc_id, source,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
           x -> x <> '') AS t
       FROM documents)"""

  private def chunkCte(c: Int, seed: Int) =
    s"""ch AS (SELECT doc_id, source, i AS chunk_idx,
         len(t[i*$c+1 : i*$c+$c]) AS ctoks,
         CAST(concat('0x', substr(md5(concat('$seed', '|',
           array_to_string(t[i*$c+1 : i*$c+$c], ' '))), 1, 8)) AS BIGINT)
           AS chash
       FROM tk, unnest(range((len(t)+${c - 1})//$c)) AS u(i)
       WHERE len(t) > 0)"""

  def oracles: Map[String, String] = Map(
    "q232_chunk_dedup" ->
      s"""WITH $tkCte, ${chunkCte(20, 7)},
         k AS (SELECT chash, min(doc_id*1000000+chunk_idx) AS keeper
           FROM ch GROUP BY 1),
         g AS (SELECT doc_id, source, count(*) AS n_chunks,
             sum(CASE WHEN doc_id*1000000+chunk_idx = keeper
               THEN 1 ELSE 0 END) AS kept_chunks,
             sum(ctoks) AS n_tokens,
             sum(CASE WHEN doc_id*1000000+chunk_idx = keeper
               THEN ctoks ELSE 0 END) AS kept_tokens
           FROM ch JOIN k USING (chash) GROUP BY 1, 2)
         SELECT doc_id, source, CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(kept_chunks AS BIGINT) AS kept_chunks,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(kept_tokens AS BIGINT) AS kept_tokens,
           CAST(kept_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS retention
         FROM g""",
    "q233_repeated_ngram_mass" ->
      s"""WITH $tkCte, ${chunkCte(3, 13)},
         df AS (SELECT chash, count(DISTINCT doc_id) AS dfreq
           FROM ch GROUP BY 1),
         g AS (SELECT source, count(*) AS n_chunks,
             sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS rep_chunks
           FROM ch JOIN df USING (chash) GROUP BY 1)
         SELECT source, CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(rep_chunks AS BIGINT) AS rep_chunks,
           CAST(rep_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS rep_rate
         FROM g""",
    "q234_js_divergence" ->
      s"""WITH $tkCte,
         cnt AS (SELECT source, tok, count(*) AS c
           FROM (SELECT source, unnest(t) AS tok FROM tk) GROUP BY 1, 2),
         tot AS (SELECT source, sum(c) AS tt FROM cnt GROUP BY 1),
         v AS (SELECT cnt.source, tok, c, tt FROM cnt JOIN tot USING (source)),
         j AS (SELECT a.source AS src_a, b.source AS src_b, a.tok,
             a.c AS ca, b.c AS cb, a.tt AS ta, b.tt AS tb,
             CAST(a.c AS DECIMAL(38,0)) * b.tt AS x,
             CAST(b.c AS DECIMAL(38,0)) * a.tt AS y
           FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source),
         t AS (SELECT src_a, src_b, ca, cb, ta, tb,
             CAST(floor((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
               * ln((2.0 * CAST(x AS DOUBLE)) / CAST(x + y AS DOUBLE))
               * 1e9) AS BIGINT) AS ga,
             CAST(floor((CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
               * ln((2.0 * CAST(y AS DOUBLE)) / CAST(x + y AS DOUBLE))
               * 1e9) AS BIGINT) AS gb
           FROM j),
         g AS (SELECT src_a, src_b, count(*) AS n_common,
             min(ta) AS ta, min(tb) AS tb, sum(ca) AS ma, sum(cb) AS mb,
             sum(ga) AS sa, sum(gb) AS sb
           FROM t GROUP BY 1, 2)
         SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
           0.5 * ln(2.0)
             * (CAST(ta - ma AS DOUBLE) / CAST(ta AS DOUBLE)
               + CAST(tb - mb AS DOUBLE) / CAST(tb AS DOUBLE))
           + 0.5 * (CAST(sa AS DOUBLE) / 1e9 + CAST(sb AS DOUBLE) / 1e9)
             AS js
         FROM g"""
  )
}
