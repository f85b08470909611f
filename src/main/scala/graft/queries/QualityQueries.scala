package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Money.dec

/** Round-6 widening, part 2: the data-platform operators a production
  * warehouse team reaches for daily that the 163-query gate still lacked —
  * a Deequ-style data-quality verification suite, incremental aggregate
  * (materialized-view) maintenance, blocked record linkage, robust
  * (median/MAD) outlier detection, and an item-item co-occurrence
  * recommender. Every query carries a DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *  - q164 computes the WHOLE constraint suite in one scan: every metric is
  *    an aggregate over the same pass (the distinct-count plans as Spark's
  *    expand+two-phase aggregate, still one scan), then a constant-width
  *    stack unpivots 7 metrics into rows. Deequ's VerificationSuite shape.
  *  - q165 is the IVM argument: the maintained view equals a full
  *    recompute, but the merge step touches |delta| + |groups| rows only —
  *    at 100 TB the base aggregate is a stored table and the delta is the
  *    day's changelog, so maintenance cost is independent of base size.
  *  - q166 bounds candidate pairs by Σ block² via the (nation, segment)
  *    blocking key — the standard record-linkage trick that turns O(n²)
  *    comparisons into per-block joins; scoring is codegen'd levenshtein
  *    plus an exact integer-cents balance band.
  *  - q167 is two keyed aggregates plus two broadcast joins of per-group
  *    stats (|groups| rows); the corpus never shuffles.
  *  - q168's pair explosion is bounded by Σ basket² (baskets are order
  *    line counts, single digits); the per-item ranking runs through the
  *    bounded TopKAggregator — k rows per partial, never a sort window.
  */
object QualityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Data-quality verification suite (Deequ VerificationSuite analog):
    // 7 constraints — table size, column completeness, key uniqueness,
    // domain compliance, min/max bounds, mean-in-range — all computed in
    // a single scan and unpivoted to one row per check. Money mean uses
    // the exact decimal sum divided in double; the totals stay < 2^53
    // units through sf~100, so the decimal→double cast is exact on both
    // engines (no int128 rounding divergence).
    "q164_dq_suite" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .agg(
          count(lit(1)).as("n"),
          count(col("l_quantity")).as("n_qty"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_pk"),
          sum(when(col("l_discount").between(0.0, 0.1), 1L).otherwise(0L))
            .as("n_disc_ok"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          sum(dec(col("l_extendedprice"))).as("sum_price"))
        .select(expr(
          """stack(7,
               'size_ge_1000', CAST(n AS DOUBLE), CAST(n >= 1000 AS INT),
               'completeness_l_quantity', CAST(n_qty AS DOUBLE) / n,
                 CAST(n_qty = n AS INT),
               'uniqueness_order_line', CAST(n_pk AS DOUBLE) / n,
                 CAST(n_pk = n AS INT),
               'compliance_discount_0_to_0.1', CAST(n_disc_ok AS DOUBLE) / n,
                 CAST(n_disc_ok = n AS INT),
               'min_quantity_ge_1', CAST(min_qty AS DOUBLE),
                 CAST(min_qty >= 1.0 AS INT),
               'max_quantity_le_50', CAST(max_qty AS DOUBLE),
                 CAST(max_qty <= 50.0 AS INT),
               'mean_price_in_range', CAST(sum_price AS DOUBLE) / n,
                 CAST(CAST(sum_price AS DOUBLE) / n BETWEEN 1000.0 AND 100000.0
                   AS INT)
             ) AS (check_name, metric, passed)"""))
    }),

    // Incremental aggregate maintenance (materialized-view delta-apply):
    // the base slice's stored summary is merged with a signed changelog
    // aggregate (rows after the cutoff; every 7th line is a retraction) via
    // one full-outer pass on the group key — the DBSP/Materialize shape.
    // The oracle recomputes the same arithmetic in one direct pass, so a
    // green hash IS the IVM correctness proof: maintain(base, delta) ≡
    // recompute(base ⊎ delta). All money math in exact decimal.
    "q165_incremental_view" -> ((s, dir) => {
      val cutoff = lit("1997-01-01").cast("timestamp")
      val li = Tables.lineitem(s, dir)
      val key = Seq("l_returnflag", "l_linestatus")
      val base = li.filter(col("l_shipdate") < cutoff)
        .groupBy(key.map(col): _*)
        .agg(sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("b_qty"),
             count(lit(1)).as("b_cnt"))
      val delta = li.filter(col("l_shipdate") >= cutoff)
        .withColumn("op",
          when(col("l_linenumber") % 7 === 0, lit(-1)).otherwise(lit(1)))
        .groupBy(key.map(col): _*)
        .agg(sum(col("op") * dec(col("l_quantity"))).cast("decimal(38,2)")
               .as("d_qty"),
             sum(col("op").cast("long")).as("d_cnt"))
      val zero = lit(0).cast("decimal(38,2)")
      base.join(delta, key, "full_outer")
        .select(col("l_returnflag"), col("l_linestatus"),
          (coalesce(col("b_qty"), zero) + coalesce(col("d_qty"), zero))
            .cast("double").as("sum_qty"),
          (coalesce(col("b_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
            .as("n_rows"))
    }),

    // Blocked record linkage (Fellegi–Sunter shape): candidate pairs from
    // a (nation, segment) blocking join, scored on two fields — edit
    // distance of names (≤2 → strong agreement) and an account-balance
    // band evaluated in exact integer cents (no double-boundary flips).
    // Pairs scoring ≥ 2 are links. Candidates are bounded by Σ block².
    "q166_record_linkage" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val a = c.columns.foldLeft(c)((d, n) => d.withColumnRenamed(n, "a_" + n))
      val b = c.columns.foldLeft(c)((d, n) => d.withColumnRenamed(n, "b_" + n))
      a.join(b,
          col("a_c_nationkey") === col("b_c_nationkey") &&
          col("a_c_mktsegment") === col("b_c_mktsegment") &&
          col("a_c_custkey") < col("b_c_custkey"))
        .withColumn("lev", levenshtein(col("a_c_name"), col("b_c_name")))
        .withColumn("score",
          when(col("lev") <= 2, lit(2)).otherwise(lit(0)) +
          when(abs(col("a_cents") - col("b_cents")) < 50000L, lit(1))
            .otherwise(lit(0)))
        .filter(col("score") >= 2)
        .select(col("a_c_custkey").as("id_a"), col("b_c_custkey").as("id_b"),
          col("lev"), col("score"))
    }),

    // Robust outliers via median/MAD (modified z-score, Iglewicz–Hoaglin
    // 0.6745·(x−med)/MAD > 3.5): the heavy-tail-safe twin of q110's
    // mean/stddev z-score. Exact interpolated medians per group (the q53
    // pattern both engines compute identically), per-group stats ride
    // broadcasts; every float op is a fixed per-row expression, so doubles
    // are bit-identical at any parallelism.
    "q167_mad_outliers" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .withColumn("robust_z",
          lit(0.6745) * (col("value") - col("med")) / col("mad"))
        .filter(abs(col("robust_z")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          col("robust_z"))
    }),

    // Item-item co-occurrence recommender ("customers who bought X also
    // bought"): distinct basket–item pairs self-join on the basket key
    // (bounded by Σ basket², baskets are single-digit order line counts),
    // pair counts in one hash aggregate, then top-3 co-items per item by
    // (count desc, item asc) through the bounded TopKAggregator — k rows
    // per partial aggregate, never a ranking window over the corpus.
    "q168_cooccur_recs" -> ((s, dir) => {
      import s.implicits._
      val bi = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val co = bi.select(col("ok"), col("pk").as("item"))
        .join(bi.select(col("ok"), col("pk").as("rec")), "ok")
        .filter(col("item") =!= col("rec"))
        .groupBy(col("item"), col("rec"))
        .agg(count(lit(1)).as("cnt"))
      val topk = new graft.llm.Similarity.TopKAggregator(3).toColumn
      co.select(col("item"), col("rec"), col("cnt").cast("double").as("score"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, rec, s0) => (rec, s0) }
        .agg(topk.name("top"))
        .flatMap { case (item, top) =>
          top.iterator.zipWithIndex.map { case ((rec, s0), i) =>
            (item, rec, s0.toLong, (i + 1).toLong)
          }
        }
        .toDF("item", "rec", "cnt", "rnk")
    })
  )

  def oracles: Map[String, String] = Map(
    "q164_dq_suite" ->
      """WITH a AS (
           SELECT count(*) AS n, count(l_quantity) AS n_qty,
             count(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
             sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END)
               AS n_disc_ok,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS sum_price
           FROM lineitem)
         SELECT 'size_ge_1000' AS check_name, CAST(n AS DOUBLE) AS metric,
           CAST(n >= 1000 AS INT) AS passed FROM a
         UNION ALL SELECT 'completeness_l_quantity',
           CAST(n_qty AS DOUBLE) / n, CAST(n_qty = n AS INT) FROM a
         UNION ALL SELECT 'uniqueness_order_line',
           CAST(n_pk AS DOUBLE) / n, CAST(n_pk = n AS INT) FROM a
         UNION ALL SELECT 'compliance_discount_0_to_0.1',
           CAST(n_disc_ok AS DOUBLE) / n, CAST(n_disc_ok = n AS INT) FROM a
         UNION ALL SELECT 'min_quantity_ge_1', CAST(min_qty AS DOUBLE),
           CAST(min_qty >= 1.0 AS INT) FROM a
         UNION ALL SELECT 'max_quantity_le_50', CAST(max_qty AS DOUBLE),
           CAST(max_qty <= 50.0 AS INT) FROM a
         UNION ALL SELECT 'mean_price_in_range', CAST(sum_price AS DOUBLE) / n,
           CAST(CAST(sum_price AS DOUBLE) / n BETWEEN 1000.0 AND 100000.0
             AS INT) FROM a""",
    "q165_incremental_view" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' THEN 1
                         WHEN l_linenumber % 7 = 0 THEN -1 ELSE 1 END
                    * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
             AS sum_qty,
           CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' THEN 1
                         WHEN l_linenumber % 7 = 0 THEN -1 ELSE 1 END)
             AS BIGINT) AS n_rows
         FROM lineitem GROUP BY 1, 2""",
    "q166_record_linkage" ->
      """WITH c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
         p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             levenshtein(a.c_name, b.c_name) AS lev,
             (CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 2 ELSE 0 END
              + CASE WHEN abs(a.cents - b.cents) < 50000 THEN 1 ELSE 0 END)
               AS score
           FROM c a JOIN c b
             ON a.c_nationkey = b.c_nationkey
            AND a.c_mktsegment = b.c_mktsegment
            AND a.c_custkey < b.c_custkey)
         SELECT id_a, id_b, CAST(lev AS INT) AS lev, CAST(score AS INT)
           AS score FROM p WHERE score >= 2""",
    "q167_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY 1),
         dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
           FROM events e JOIN med m USING (event_type)),
         mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT d.event_id, d.event_type, d.value,
           0.6745 * (d.value - d.med) / m.mad AS robust_z
         FROM dev d JOIN mad m USING (event_type)
         WHERE abs(0.6745 * (d.value - d.med) / m.mad) > 3.5""",
    "q168_cooccur_recs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         co AS (SELECT a.pk AS item, b.pk AS rec, count(*) AS cnt
           FROM bi a JOIN bi b ON a.ok = b.ok AND a.pk <> b.pk
           GROUP BY 1, 2),
         r AS (SELECT item, rec, cnt,
             row_number() OVER (PARTITION BY item ORDER BY cnt DESC, rec)
               AS rnk
           FROM co)
         SELECT item, rec, CAST(cnt AS BIGINT) AS cnt,
           CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3"""
  )
}
