package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.core.Money
import graft.core.Money.{dec, sum38, sumDec, sumDecFast}

/** Remaining SURVEY §2.4/§2.5 capability rows: outer joins, range
  * (non-equi) join, as-of join, cube, HLL approximate distinct.
  */
object ExtendedRelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LEFT OUTER: every customer, order stats or zero (null-safe coalesce).
    "q47_outer_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > lit(200000.0))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
             // decimal, not double: double summation order differs between
             // Spark's partial-agg tree and the oracle's scan → last-bit
             // drift that can land on the driver's %.6g rounding boundary
             // (this exact query did, round 1).
             sum38(coalesce(dec(col("o_totalprice")), lit(0).cast("decimal(14,2)")), 2).as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // FULL OUTER over disjoint-ish aggregates: null sides survive.
    "q48_full_outer" -> ((s, dir) => {
      val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("ck_f")).agg(count(lit(1)).as("n_f"))
      val p = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
        .groupBy(col("o_custkey").as("ck_p")).agg(count(lit(1)).as("n_p"))
      f.join(p, f("ck_f") === p("ck_p"), "full_outer")
        .select(coalesce(col("ck_f"), col("ck_p")).as("custkey"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("n_p"), lit(0L)).as("n_p"))
    }),

    // Range (non-equi) join against a tiny broadcast bucket table — the
    // scale-safe shape: BroadcastNestedLoopJoin, fact side never shuffles.
    "q49_range_join" -> ((s, dir) => {
      val buckets = s.createDataFrame(Seq(
        ("small", 0.0, 10.0), ("mid", 10.0, 30.0), ("large", 30.0, 100.0)))
        .toDF("bucket", "lo", "hi")
      Tables.lineitem(s, dir)
        .join(broadcast(buckets),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sumDecFast(col("l_extendedprice")).as("revenue"))
    }),

    // As-of join, window formulation: for every event, the most recent
    // 'signup' timestamp of the same user at-or-before it. One shuffle on
    // user_id, NO join explosion — this is the 100 TB-safe as-of shape
    // (a range join would rescan candidate windows per row).
    "q50_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("asof_signup_us",
          unix_micros(last(when(col("event_type") === "signup", col("ts")),
            ignoreNulls = true).over(w)))
        .groupBy(col("user_id"))
        .agg(count(when(col("asof_signup_us").isNotNull, lit(1))).as("n_after_signup"),
             count(lit(1)).as("n_events"),
             max(col("asof_signup_us")).as("last_signup_us"))
    }),

    // Batch interval join in equi-join shape (the §2.5 interval row's
    // batch form): ordered event pairs of the same user within 10 minutes,
    // joined on (user, time-bucket) — a shuffled equi-join, never a
    // per-key cross product or a nested-loop range join.
    "q68_interval_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
      graft.streaming.StreamJoins.bucketedIntervalJoin(e, e, "user_id", "ts", 600000L)
        .where(col("b_ts") > col("a_ts") ||
          (col("b_ts") === col("a_ts") && col("a_event_id") < col("b_event_id")))
        .groupBy(col("a_user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // CUBE: all grouping-set combinations (reference lacks these entirely).
    "q51_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             Money.sumDecFast(col("o_totalprice")).as("revenue"))
    }),

    // Exact percentiles (interpolated, = SQL percentile_cont semantics).
    // At scale the approx variant (percentile_approx / KLL-style sketch)
    // replaces this; the exact form sorts within each group.
    "q53_percentile" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"),
             expr("percentile(o_totalprice, 0.9)").as("p90_price"),
             count(lit(1)).as("n"))
    }),

    // Analytic window functions beyond rank: lag/lead offsets and ntile
    // bucketing per partition (one shuffle on the partition key).
    "q59_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
        .where(col("prev_price").isNotNull)
    }),

    // Regex scalar functions (patterns restricted to the RE2∩Java subset
    // so the oracle semantics match).
    "q60_regex_funcs" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "([a-z]+) ([a-z]+)", 1).as("type_first"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devoweled"),
          col("p_brand").rlike("Brand#[0-9]+").cast("int").cast("long").as("brand_ok"))
    }),

    // Approximate percentile (Greenwald-Khanna sketch) with a hard
    // accuracy-bound oracle, same pattern as q52: the sketch VALUE is
    // merge-order sensitive, but the 1e-4 rank-accuracy bound makes the
    // 5%-of-exact boolean stable. At scale the sketch replaces the exact
    // percentile's full per-group sort.
    "q70_approx_percentile" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
             expr("percentile(o_totalprice, 0.9)").as("exact_p90"),
             percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
             percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("a90"),
             count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("exact_p50"), col("exact_p90"), col("n"),
          (abs(col("a50") - col("exact_p50")) / col("exact_p50") <= lit(0.05)).as("p50_ok"),
          (abs(col("a90") - col("exact_p90")) / col("exact_p90") <= lit(0.05)).as("p90_ok"))
    }),

    // HLL approximate distinct (SURVEY §2.4 approx row). HLL sketch values
    // are implementation-specific, so the hard-checkable contract is the
    // accuracy BOUND: emit exact distinct, row count, and whether the HLL
    // estimate lands within 5% of exact. HLL is deterministic for fixed
    // input, so this is a stable boolean the DuckDB oracle reproduces as
    // literal TRUE over its own exact counts. At scale the approx form
    // replaces the exact-distinct shuffle expansion.
    "q52_approx_distinct" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      // One scan for BOTH exact and approx: pre-group to distinct
      // (l_returnflag, l_orderkey) pairs, then count pairs per flag
      // (= exact distinct) and run the HLL over the SAME pre-distinct
      // rows — HLL registers are maxima over hashed elements, so the
      // sketch over the deduped set is bit-identical to one over the raw
      // multiset. This dodges the trap of fusing countDistinct +
      // approx_count_distinct in one agg (Spark's distinct-rewrite then
      // allocates the 16K-register HLL buffer per (flag, orderkey) pair —
      // measured 64 s and OOM-prone): here the HLL only ever aggregates
      // per flag, and the pair-level shuffle carries map-side-combined
      // counts, not raw rows.
      l.groupBy(col("l_returnflag"), col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        // count(l_orderkey), not count(*): a NULL-key group must not count
        // as a distinct value (countDistinct / the oracle's DISTINCT and
        // the HLL all ignore NULLs; count(*) over the pre-grouped rows
        // would include it)
        .agg(count(col("l_orderkey")).as("exact_orders"),
             sum(col("cnt")).cast("long").as("n"),
             approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
        .select(col("l_returnflag"), col("exact_orders"), col("n"),
          (abs(col("approx") - col("exact_orders")).cast("double")
            / col("exact_orders").cast("double") <= lit(0.05)).as("within_5pct"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q47_outer_join" ->
      """SELECT c_mktsegment, CAST(count(o_orderkey) AS BIGINT) AS n_big_orders,
         sum(coalesce(CAST(o_totalprice AS DECIMAL(14,2)), CAST(0 AS DECIMAL(14,2)))) AS revenue,
         CAST(count(*) AS BIGINT) AS n_rows
         FROM customer LEFT JOIN (
           SELECT * FROM orders WHERE o_totalprice > 200000) o
           ON c_custkey = o_custkey
         GROUP BY c_mktsegment""",
    "q48_full_outer" ->
      """WITH f AS (SELECT o_custkey AS ck_f, CAST(count(*) AS BIGINT) AS n_f
             FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
         p AS (SELECT o_custkey AS ck_p, CAST(count(*) AS BIGINT) AS n_p
             FROM orders WHERE o_orderstatus = 'P' GROUP BY 1)
         SELECT coalesce(ck_f, ck_p) AS custkey,
           coalesce(n_f, 0) AS n_f, coalesce(n_p, 0) AS n_p
         FROM f FULL OUTER JOIN p ON ck_f = ck_p""",
    "q49_range_join" ->
      """SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS revenue
         FROM lineitem JOIN (VALUES ('small', 0.0, 10.0), ('mid', 10.0, 30.0),
           ('large', 30.0, 100.0)) b(bucket, lo, hi)
           ON l_quantity >= lo AND l_quantity < hi
         GROUP BY bucket""",
    "q50_asof_join" ->
      """WITH a AS (SELECT user_id,
           epoch_us(last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS asof_signup_us
         FROM events)
         SELECT user_id,
           CAST(count(CASE WHEN asof_signup_us IS NOT NULL THEN 1 END) AS BIGINT) AS n_after_signup,
           CAST(count(*) AS BIGINT) AS n_events,
           max(asof_signup_us) AS last_signup_us
         FROM a GROUP BY user_id""",
    "q68_interval_join" ->
      """SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
         FROM events a JOIN events b ON a.user_id = b.user_id
           AND b.ts >= a.ts
           AND epoch_ms(b.ts) - epoch_ms(a.ts) <= 600000
           AND (b.ts > a.ts OR (b.ts = a.ts AND a.event_id < b.event_id))
         GROUP BY a.user_id""",
    "q51_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(o_totalprice AS DECIMAL(14,2))) AS revenue
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q59_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         o_totalprice - lag(o_totalprice, 1) OVER w AS delta
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         QUALIFY prev_price IS NOT NULL""",
    "q60_regex_funcs" ->
      """SELECT p_partkey,
         regexp_extract(p_type, '([a-z]+) ([a-z]+)', 1) AS type_first,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
         CAST(CAST(regexp_matches(p_brand, 'Brand#[0-9]+') AS INTEGER) AS BIGINT) AS brand_ok
         FROM part""",
    "q53_percentile" ->
      """SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS median_price,
         quantile_cont(o_totalprice, 0.9) AS p90_price,
         CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderpriority""",
    // HLL sketch VALUES are engine-specific, but the 5%-accuracy contract
    // is hard-checkable: the oracle computes the exact counts and asserts
    // the bound holds (Spark's HLL is deterministic for fixed input).
    "q52_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
         count(*) AS n, TRUE AS within_5pct
         FROM lineitem GROUP BY l_returnflag""",
    "q70_approx_percentile" ->
      """SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS exact_p50,
         quantile_cont(o_totalprice, 0.9) AS exact_p90,
         CAST(count(*) AS BIGINT) AS n,
         TRUE AS p50_ok, TRUE AS p90_ok
         FROM orders GROUP BY o_orderpriority"""
  )
}
