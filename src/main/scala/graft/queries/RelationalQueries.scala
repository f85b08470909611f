package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.core.Money.{avgDec, avgRate, dec, oneMinus, onePlus, sum38, sum38Fast, sumDec, sumDecFast}

/** Batch relational surface (SURVEY §2.2–§2.5, §2.10): projections, filters,
  * every join shape, grouped aggregates, sorts/limits/top-k, set ops, scalar
  * functions, UDAF contract. Each query has a DuckDB oracle in `oracles`.
  *
  * Scale notes (100 TB posture):
  *  - filters/projections are declarative → Catalyst pushes them into the
  *    parquet scan (verified in PlanSpec);
  *  - dim tables (region/nation/customer/supplier/part) are explicitly
  *    `broadcast()` so fact-side never shuffles for those joins;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key once and AQE
  *    handles skew; aggregates are hash-based with map-side partials.
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: scan → filter → hash agg (partial+final).
    "q01_agg_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // quantity is integer-valued: double summation is exact (< 2^53)
          // regardless of order, so it needs no decimal treatment.
          sum(col("l_quantity")).as("sum_qty"),
          // cents fast path for the scale-2 sum only: Long capacity at
          // scale 2 (9.2e16 dollars/group) clears 100 TB with ~15×
          // headroom, but scale-4/6 product units overflow around SF
          // 100-10k — those stay on the decimal(38,s) path
          sumDecFast(col("l_extendedprice")).as("sum_base_price"),
          sum38(dec(col("l_extendedprice")) * oneMinus(col("l_discount")), 4).as("sum_disc_price"),
          sum38(dec(col("l_extendedprice")) * oneMinus(col("l_discount")) * onePlus(col("l_tax")), 6).as("sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          avgDec(col("l_extendedprice")).as("avg_price"),
          avgRate(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Projection + filter; both reach the parquet scan (pushdown + pruning).
    "q02_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > lit(45.0) && col("l_discount") >= lit(0.05))
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
    }),

    // Fact⋈fact equi-join: shuffles both sides on the key (SMJ/SHJ via AQE).
    "q03_join_inner" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(sumDecFast(col("o_totalprice")).as("total_revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Star join: orders⋈customer⋈nation⋈region, dims broadcast — the fact
    // table crosses the network at most once (for the c_custkey shuffle).
    "q04_join_star" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sumDecFast(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q5 analog ("local supplier volume"): the 6-way star join the
    // optimizer showcase queries are built around — lineitem⋈orders is
    // the ONE fact-fact shuffle (co-keyed on orderkey); customer,
    // supplier, nation and region are dims that broadcast, and the
    // c_nationkey = s_nationkey equality rides the supplier broadcast as
    // a post-join filter. Date filter pushes to the orders scan; revenue
    // sums in exact decimal (Money.sum38 — order-independent at any
    // parallelism).
    "q151_local_supplier" -> ((s, dir) => {
      val nations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          (dec(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .as("rev"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum38(col("rev"), 4).as("revenue"), count(lit(1)).as("n_items"))
    }),

    // Broadcast hash join: part is a dim → no shuffle of lineitem at all.
    "q05_join_broadcast" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        // scale-4 units would overflow Long near SF 10k — decimal path
        .agg(sum38(dec(col("l_extendedprice")) * oneMinus(col("l_discount")), 4).as("revenue"))
    }),

    // Left-semi join (EXISTS): customers having at least one 'F' order.
    "q06_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("F"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"), sumDecFast(col("c_acctbal")).as("sum_acctbal"))
    }),

    // Left-anti join (NOT EXISTS): customers with no high-value order.
    "q07_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > lit(300000.0))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // All five named aggregates of the reference Table API
    // (IGroupedTable.Count/Sum/Avg/Min/Max, Table.cs:51-82) in one pass.
    "q08_agg_stats" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("cnt"),
          sumDecFast(col("o_totalprice")).as("sum_price"),
          avgDec(col("o_totalprice")).as("avg_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    }),

    // distinct (SURVEY §2.4 capability-parity row).
    "q09_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus")).distinct()),

    // count(distinct) — exact distinct per group (shuffle on group key,
    // Spark expands distinct internally).
    "q10_count_distinct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
    }),

    // Global sort + limit (top-k). TakeOrderedAndProject: per-partition
    // top-k then merge on driver — no full sort shuffle at scale.
    "q11_sort_limit" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Set ops. Spark union is UNION ALL → distinct() to match SQL UNION.
    "q12_union" -> ((s, dir) => {
      val a = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("F")).select(col("o_custkey"))
      val b = Tables.orders(s, dir).filter(col("o_totalprice") > lit(100000.0)).select(col("o_custkey"))
      a.union(b).distinct()
    }),
    "q13_except" -> ((s, dir) => {
      val f = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("F")).select(col("o_custkey"))
      val p = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("P")).select(col("o_custkey"))
      f.except(p)
    }),
    "q14_intersect" -> ((s, dir) => {
      val f = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("F")).select(col("o_custkey"))
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("O")).select(col("o_custkey"))
      f.intersect(o)
    }),

    // Analytic window function: top-3 orders per priority (deterministic
    // tie-break on orderkey).
    "q15_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
    }),

    // Scalar string functions (reference has none — SURVEY §2.10 gap we fill).
    "q16_string_funcs" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          lower(col("p_type")).as("type_lower"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pre"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .filter(col("p_name").like("%gold%") || col("p_size") > lit(40))
    }),

    // Scalar date functions over o_orderdate (ms-precision timestamp).
    "q17_date_funcs" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n"), sumDecFast(col("o_totalprice")).as("revenue"))
    }),

    // Scalar math functions.
    "q18_math_funcs" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_linenumber") === lit(1))
        .select(
          col("l_orderkey"),
          round(col("l_extendedprice"), 0).as("price_round"),
          floor(col("l_discount") * lit(100.0)).cast("long").as("disc_pct"),
          ceil(col("l_tax") * lit(100.0)).cast("long").as("tax_pct"),
          abs(col("l_quantity") - lit(25.0)).as("qty_dev"),
          sqrt(col("l_extendedprice")).as("price_sqrt"))
    }),

    // CASE WHEN + conditional aggregation.
    "q19_case_when" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sum38Fast(when(col("l_discount") > lit(0.05), col("l_extendedprice"))
            .otherwise(lit(0.0)), 2).as("high_disc_rev"),
          sum38Fast(when(col("l_discount") <= lit(0.05), col("l_extendedprice"))
            .otherwise(lit(0.0)), 2).as("low_disc_rev"),
          count(when(col("l_quantity") > lit(30.0), lit(1))).as("n_bulk"))
    }),

    // GROUP BY + HAVING.
    "q20_having" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
        .filter(col("total_qty") > lit(3000.0))
    }),

    // flatMap/explode (IFlatMapOperator → SQL Generator): token frequency
    // over part names.
    "q21_explode_tokens" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
    }),

    // UDAF on the reference IAggregateOperator contract (zero/add/merge/
    // finish): quantity-weighted average price per return flag.
    "q22_udaf_weighted_avg" -> ((s, dir) => {
      val wavg = graft.operators.WeightedAvgExact.columnUdaf
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
    }),

    // JSON scalar function over events.props. from_json with an explicit
    // schema, not get_json_object: ONE parse per row feeding both the
    // projection and the filter (get_json_object re-parses per call site),
    // and the struct schema lets Catalyst prune unread JSON fields.
    "q23_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
                from_json(col("props"),
                  org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
                  .getField("k").as("k"))
        .filter(col("k") > lit(50L))
    }),

    // Grouping sets via rollup (absent in reference; capability parity).
    "q24_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    // Correlated-style scalar: orders above their customer's average.
    "q25_subquery_avg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val custAvg = o.groupBy(col("o_custkey").as("ck"))
        .agg(avgDec(col("o_totalprice")).as("avg_price"))
      o.join(custAvg, o("o_custkey") === custAvg("ck"))
        .filter(col("o_totalprice") > col("avg_price") * lit(1.5))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS sum_base_price,
         sum(CAST(l_extendedprice AS DECIMAL(14,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS sum_disc_price,
         sum(CAST(l_extendedprice AS DECIMAL(14,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS sum_charge,
         avg(l_quantity) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
         CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_extendedprice * (1 - l_discount) AS net_price
         FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""",
    "q03_join_inner" ->
      """SELECT c_mktsegment, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS total_revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q04_join_star" ->
      """SELECT r_name, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS revenue, count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q151_local_supplier" ->
      """SELECT n_name,
         sum(CAST(l_extendedprice AS DECIMAL(14,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1998-01-01'
         GROUP BY n_name""",
    "q05_join_broadcast" ->
      """SELECT p_brand, sum(CAST(l_extendedprice AS DECIMAL(14,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q06_semi_join" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         count(*) AS n_customers, sum(CAST(c_acctbal AS DECIMAL(14,2))) AS sum_acctbal
         FROM customer WHERE EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         GROUP BY c_nationkey""",
    "q07_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer WHERE NOT EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         GROUP BY c_mktsegment""",
    "q08_agg_stats" ->
      """SELECT o_orderpriority, count(*) AS cnt,
         sum(CAST(o_totalprice AS DECIMAL(14,2))) AS sum_price,
         CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / count(o_totalprice) AS avg_price,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
         FROM orders GROUP BY o_orderpriority""",
    "q09_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q10_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
         count(*) AS n_orders FROM orders GROUP BY o_orderstatus""",
    "q11_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q12_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         UNION
         SELECT o_custkey FROM orders WHERE o_totalprice > 100000""",
    "q13_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "q14_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q15_window_rank" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
           FROM orders) t WHERE rnk <= 3""",
    "q16_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper, lower(p_type) AS type_lower,
         CAST(length(p_name) AS BIGINT) AS name_len, substring(p_name, 1, 5) AS name_pre,
         concat_ws('|', p_brand, p_type) AS brand_type
         FROM part WHERE p_name LIKE '%gold%' OR p_size > 40""",
    "q17_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS revenue
         FROM orders GROUP BY 1, 2""",
    "q18_math_funcs" ->
      """SELECT l_orderkey, round(l_extendedprice, 0) AS price_round,
         CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
         abs(l_quantity - 25) AS qty_dev, sqrt(l_extendedprice) AS price_sqrt
         FROM lineitem WHERE l_linenumber = 1""",
    "q19_case_when" ->
      """SELECT l_returnflag,
         sum(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(14,2))
                  ELSE CAST(0 AS DECIMAL(14,2)) END) AS high_disc_rev,
         sum(CASE WHEN l_discount <= 0.05 THEN CAST(l_extendedprice AS DECIMAL(14,2))
                  ELSE CAST(0 AS DECIMAL(14,2)) END) AS low_disc_rev,
         count(CASE WHEN l_quantity > 30 THEN 1 END) AS n_bulk
         FROM lineitem GROUP BY l_returnflag""",
    "q20_having" ->
      """SELECT l_suppkey, sum(l_quantity) AS total_qty, count(*) AS n_items
         FROM lineitem GROUP BY l_suppkey HAVING sum(l_quantity) > 3000""",
    "q21_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(string_split(p_name, ' ')) AS token FROM part) t
         GROUP BY token""",
    "q22_udaf_weighted_avg" ->
      """SELECT l_returnflag,
         (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0)
           / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS w_avg_price
         FROM lineitem GROUP BY l_returnflag""",
    "q23_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""",
    "q24_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q25_subquery_avg" ->
      """SELECT o_orderpriority, count(*) AS n_above
         FROM orders o JOIN (
           SELECT o_custkey AS ck,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price
           FROM orders GROUP BY o_custkey) ca ON o.o_custkey = ca.ck
         WHERE o.o_totalprice > ca.avg_price * 1.5
         GROUP BY o_orderpriority"""
  )
}
