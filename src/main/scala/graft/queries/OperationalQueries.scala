package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.core.Money.dec

/** Round-6 widening: the operational-analytics shapes still missing after
  * the 151-query gate — the two classic TPC-H decision-support patterns
  * the suite lacked (aggregate-filtered fact re-join, chained
  * EXISTS/NOT-EXISTS on one fact table), temporal interval-overlap
  * aggregation, product growth accounting, grid-bucketed spatial radius
  * join, a categorical independence test, and ordered exponential
  * smoothing. Every query carries a DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *  - q152/q153 touch the fact table with keyed shuffles only; dims ride
  *    broadcasts;
  *  - q154's fan-out is bounded by interval SPAN (session-minutes), never
  *    corpus rows — the sweep-line (+1/−1 prefix-sum) form is the fallback
  *    when intervals are long relative to the bin;
  *  - q156 replicates only the SMALL side ×9 (neighbor cells); each big-
  *    side row probes exactly one cell — the standard spatial bucketing
  *    that turns an O(n·m) distance scan into per-cell joins;
  *  - q157 reduces the corpus to |priority|×|status| cells in one hash
  *    aggregate; all float math happens per cell AFTER exact integer
  *    counting, so results are order-independent;
  *  - q158's per-key fold is bit-deterministic: both engines fold the
  *    same (ts, event_id)-sorted list left-to-right with the same IEEE
  *    ops, so doubles match exactly at any parallelism.
  */
object OperationalQueries {

  private val dayUs = 86400000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q18 shape (large-volume orders): aggregate the fact table,
    // filter ON the aggregate, then join the survivors back to the fact's
    // parents. The scale story is the order of operations — the groupBy
    // reduces 100 TB of lineitem to one row per order BEFORE any join, the
    // HAVING prunes that to the rare heavy tail, and only then do orders
    // and the customer dim (broadcast) attach. Quantity sums stay exact
    // decimal; the output re-enters the double domain on both engines.
    "q152_big_orders" -> ((s, dir) => {
      val qty = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > lit(200))
      Tables.orders(s, dir)
        .join(qty, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"), col("qty").cast("double").as("qty"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the chained
    // EXISTS / NOT-EXISTS correlated pattern on a single fact table —
    // a supplier is "lone-late" on an order iff its line shipped >150
    // days after the order date, ANOTHER supplier participated, and NO
    // other supplier was late. Both correlations compile to keyed
    // semi/anti self-joins on l_orderkey (no correlated per-row subquery
    // execution); the participation and late sets are deduped once and
    // reused, and the supplier dim broadcasts onto the final counts.
    "q153_lone_late_supplier" -> ((s, dir) => {
      // ONE pass over lineitem: the same shuffled aggregate yields both
      // the participation set and its late subset (bool_or folds a
      // supplier's lines), instead of scanning + deduping the fact twice.
      // The persist is never unpersisted here (the returned frame is
      // lazy, so there is no in-query point where it is safe) — harness
      // loops rely on the Verify/Bench per-query clearCache, the same
      // contract as the LSH operators (Verify.scala:51).
      val pairs = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 150 DAYS"),
          lit(1L)).otherwise(lit(0L))).as("is_late"))
        // eager fill (r16 Caching.materialize charter): TWO consumers —
        // the per-order stats and the late filter — race the cold cache
        .transform(graft.core.Caching.materialize)
      // the EXISTS / NOT-EXISTS pair as ONE per-order aggregate instead
      // of a semi + anti self-join of the pair table (§2.4): a late
      // supplier is lone-late iff its order had ≥ 2 participating
      // suppliers (someone else exists) and exactly 1 late one (itself —
      // no other late supplier exists). Same rows, two fewer joins.
      val ostats = pairs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(col("is_late")).as("n_late"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1L)
      val lone = pairs.filter(col("is_late") === 1L)
        .join(ostats, Seq("l_orderkey"), "left_semi")
      lone.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
    }),

    // Temporal interval-overlap aggregation: how many sessions (and
    // distinct users) were concurrently active in each minute. Sessions
    // come from the q107 gap rule (30 min); each session then lands on
    // the minutes it SPANS via a bounded sequence/explode — fan-out is
    // session-minutes, a property of the data (span/bin ratio), not of
    // corpus size — and one hash aggregate per minute counts overlap.
    // For long intervals over fine bins the sweep-line form (+1/−1 at
    // the endpoints + q138's distributed prefix sum) replaces the
    // explode; at session/minute granularity the explode is smaller.
    "q154_interval_overlap" -> ((s, dir) => {
      val gapUs = 30L * 60 * 1000 * 1000
      val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("newb",
          when(lag(col("us"), 1).over(ord).isNull
            .or(col("us") - lag(col("us"), 1).over(ord) > gapUs), lit(1L))
            .otherwise(lit(0L)))
        .withColumn("sid", sum(col("newb")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s0"), max(col("us")).as("s1"))
      sess
        .select(col("user_id"),
          explode(sequence(expr("s0 div 60000000"), expr("s1 div 60000000")))
            .as("minute"))
        .groupBy(col("minute"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // Growth accounting (the standard DAU bridge): every active
    // (user, day) classifies as new (first day ever), retained (also
    // active the previous day), or resurrected (returning after a gap);
    // a user churns on the day AFTER their last consecutive active day.
    // One distinct shuffle builds user-days, lag/lead windows partition
    // BY USER (never global), and the day-level bridge is a tiny
    // aggregate. The identity new+retained+resurrected = DAU holds row
    // by row; churned rows may land one day past the corpus (a user's
    // final churn), which both engines emit identically.
    "q155_growth_accounting" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        // integer `div`, not Column./ (double division drifts on 16-digit µs)
        .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val cls = ud
        .withColumn("prev", lag(col("day"), 1).over(w))
        .withColumn("nxt", lead(col("day"), 1).over(w))
      val states = cls.groupBy(col("day")).agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev") === col("day") - 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("prev").isNotNull && col("prev") < col("day") - 1, 1L)
          .otherwise(0L)).as("n_resurrected"))
      val churn = cls
        .filter(col("nxt").isNull || col("nxt") > col("day") + 1)
        .select((col("day") + 1).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
      states.join(churn, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
    }),

    // Grid-bucketed spatial radius join: customers and suppliers land on
    // a 10,000² integer plane (deterministic LCG projection of their
    // keys — exact on both engines, no libm), suppliers replicate to
    // their 3×3 neighbor cells (small side only, ×9), and each customer
    // probes exactly ONE cell — the bucketing that turns an O(n·m)
    // distance scan into per-cell equi-joins. Distances stay squared
    // integers (no sqrt, no float): the R=1000 radius check and the
    // nearest-supplier min are exact. The oracle is the direct
    // distance-filtered cross form — the grid must not change answers.
    "q156_grid_radius_join" -> ((s, dir) => {
      val r = 1000L
      val cust = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 48271L % 10000L).as("x"),
        (col("c_custkey") * 69621L % 10000L).as("y"))
      val supp = Tables.supplier(s, dir).select(col("s_suppkey"),
        ((col("s_suppkey") * 48271L + 7L) % 10000L).as("sx"),
        ((col("s_suppkey") * 69621L + 11L) % 10000L).as("sy"))
      val suppCells = supp
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("s_suppkey"), col("sx"), col("sy"),
          (expr(s"sx div $r") + col("dx")).as("cx"),
          (expr(s"sy div $r") + col("dy")).as("cy"))
        .filter(col("cx") >= 0 && col("cx") < 10 && col("cy") >= 0 && col("cy") < 10)
      val d2 = (col("x") - col("sx")) * (col("x") - col("sx")) +
        (col("y") - col("sy")) * (col("y") - col("sy"))
      cust
        .withColumn("cx", expr(s"x div $r"))
        .withColumn("cy", expr(s"y div $r"))
        .join(broadcast(suppCells), Seq("cx", "cy"))
        .filter(d2 <= lit(r * r))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_near"), min(d2).as("min_d2"))
    }),

    // Chi-square test of independence (priority × status): ONE hash
    // aggregate reduces the corpus to the contingency cells; row totals,
    // column totals, and the grand total are aggregates OF THE CELLS
    // (never a second corpus pass) and broadcast back. Expected counts
    // and contributions are per-cell doubles computed from exact integer
    // products with the identical expression on both engines — no
    // cross-cell float sum, so no order sensitivity. (The statistic is
    // the sum of `contrib`; consumers fold the 15 cells however they
    // like — the per-cell form is what the driver can hash.)
    "q157_chi_square" -> ((s, dir) => {
      val obs = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_obs"))
      val rowT = obs.groupBy(col("o_orderpriority"))
        .agg(sum(col("n_obs")).as("rt"))
      val colT = obs.groupBy(col("o_orderstatus"))
        .agg(sum(col("n_obs")).as("ct"))
      val tot = obs.agg(sum(col("n_obs")).as("n"))
      val e = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
      obs
        .join(broadcast(rowT), Seq("o_orderpriority"))
        .join(broadcast(colT), Seq("o_orderstatus"))
        .crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("o_orderstatus"), col("n_obs"),
          e.as("expected"),
          ((col("n_obs").cast("double") - e) * (col("n_obs").cast("double") - e) / e)
            .as("contrib"))
    }),

    // Exponential smoothing (EWMA, α=0.2) of each user's value series —
    // the ordered-fold operator: both engines sort the user's events by
    // (ts, event_id), seed with the first value, and fold
    // acc ← 0.2·x + 0.8·acc left-to-right. Because the op sequence is
    // identical IEEE double math in identical order, the result is
    // bit-exact at any parallelism — the fold happens inside one
    // codegen'd higher-order expression per user, after one keyed
    // shuffle. State per key is the user's own series (the same bound
    // as sequence packing), never a global sort.
    // OHLC bars (open/high/low/close candles) per user-hour: the
    // standard time-series bar aggregation, reduced to ONE hash
    // aggregate — open and close are min/max of the (us, event_id,
    // value) struct (no per-bar sort window, no row_number pass), high/
    // low/n ride the same shuffle. The oracle is the row_number-extreme
    // formulation, so the struct-extreme trick is verified against the
    // classical plan. At 100 TB the bar table is |keys|×|hours| rows —
    // the aggregate is map-side combinable all the way down.
    "q161_ohlc_bars" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("hour"),
          struct(unix_micros(col("ts")).as("us"), col("event_id"),
            col("value")).as("ev"),
          col("value"))
        .groupBy(col("user_id"), col("hour"))
        .agg(min(col("ev")).as("o"), max(col("ev")).as("c"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("hour"), col("o.value").as("open"),
          col("high"), col("low"), col("c.value").as("close"),
          col("n_events"))
    }),

    // Time-weighted average (TWAP): each user's value is a step function
    // that holds between events; the average weights every value by the
    // µs it was live (the last observation carries no weight). The
    // weighted sum stays EXACT — decimal cents × integer µs — so the
    // single double division at the end is bit-identical on both
    // engines regardless of partitioning or fold order. One per-user
    // window for the lead timestamp, one hash aggregate; no global sort.
    "q162_twap" -> ((s, dir) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val stepped = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("value"))
        .withColumn("dt",
          coalesce(lead(col("us"), 1).over(ord) - col("us"), lit(0L)))
      stepped.groupBy(col("user_id"))
        .agg(sum(dec(col("value")) * col("dt")).cast("decimal(38,2)").as("sv"),
          sum(col("dt")).as("active_us"))
        .select(col("user_id"),
          when(col("active_us") === 0L, lit(null).cast("double"))
            .otherwise(col("sv").cast("double") / col("active_us").cast("double"))
            .as("twap"),
          col("active_us"))
    }),

    // Multi-touch attribution (first-touch / last-touch): every purchase
    // attributes its revenue to the first and the last touch channel
    // (view/click/signup) in the user's trailing 24 h; purchases with no
    // touch in the window attribute to 'direct'. Execution shape: ONE
    // per-user range window computes both extremes — min/max of a
    // conditional (us, event_id, channel) struct over RANGE [−24h, −1] —
    // so there is no purchases×touches self-join and no fan-out at all;
    // the channel rollup is a tiny two-sided aggregate. The oracle is
    // deliberately the OTHER formulation (interval join + row_number
    // extremes) so two independent plans must agree. Revenue sums stay
    // exact decimal until the output boundary.
    "q160_attribution" -> ((s, dir) => {
      val lookbackUs = 86400000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-lookbackUs, -1)
      val touch = when(col("event_type").isin("view", "click", "signup"),
        struct(col("us"), col("event_id"), col("event_type")))
      val attributed = ev
        .withColumn("ft", min(touch).over(w))
        .withColumn("lt", max(touch).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("value"),
          coalesce(col("ft.event_type"), lit("direct")).as("first_ch"),
          coalesce(col("lt.event_type"), lit("direct")).as("last_ch"))
      val byFirst = attributed.groupBy(col("first_ch").as("channel"))
        .agg(count(lit(1)).as("n_first"), sum(dec(col("value"))).as("rf"))
      val byLast = attributed.groupBy(col("last_ch").as("channel"))
        .agg(count(lit(1)).as("n_last"), sum(dec(col("value"))).as("rl"))
      byFirst.join(byLast, Seq("channel"), "full_outer")
        .select(col("channel"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("rf"), lit(0).cast("decimal(24,2)")).cast("double")
            .as("rev_first"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("rl"), lit(0).cast("decimal(24,2)")).cast("double")
            .as("rev_last"))
    }),

    // Two-sided CUSUM changepoint monitor per user series: fold
    // pos ← max(0, pos + x − 60) (alarm + reset when > 200) and
    // neg ← min(0, neg + x − 40) (alarm + reset when < −200) in
    // (ts, event_id) order. The per-SERIES temporal complement of q143's
    // corpus-level PSI drift: PSI says the distribution moved between
    // slices, CUSUM says WHEN a single series drifted. Same execution
    // shape as q158 — one keyed shuffle, then the whole fold runs inside
    // one higher-order expression per user with identical IEEE ops on
    // both engines (the DuckDB twin folds the same recurrence in a
    // recursive CTE — see the oracle-side comment on why it avoids
    // DuckDB's vectorized-lambda state crossover), so doubles and alarm
    // counts are bit-exact at any parallelism.
    "q159_cusum" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
            .as("ev"))
        .groupBy(col("user_id"))
        .agg(collect_list(col("ev")).as("evs"))
        .select(col("user_id"),
          size(col("evs")).cast("long").as("n_events"),
          expr("""aggregate(
              transform(sort_array(evs), e -> e.value),
              named_struct('pos', CAST(0 AS DOUBLE), 'neg', CAST(0 AS DOUBLE),
                'up', CAST(0 AS BIGINT), 'down', CAST(0 AS BIGINT)),
              (acc, x) -> named_struct(
                'pos', CASE WHEN greatest(CAST(0 AS DOUBLE),
                    acc.pos + x - CAST(60 AS DOUBLE)) > CAST(200 AS DOUBLE)
                  THEN CAST(0 AS DOUBLE)
                  ELSE greatest(CAST(0 AS DOUBLE),
                    acc.pos + x - CAST(60 AS DOUBLE)) END,
                'neg', CASE WHEN least(CAST(0 AS DOUBLE),
                    acc.neg + x - CAST(40 AS DOUBLE)) < CAST(-200 AS DOUBLE)
                  THEN CAST(0 AS DOUBLE)
                  ELSE least(CAST(0 AS DOUBLE),
                    acc.neg + x - CAST(40 AS DOUBLE)) END,
                'up', acc.up + CASE WHEN greatest(CAST(0 AS DOUBLE),
                    acc.pos + x - CAST(60 AS DOUBLE)) > CAST(200 AS DOUBLE)
                  THEN 1 ELSE 0 END,
                'down', acc.down + CASE WHEN least(CAST(0 AS DOUBLE),
                    acc.neg + x - CAST(40 AS DOUBLE)) < CAST(-200 AS DOUBLE)
                  THEN 1 ELSE 0 END))""").as("st"))
        .select(col("user_id"), col("n_events"),
          col("st.up").as("up_alarms"), col("st.down").as("down_alarms"),
          col("st.pos").as("final_pos"), col("st.neg").as("final_neg"))
    }),

    "q158_ewma" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
            .as("ev"))
        .groupBy(col("user_id"))
        .agg(collect_list(col("ev")).as("evs"))
        .select(col("user_id"),
          size(col("evs")).cast("long").as("n_events"),
          expr("""aggregate(
              slice(transform(sort_array(evs), e -> e.value), 2, size(evs) - 1),
              element_at(transform(sort_array(evs), e -> e.value), 1),
              (acc, x) -> CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc)""")
            .as("ewma"))
    }),

    // Bitemporal point-in-time lookup (operators.Bitemporal — VERDICT
    // r7 #8): the two-axis generalization of q145's SCD2 PIT join.
    // Version log from orders: each order asserts the customer's state
    // effective at its order date (valid time) but only becomes visible
    // `o_orderkey mod 4` days later (transaction time — deterministic
    // late-arrival lag). Three probe grids ask each customer's state
    // at V as known at T: same-day knowledge (recent late recordings
    // invisible), V + 45 days hindsight, and a later V. Epoch-day longs
    // everywhere; the (vt, tt, okey, cents) ordering tuple is unique
    // per key (okey is unique), so selection is deterministic. One
    // key equi-join + hash max_by — no range join, nothing quadratic.
    "q221_bitemporal_pit" -> ((s, dir) => {
      val day = "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
      val v = Tables.orders(s, dir).select(
        col("o_custkey"),
        expr(day).as("vt"),
        expr(s"$day + o_orderkey % 4").as("tt"),
        col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      import s.implicits._
      val grid = Seq(
        ("1995-06-01", "1995-06-01"),
        ("1995-06-01", "1995-07-16"),
        ("1997-03-01", "1997-03-11")).toDF("pv_d", "pt_d")
        .select(
          expr("CAST(datediff(CAST(pv_d AS DATE), DATE '1970-01-01') AS BIGINT)").as("pv"),
          expr("CAST(datediff(CAST(pt_d AS DATE), DATE '1970-01-01') AS BIGINT)").as("pt"))
      val probes = v.select(col("o_custkey")).distinct()
        .crossJoin(broadcast(grid))
      graft.operators.Bitemporal.pointInTime(
        v, keyCol = "o_custkey", validCol = "vt", txCol = "tt",
        valueCols = Seq("okey", "cents"),
        probes = probes, pvCol = "pv", ptCol = "pt")
    }),

    // Bitemporal timeline reconstruction (Bitemporal.timelineAsOf):
    // the OTHER face of q221's log — rebuild the full valid-time SCD2
    // dimension as the system knew it on 1996-01-01. Latest recording
    // per (key, valid day) wins; intervals close at the key's next
    // effective valid day (null = still open). Hash max_by + one
    // per-key lead window, nothing global.
    "q227_bitemporal_timeline" -> ((s, dir) => {
      val day = "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
      val v = Tables.orders(s, dir).select(
        col("o_custkey"),
        expr(day).as("vt"),
        expr(s"$day + o_orderkey % 4").as("tt"),
        col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val asOf = expr(
        "CAST(datediff(DATE '1996-01-01', DATE '1970-01-01') AS BIGINT)")
      graft.operators.Bitemporal.timelineAsOf(
        v, keyCol = "o_custkey", validCol = "vt", txCol = "tt",
        valueCols = Seq("okey", "cents"), asOf = asOf)
    }),

    // Gaps-and-islands (activity streaks): the classic run-detection
    // shape — consecutive active DAYS group under the constant
    // day − row_number() key inside a per-user window (partitioned,
    // never global), islands collapse in one hash agg, and the per-user
    // streak profile (total active days, streak count, longest run) in
    // a second. Corpus touches one distinct + two aggs; all longs.
    "q230_activity_streaks" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val islands = ud
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
      islands.groupBy(col("user_id"))
        .agg(sum(col("len")).as("active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"))
    }),

    // k-anonymity / l-diversity audit — the release gate a dataset
    // passes before leaving the pipeline: rows grouped by their
    // quasi-identifier tuple (nation × coarse balance band), each
    // group's size (k) and distinct-sensitive-value count (l, segment
    // here) computed in ONE hash agg over the corpus, then collapsed to
    // the one-row risk summary (groups/rows below k=5, minimum k and l,
    // re-identification share as a single division). All integer until
    // the final ratio.
    "q231_k_anonymity" -> ((s, dir) => {
      val groups = Tables.customer(s, dir)
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"),
          col("c_mktsegment"))
        .groupBy(col("c_nationkey"), col("bal_band"))
        .agg(count(lit(1)).as("k"),
          countDistinct(col("c_mktsegment")).as("l"))
      groups.agg(
          count(lit(1)).as("n_groups"),
          sum(col("k")).as("n_rows"),
          min(col("k")).as("min_k"),
          min(col("l")).as("min_l"),
          sum(when(col("k") < 5, 1L).otherwise(0L)).as("groups_below_k5"),
          sum(when(col("k") < 5, col("k")).otherwise(0L)).as("rows_below_k5"))
        .select(col("n_groups"), col("n_rows"), col("min_k"), col("min_l"),
          col("groups_below_k5"), col("rows_below_k5"),
          (col("rows_below_k5").cast("double") / col("n_rows").cast("double"))
            .as("risk_share"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q152_big_orders" ->
      """WITH q AS (
           SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(14,2))) AS qty
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(l_quantity AS DECIMAL(14,2))) > 200)
         SELECT c_name, o_custkey, o_orderkey, o_totalprice,
           CAST(qty AS DOUBLE) AS qty
         FROM orders JOIN q ON o_orderkey = q.l_orderkey
         JOIN customer ON o_custkey = c_custkey""",
    "q153_lone_late_supplier" ->
      """WITH part AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         late AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE l.l_shipdate > o.o_orderdate + INTERVAL 150 DAY),
         lone AS (SELECT lt.l_orderkey, lt.l_suppkey FROM late lt
           WHERE EXISTS (SELECT 1 FROM part p
             WHERE p.l_orderkey = lt.l_orderkey AND p.l_suppkey <> lt.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM late o2
             WHERE o2.l_orderkey = lt.l_orderkey AND o2.l_suppkey <> lt.l_suppkey))
         SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM lone JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name""",
    "q154_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         m AS (SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
               THEN 1 ELSE 0 END AS nb
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         sx AS (SELECT user_id, us,
             sum(nb) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid
           FROM m),
         sess AS (SELECT user_id, sid, min(us) AS s0, max(us) AS s1
           FROM sx GROUP BY 1, 2),
         mins AS (SELECT user_id,
             unnest(generate_series(s0 // 60000000, s1 // 60000000)) AS minute
           FROM sess)
         SELECT minute, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM mins GROUP BY minute""",
    "q155_growth_accounting" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day FROM events),
         cls AS (SELECT user_id, day,
             lag(day) OVER w AS prev, lead(day) OVER w AS nxt
           FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         states AS (SELECT day,
             CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
             CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day - 1
               THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
           FROM cls GROUP BY day),
         churn AS (SELECT day + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
           FROM cls WHERE nxt IS NULL OR nxt > day + 1 GROUP BY day + 1)
         SELECT COALESCE(s.day, c.day) AS day,
           COALESCE(n_new, 0) AS n_new,
           COALESCE(n_retained, 0) AS n_retained,
           COALESCE(n_resurrected, 0) AS n_resurrected,
           COALESCE(n_churned, 0) AS n_churned
         FROM states s FULL OUTER JOIN churn c ON s.day = c.day""",
    "q156_grid_radius_join" ->
      """WITH c AS (SELECT c_custkey,
             c_custkey * 48271 % 10000 AS x, c_custkey * 69621 % 10000 AS y
           FROM customer),
         s AS (SELECT s_suppkey,
             (s_suppkey * 48271 + 7) % 10000 AS sx,
             (s_suppkey * 69621 + 11) % 10000 AS sy
           FROM supplier)
         SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_near,
           CAST(min((x-sx)*(x-sx) + (y-sy)*(y-sy)) AS BIGINT) AS min_d2
         FROM c, s
         WHERE (x-sx)*(x-sx) + (y-sy)*(y-sy) <= 1000000
         GROUP BY c_custkey""",
    "q157_chi_square" ->
      """WITH obs AS (SELECT o_orderpriority, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_obs
           FROM orders GROUP BY 1, 2),
         rt AS (SELECT o_orderpriority, sum(n_obs) AS rt FROM obs GROUP BY 1),
         ct AS (SELECT o_orderstatus, sum(n_obs) AS ct FROM obs GROUP BY 1),
         tot AS (SELECT sum(n_obs) AS n FROM obs)
         SELECT o_orderpriority, o_orderstatus, n_obs,
           CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           (CAST(n_obs AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n_obs AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS contrib
         FROM obs JOIN rt USING (o_orderpriority) JOIN ct USING (o_orderstatus),
           tot""",
    "q161_ohlc_bars" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, value,
             epoch_us(ts) // 3600000000 AS hour FROM events),
         r AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, hour
               ORDER BY us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, hour
               ORDER BY us DESC, event_id DESC) AS rn_d
           FROM e),
         o AS (SELECT user_id, hour, value AS open FROM r WHERE rn_a = 1),
         c AS (SELECT user_id, hour, value AS close FROM r WHERE rn_d = 1),
         hl AS (SELECT user_id, hour, max(value) AS high, min(value) AS low,
             CAST(count(*) AS BIGINT) AS n_events
           FROM e GROUP BY 1, 2)
         SELECT user_id, hour, open, high, low, close, n_events
         FROM hl JOIN o USING (user_id, hour) JOIN c USING (user_id, hour)""",
    "q162_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, value
           FROM events),
         st AS (SELECT user_id, value,
             COALESCE(lead(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) - us, 0) AS dt
           FROM e),
         agg AS (SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * dt) AS DECIMAL(38,2)) AS sv,
             CAST(sum(dt) AS BIGINT) AS active_us
           FROM st GROUP BY user_id)
         SELECT user_id,
           CASE WHEN active_us = 0 THEN NULL
             -- VARCHAR-routed cast: DuckDB's int128->double is not
             -- correctly rounded (the q95/q131 lesson); strtod is
             ELSE CAST(CAST(sv AS VARCHAR) AS DOUBLE)
               / CAST(active_us AS DOUBLE) END AS twap,
           active_us
         FROM agg""",
    "q160_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             value FROM events),
         p AS (SELECT user_id, us, event_id AS pid, value FROM e
           WHERE event_type = 'purchase'),
         t AS (SELECT user_id, us AS tus, event_id AS tid, event_type AS ch
           FROM e WHERE event_type IN ('view', 'click', 'signup')),
         j AS (SELECT p.user_id, p.pid, p.value, t.ch, t.tus, t.tid
           FROM p LEFT JOIN t ON p.user_id = t.user_id
             AND t.tus BETWEEN p.us - 86400000000 AND p.us - 1),
         r AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, pid
               ORDER BY tus NULLS LAST, tid) AS rf,
             row_number() OVER (PARTITION BY user_id, pid
               ORDER BY tus DESC NULLS LAST, tid DESC) AS rl
           FROM j),
         fx AS (SELECT COALESCE(ch, 'direct') AS channel, value FROM r
           WHERE rf = 1),
         lx AS (SELECT COALESCE(ch, 'direct') AS channel, value FROM r
           WHERE rl = 1),
         fa AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_first,
             sum(CAST(value AS DECIMAL(14,2))) AS rf FROM fx GROUP BY 1),
         la AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_last,
             sum(CAST(value AS DECIMAL(14,2))) AS rl FROM lx GROUP BY 1)
         SELECT COALESCE(fa.channel, la.channel) AS channel,
           COALESCE(n_first, 0) AS n_first,
           CAST(COALESCE(rf, 0) AS DOUBLE) AS rev_first,
           COALESCE(n_last, 0) AS n_last,
           CAST(COALESCE(rl, 0) AS DOUBLE) AS rev_last
         FROM fa FULL OUTER JOIN la ON fa.channel = la.channel""",
    // The oracle walks the fold as a RECURSIVE CTE (one step per event
    // rank) rather than a list_reduce lambda: DuckDB 1.0's vectorized
    // lambda execution returns DIFFERENT results for a group depending
    // on which other rows share its vector (user 62 folded alone vs in
    // the full table diverged) — the recursive join has plain scalar
    // semantics and matches an imperative reference fold on every user.
    "q159_cusum" ->
      """WITH RECURSIVE e AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         counts AS (SELECT user_id, max(rn) AS n FROM e GROUP BY 1),
         walk AS (
           SELECT user_id, 0 AS rn, CAST(0 AS DOUBLE) AS pos,
             CAST(0 AS DOUBLE) AS neg,
             CAST(0 AS BIGINT) AS up, CAST(0 AS BIGINT) AS down
           FROM counts
           UNION ALL
           SELECT w.user_id, w.rn + 1,
             CASE WHEN greatest(CAST(0 AS DOUBLE),
                 w.pos + e.value - CAST(60 AS DOUBLE)) > CAST(200 AS DOUBLE)
               THEN CAST(0 AS DOUBLE)
               ELSE greatest(CAST(0 AS DOUBLE),
                 w.pos + e.value - CAST(60 AS DOUBLE)) END,
             CASE WHEN least(CAST(0 AS DOUBLE),
                 w.neg + e.value - CAST(40 AS DOUBLE)) < CAST(-200 AS DOUBLE)
               THEN CAST(0 AS DOUBLE)
               ELSE least(CAST(0 AS DOUBLE),
                 w.neg + e.value - CAST(40 AS DOUBLE)) END,
             w.up + CASE WHEN greatest(CAST(0 AS DOUBLE),
                 w.pos + e.value - CAST(60 AS DOUBLE)) > CAST(200 AS DOUBLE)
               THEN 1 ELSE 0 END,
             w.down + CASE WHEN least(CAST(0 AS DOUBLE),
                 w.neg + e.value - CAST(40 AS DOUBLE)) < CAST(-200 AS DOUBLE)
               THEN 1 ELSE 0 END
           FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
         SELECT w.user_id, CAST(c.n AS BIGINT) AS n_events,
           up AS up_alarms, down AS down_alarms,
           pos AS final_pos, neg AS final_neg
         FROM walk w JOIN counts c ON w.user_id = c.user_id AND w.rn = c.n""",
    // Recursive-CTE walk for the same reason as q159: DuckDB 1.0's
    // vectorized list_reduce can cross groups' state between vector
    // lanes; the recursive join is scalar-per-step and immune.
    "q158_ewma" ->
      """WITH RECURSIVE e AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         counts AS (SELECT user_id, max(rn) AS n FROM e GROUP BY 1),
         walk AS (
           SELECT user_id, 1 AS rn, value AS ewma FROM e WHERE rn = 1
           UNION ALL
           SELECT w.user_id, w.rn + 1,
             CAST(0.2 AS DOUBLE) * e.value + CAST(0.8 AS DOUBLE) * w.ewma
           FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
         SELECT w.user_id, CAST(c.n AS BIGINT) AS n_events, ewma
         FROM walk w JOIN counts c ON w.user_id = c.user_id AND w.rn = c.n""",
    "q221_bitemporal_pit" ->
      """WITH v AS (
           SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS vt,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + o_orderkey % 4 AS BIGINT) AS tt,
             CAST(o_orderkey AS BIGINT) AS okey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         grid AS (SELECT
             CAST(datediff('day', DATE '1970-01-01', CAST(pv_d AS DATE)) AS BIGINT) AS pv,
             CAST(datediff('day', DATE '1970-01-01', CAST(pt_d AS DATE)) AS BIGINT) AS pt
           FROM (VALUES (DATE '1995-06-01', DATE '1995-06-01'),
                        (DATE '1995-06-01', DATE '1995-07-16'),
                        (DATE '1997-03-01', DATE '1997-03-11')) AS g(pv_d, pt_d)),
         probes AS (SELECT DISTINCT o_custkey FROM v),
         j AS (
           SELECT p.o_custkey, g.pv, g.pt, v.vt, v.tt, v.okey, v.cents
           FROM probes p CROSS JOIN grid g
           JOIN v ON v.o_custkey = p.o_custkey
             AND v.vt <= g.pv AND v.tt <= g.pt)
         SELECT o_custkey, pv, pt, vt, tt, okey, cents
         FROM j
         QUALIFY row_number() OVER (PARTITION BY o_custkey, pv, pt
           ORDER BY vt DESC, tt DESC, okey DESC, cents DESC) = 1""",
    "q227_bitemporal_timeline" ->
      """WITH v AS (
           SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS vt,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + o_orderkey % 4 AS BIGINT) AS tt,
             CAST(o_orderkey AS BIGINT) AS okey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         vis AS (SELECT * FROM v
           WHERE tt <= CAST(datediff('day', DATE '1970-01-01', DATE '1996-01-01') AS BIGINT)),
         latest AS (
           SELECT o_custkey, vt, tt, okey, cents FROM vis
           QUALIFY row_number() OVER (PARTITION BY o_custkey, vt
             ORDER BY tt DESC, okey DESC, cents DESC) = 1)
         SELECT o_custkey, vt, tt, okey, cents,
           lead(vt) OVER (PARTITION BY o_custkey ORDER BY vt) AS valid_to
         FROM latest""",
    "q230_activity_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day FROM events),
         g AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
           FROM ud),
         isl AS (SELECT user_id, grp, count(*) AS len
           FROM g GROUP BY 1, 2)
         SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
         FROM isl GROUP BY 1""",
    "q231_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             count(*) AS k,
             count(DISTINCT c_mktsegment) AS l
           FROM customer GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k5,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS rows_below_k5,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
             / CAST(sum(k) AS DOUBLE) AS risk_share
         FROM g"""
  )
}
