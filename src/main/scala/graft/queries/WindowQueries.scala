package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Money.{dec, sum38, sumDec, sumDecFast}
import graft.windowing._

/** Event-time windowing surface (SURVEY §2.6): tumbling / sliding / session /
  * global assigners over the `events` fixture, each verified against a DuckDB
  * oracle that re-derives window assignment from raw epoch arithmetic — i.e.
  * the oracle independently implements the reference's epoch-aligned start
  * formula `ts - (ts - offset + size) % size` (TimeWindow.cs:76-89) rather
  * than trusting Spark's `window()`.
  *
  * Scale notes: `window()`/`session_window()` are grouping expressions inside
  * whole-stage codegen — assignment never materializes per-element window
  * lists, and the aggregate is a standard partial+final HashAggregate, so the
  * pattern holds at 100 TB (one shuffle on the (window,key) grouping key).
  * Session windows additionally sort-merge per key, which Spark handles with
  * spillable sort — no unbounded state in batch mode.
  */
object WindowQueries {

  private def events(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private def winStart(w: Column): Column = unix_millis(w.getField("start"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-day windows × event_type (TumblingEventTimeWindows.cs:56-67).
    "q26_window_tumbling" -> ((s, dir) => {
      val w = TumblingEventTimeWindows.of(Time.days(1)).groupingColumn(col("ts")).get
      events(s, dir)
        .groupBy(w.as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumDecFast(col("value")).as("sum_value"))
        .select(winStart(col("w")).as("w_start"), col("event_type"), col("n"), col("sum_value"))
    }),

    // Sliding windows, size 2h / slide 1h: every event lands in exactly two
    // windows (SlidingEventTimeWindows.cs:28-37).
    "q27_window_sliding" -> ((s, dir) => {
      val w = SlidingEventTimeWindows.of(Time.hours(2), Time.hours(1)).groupingColumn(col("ts")).get
      events(s, dir)
        .groupBy(w.as("w"))
        .agg(count(lit(1)).as("n"), sumDecFast(col("value")).as("sum_value"))
        .select(winStart(col("w")).as("w_start"), col("n"), col("sum_value"))
    }),

    // Session windows with a 30-minute gap per user. The reference only
    // plumbed merge hooks (Trigger.OnMerge, TimeWindow.Intersects/Cover);
    // session_window() supplies the full gap-merge semantics.
    "q28_window_session" -> ((s, dir) => {
      val w = EventTimeSessionWindows.withGap(Time.minutes(30)).groupingColumn(col("ts")).get
      events(s, dir)
        .groupBy(w.as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), sumDecFast(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          unix_micros(col("w.start")).as("sess_start_us"),
          unix_micros(col("w.end")).as("sess_end_us"),
          col("n"), col("sum_value"))
    }),

    // Global window = keyed aggregate without a time bucket
    // (GlobalWindows.cs:10-64; batch equivalent of complete-mode agg).
    "q29_window_global" -> ((s, dir) => {
      // require, not assert: assert elides under the JVM default
      // (-da) and the contract check would silently never run
      require(GlobalWindows.create().groupingColumn(col("ts")).isEmpty)
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
             sumDecFast(col("value")).as("sum_value"),
             unix_micros(min(col("ts"))).as("first_us"),
             unix_micros(max(col("ts"))).as("last_us"))
    }),

    // Tumbling with a non-zero offset (TumblingEventTimeWindows.cs:29-54
    // `offset` ctor arg): 1h windows aligned to :15.
    "q30_window_offset" -> ((s, dir) => {
      val w = TumblingEventTimeWindows.of(Time.hours(1), Time.minutes(15))
        .groupingColumn(col("ts")).get
      events(s, dir)
        .groupBy(w.as("w"))
        .agg(count(lit(1)).as("n"), sumDecFast(col("value")).as("sum_value"))
        .select(winStart(col("w")).as("w_start"), col("n"), col("sum_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q26_window_tumbling" ->
      """SELECT (epoch_ms(ts) // 86400000) * 86400000 AS w_start, event_type,
         count(*) AS n, sum(CAST(value AS DECIMAL(14,2))) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q27_window_sliding" ->
      """SELECT CAST((epoch_ms(ts) // 3600000 - k) * 3600000 AS BIGINT) AS w_start,
         count(*) AS n, sum(CAST(value AS DECIMAL(14,2))) AS sum_value
         FROM events, (SELECT unnest(generate_series(0, 1)) AS k) ks
         WHERE epoch_ms(ts) >= (epoch_ms(ts) // 3600000 - k) * 3600000
           AND epoch_ms(ts) <  (epoch_ms(ts) // 3600000 - k) * 3600000 + 7200000
         GROUP BY 1""",
    "q28_window_session" ->
      """WITH e AS (
           SELECT user_id, value, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) >= 1800000000
                  OR lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
             THEN 1 ELSE 0 END AS new_sess
           FROM events),
         s AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
             ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM e)
         SELECT user_id, min(us) AS sess_start_us,
           max(us) + 1800000000 AS sess_end_us,
           count(*) AS n, sum(CAST(value AS DECIMAL(14,2))) AS sum_value
         FROM s GROUP BY user_id, sess_id""",
    "q29_window_global" ->
      """SELECT user_id, count(*) AS n, sum(CAST(value AS DECIMAL(14,2))) AS sum_value,
         min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
         FROM events GROUP BY user_id""",
    "q30_window_offset" ->
      """SELECT ((epoch_ms(ts) - 900000) // 3600000) * 3600000 + 900000 AS w_start,
         count(*) AS n, sum(CAST(value AS DECIMAL(14,2))) AS sum_value
         FROM events GROUP BY 1"""
  )
}
