package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.datastream._
import graft.operators.AggregateFunction
import graft.table.TableEnvironment
import graft.windowing._

/** Typed event record for the DataStream surface (ts normalized to µs
  * TimestampType by Tables.events).
  */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double, props: String)

/** Typed rows for the two-input join surface (IJoinFunction). */
final case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String)
final case class CustomerRow(c_custkey: Long, c_mktsegment: String)

/** Oracle-checked queries exercised THROUGH the typed DataStream / Table
  * APIs (SURVEY §2.2, §2.3, §2.6 typed path, §2.10) rather than the Column
  * DSL — proving the fluent surface produces correct distributed plans.
  */
object DataStreamQueries {

  private def eventStream(s: SparkSession, dir: String): DataStream[Event] = {
    import s.implicits._
    StreamExecutionEnvironment(s).fromDataset(Tables.events(s, dir).as[Event])
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // keyBy + reduce (IReduceOperator): per-user value totals, computed by
    // pairwise record combination exactly as the reference reduces. The
    // emitted sum is rounded to cents: the true total of 2-dp values IS a
    // 2-dp decimal, the double drift from reduction order is ~1e-10 —
    // far below a half-cent — so rounding recovers the exact decimal on
    // any engine and any reduction tree (the q47 lesson, typed edition).
    "q31_ds_keyby_reduce" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir)
        .keyBy(_.user_id)
        .reduce((a, b) => a.copy(value = a.value + b.value))
        .map { case (k, e) => (k, math.round(e.value * 100) / 100.0) }
        .ds.toDF("user_id", "sum_value")
    }),

    // map + filter + flatMap (IMapOperator/IFilterOperator/IFlatMapOperator):
    // token counts over documents through the typed path.
    "q32_ds_flatmap_tokens" -> ((s, dir) => {
      import s.implicits._
      StreamExecutionEnvironment(s)
        .fromDataset(Tables.documents(s, dir).select("text").as[String])
        .flatMap(_.split("\\s+").toSeq)
        .filter(_.nonEmpty)
        .map(t => (t, 1L))
        .keyBy(_._1)
        .reduce((a, b) => (a._1, a._2 + b._2))
        .map { case (tok, (_, n)) => (tok, n) }
        .ds.toDF("token", "n")
    }),

    // Typed tumbling window + IAggregateOperator via window().process-free
    // path: daily per-user event counts and sums computed with the typed
    // window assignment arithmetic (TimeWindow.cs formula), not window().
    "q33_ds_window_reduce" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir)
        .keyBy(_.user_id)
        .window(TumblingEventTimeWindows.of(Time.days(1)), _.ts.getTime)
        .reduce((a, b) => a.copy(value = a.value + b.value))
        .map { case (uid, wStart, e) =>
          (uid, wStart, math.round(e.value * 100) / 100.0) } // cents-exact
        .ds.toDF("user_id", "w_start", "sum_value")
    }),

    // ProcessWindowFunction over session windows (IProcessWindowFunction):
    // full-pane iteration with window metadata.
    "q34_ds_process_session" -> ((s, dir) => {
      import s.implicits._
      val fn = new ProcessWindowFunction[Long, Event, (Long, Long, Long, Double)] {
        def process(key: Long, w: TimeWindow, elements: Iterator[Event]) = {
          var n = 0L; var sum = 0.0
          elements.foreach { e => n += 1; sum += e.value }
          Seq((key, w.start, n, math.round(sum * 100) / 100.0)) // cents-exact
        }
      }
      eventStream(s, dir)
        .keyBy(_.user_id)
        .window(EventTimeSessionWindows.withGap(Time.minutes(30)), _.ts.getTime)
        .process(fn)
        .ds.toDF("user_id", "sess_start_ms", "n", "sum_value")
    }),

    // Typed AggregateFunction on a keyed stream (IAggregateOperator
    // zero/add/merge/finish): weighted average of value by event count.
    "q35_ds_keyed_aggregate" -> ((s, dir) => {
      import s.implicits._
      // cents-Long accumulator: summation is exact and order-independent
      // (2-dp inputs), so the final division is deterministic on any
      // partial/merge tree — same zero/add/merge/finish contract
      val avgAgg = new AggregateFunction[Event, (Long, Long), Double] {
        def createAccumulator() = (0L, 0L)
        def add(acc: (Long, Long), e: Event) =
          (acc._1 + math.round(e.value * 100), acc._2 + 1)
        def getResult(acc: (Long, Long)) =
          if (acc._2 == 0) 0.0 else (acc._1.toDouble / 100.0) / acc._2.toDouble
        def merge(a: (Long, Long), b: (Long, Long)) = (a._1 + b._1, a._2 + b._2)
      }
      eventStream(s, dir)
        .keyBy(_.event_type)
        .aggregate(avgAgg)
        .ds.toDF("event_type", "avg_value")
    }),

    // Typed two-input join (IJoinFunction.cs:18-27): key extractors on
    // each side, a combiner lambda per matched pair. The physical join is
    // still Catalyst's choice (broadcast here — customer is a dim).
    "q62_ds_typed_join" -> ((s, dir) => {
      import s.implicits._
      val orders = StreamExecutionEnvironment(s).fromDataset(
        Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderstatus").as[OrderRow])
      val customers = StreamExecutionEnvironment(s).fromDataset(
        Tables.customer(s, dir).select("c_custkey", "c_mktsegment").as[CustomerRow])
      orders.join(customers)(_.o_custkey, _.c_custkey) {
        (o, c) => (o.o_orderkey, c.c_mktsegment, o.o_orderstatus)
      }.ds.toDF("o_orderkey", "c_mktsegment", "o_orderstatus")
    }),

    // Table API: register fixture tables, run SQL through the environment.
    "q36_sql_tableenv" -> ((s, dir) => {
      val env = TableEnvironment.create(s)
      env.registerTable("g_orders", Tables.orders(s, dir))
      env.registerTable("g_customer", Tables.customer(s, dir))
      env.sqlQuery(
        """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS revenue
           FROM g_orders JOIN g_customer ON o_custkey = c_custkey
           WHERE o_totalprice > 50000
           GROUP BY c_mktsegment, o_orderstatus""")
    })
  )

  val oracles: Map[String, String] = Map(
    "q31_ds_keyby_reduce" ->
      """SELECT user_id, CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY user_id""",
    "q32_ds_flatmap_tokens" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents) t
         WHERE token <> '' GROUP BY token""",
    "q33_ds_window_reduce" ->
      """SELECT user_id, (epoch_ms(ts) // 86400000) * 86400000 AS w_start,
         CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    // Session semantics identical to q28 but through the typed path, at ms
    // precision (the typed extractor uses Timestamp.getTime = epoch ms).
    "q34_ds_process_session" ->
      """WITH e AS (
           SELECT user_id, value, epoch_ms(ts) AS ms,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) >= 1800000
                  OR lag(epoch_ms(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) IS NULL
             THEN 1 ELSE 0 END AS new_sess
           FROM events),
         s AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
             ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM e)
         SELECT user_id, min(ms) AS sess_start_ms,
           count(*) AS n, CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, sess_id""",
    "q35_ds_keyed_aggregate" ->
      """SELECT event_type,
         (CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0)
           / CAST(count(*) AS DOUBLE) AS avg_value
         FROM events GROUP BY event_type""",
    "q62_ds_typed_join" ->
      """SELECT o_orderkey, c_mktsegment, o_orderstatus
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "q36_sql_tableenv" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(14,2))) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 50000
         GROUP BY c_mktsegment, o_orderstatus"""
  )
}
