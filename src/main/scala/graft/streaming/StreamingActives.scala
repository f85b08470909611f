package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of q134's DAU: distinct active users per event-time
  * day on an unbounded stream, with BOUNDED state — the daily-actives
  * counter every product-metrics pipeline runs continuously.
  *
  * Two chained stateful operators, both watermark-evicting:
  * `dropDuplicatesWithinWatermark` on (user, day) holds each key only
  * until the watermark passes its event time plus the delay (a plain
  * `dropDuplicates` would hold every user-day ever seen), then a 1-day
  * tumbling window count emits each day exactly once in append mode as
  * the watermark closes it. State is bounded by the disorder window,
  * not stream history.
  *
  * Exactness contract (spec-verified): with arrival disorder bounded by
  * `delay`, a duplicate (user, day) always arrives before the watermark
  * evicts the first occurrence — eviction needs the watermark past
  * first-seen + delay, and any same-day duplicate's timestamp is within
  * a day of first-seen — so the counts equal the batch q134 dau column
  * exactly on replay.
  */
object StreamingActives {

  /** events: needs `user_id` and event-time `ts`. Returns (day_ms, dau)
    * rows emitted when the watermark closes each day.
    */
  def dau(events: DataFrame, delay: String = "1 day"): DataFrame =
    events
      .select(col("user_id"), col("ts"),
        date_trunc("day", col("ts")).as("day"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(unix_millis(col("window.start")).as("day_ms"), col("dau"))
}
