package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

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

  /** Streaming face of q134's 7-day WAU (VERDICT r7 #8): exact windowed
    * DISTINCT users with O(1) state per user.
    *
    * A sliding distinct does not decompose into daily counts (the same
    * user counts once per window), and holding per-window user sets is
    * unbounded. The delta trick makes it exact with ONE LONG of state
    * per user — the last active day: a user whose active-day set is D
    * contributes to the window ending at w iff D ∩ [w−6, w] ≠ ∅, so
    * when a NEW active day d arrives in per-user ascending order (prev
    * = previous last day), the windows the user newly starts covering
    * are exactly w ∈ [max(d, prev+7), d+6] — every earlier window in
    * [d, d+6] was already covered by prev (prev ≥ w−6 there). Emitting
    * one (wday, +1) unit per newly covered window makes
    * Σ_users deltas(w) = |{users : D ∩ [w−6, w] ≠ ∅}| = exact WAU(w):
    * each user counts exactly once per covered window, by construction
    * of the delta ranges being disjoint across that user's days. A
    * downstream (streaming or batch) sum per wday — a plain mergeable
    * counter, no distinct — yields the q134 wau column; trailing
    * windows whose source days haven't all arrived are the stream's
    * usual incomplete tail (batch q134 clamps them with its dau join).
    *
    * Same in-order/replay contract as StreamingRollingMedian: days must
    * arrive per-user ascending (feed from a watermarked daily dedup);
    * a day at or behind the frontier is dropped without emission, so
    * deltas are emitted exactly once under replay.
    */
  def wauDeltas(byUser: KeyValueGroupedDataset[Long, Long], window: Int = 7)(
      implicit stEnc: Encoder[Long],
      outEnc: Encoder[(Long, Long)]): Dataset[(Long, Long)] = {
    val processor = new StatefulProcessor[Long, Long, (Long, Long)] {
      @transient private var lastDay: ValueState[Long] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        lastDay = getHandle.getValueState[Long]("lastDay", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[Long],
                                   timers: TimerValues): Iterator[(Long, Long)] = {
        var prev = if (lastDay.exists()) lastDay.get() else Long.MinValue
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        rows.toSeq.distinct.sorted.foreach { d =>
          if (d > prev) { // frontier: replays/late days emit nothing
            val from = if (prev == Long.MinValue) d
                       else math.max(d, prev + window)
            var w = from
            while (w <= d + window - 1) { out += ((w, 1L)); w += 1 }
            prev = d
          }
        }
        lastDay.update(prev)
        out.iterator
      }
    }
    byUser.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
