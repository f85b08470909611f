package graft.windowing

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Duration helper mirroring the reference's `Time` value type
  * (FlinkDotNet.Core.Abstractions/Common/Time.cs:8-56) — ms-precision
  * durations constructed via named factories.
  */
final case class Time(millis: Long) {
  require(millis > 0, "duration must be positive")
  /** Spark interval string. */
  def asInterval: String = s"$millis milliseconds"
}
object Time {
  def milliseconds(ms: Long): Time = Time(ms)
  def seconds(s: Long): Time = Time(s * 1000L)
  def minutes(m: Long): Time = Time(m * 60000L)
  def hours(h: Long): Time = Time(h * 3600000L)
  def days(d: Long): Time = Time(d * 86400000L)
}

/** Window assigner surface mirroring the reference's
  * `IWindowAssigner` hierarchy (Core.Api/Windowing/WindowAssigner.cs:36-64,
  * TumblingEventTimeWindows.cs, SlidingEventTimeWindows.cs,
  * GlobalWindows.cs; session windows are named-but-unimplemented there —
  * we implement them, Spark has `session_window` natively).
  *
  * Instead of assigning elements to window objects per record (the
  * reference's `AssignWindows`, TumblingEventTimeWindows.cs:56-67), an
  * assigner here produces the Catalyst grouping expression — Spark's
  * `TimeWindow` expression applies the identical epoch-aligned start
  * formula `ts - (ts - offset + size) % size` (TimeWindow.cs:76-89)
  * inside whole-stage codegen, so assignment never materializes
  * per-element window lists. Works identically for batch DataFrames and
  * Structured Streaming (where it pairs with `withWatermark`).
  */
sealed trait WindowAssigner extends Serializable {
  /** Grouping column over the event-time column; null for global windows. */
  def groupingColumn(ts: Column): Option[Column]
  def isEventTime: Boolean = true
}

final case class TumblingEventTimeWindows(size: Time, offset: Option[Time] = None)
    extends WindowAssigner {
  override def groupingColumn(ts: Column): Option[Column] =
    Some(offset.fold(window(ts, size.asInterval)) { o =>
      window(ts, size.asInterval, size.asInterval, o.asInterval)
    })
}
object TumblingEventTimeWindows {
  def of(size: Time): TumblingEventTimeWindows = TumblingEventTimeWindows(size)
  def of(size: Time, offset: Time): TumblingEventTimeWindows =
    TumblingEventTimeWindows(size, Some(offset))
}

final case class SlidingEventTimeWindows(size: Time, slide: Time) extends WindowAssigner {
  override def groupingColumn(ts: Column): Option[Column] =
    Some(window(ts, size.asInterval, slide.asInterval))
}
object SlidingEventTimeWindows {
  def of(size: Time, slide: Time): SlidingEventTimeWindows =
    SlidingEventTimeWindows(size, slide)
}

/** Session windows: gap-merged per key. The reference only plumbed the
  * merge hooks (Trigger.OnMerge, TimeWindow.Intersects/Cover) without an
  * assigner; Spark's `session_window` provides the full semantics.
  */
final case class EventTimeSessionWindows(gap: Time) extends WindowAssigner {
  override def groupingColumn(ts: Column): Option[Column] =
    Some(session_window(ts, gap.asInterval))
}
object EventTimeSessionWindows {
  def withGap(gap: Time): EventTimeSessionWindows = EventTimeSessionWindows(gap)
}

/** Everything in one window per key (GlobalWindows.cs:10-64). In batch
  * this is a plain keyed aggregate; in streaming it corresponds to
  * update/complete-mode keyed aggregation without a time bucket.
  */
case object GlobalWindows extends WindowAssigner {
  override def groupingColumn(ts: Column): Option[Column] = None
  override def isEventTime: Boolean = false
  def create(): GlobalWindows.type = this
}
