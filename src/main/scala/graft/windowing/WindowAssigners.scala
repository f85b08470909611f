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
trait WindowAssigner extends Serializable {
  /** Grouping column over the event-time column; null for global windows.
    * Built-ins map onto Spark's codegen'd `window`/`session_window`
    * expressions; custom assigners may return None and rely on the typed
    * path's `assignWindows`.
    */
  def groupingColumn(ts: Column): Option[Column]

  /** The open per-element assignment contract (the reference's
    * `AssignWindows`, WindowAssigner.cs:36-64): every window (start, end)
    * an element with timestamp `ts` belongs to. User-defined assigners
    * subclass WindowAssigner and implement only this — the typed
    * `WindowedStream` path groups on the returned (start, end) pairs
    * directly, so no DataStream code needs to know the assigner. Session
    * assigners return the pre-merge point window `[ts, ts+gap)`; merging
    * is the windowed operator's job, as in the reference.
    */
  def assignWindows(ts: Long): Seq[TimeWindow]

  def isEventTime: Boolean = true
}

final case class TumblingEventTimeWindows(size: Time, offset: Option[Time] = None)
    extends WindowAssigner {
  override def groupingColumn(ts: Column): Option[Column] =
    Some(offset.fold(window(ts, size.asInterval)) { o =>
      window(ts, size.asInterval, size.asInterval, o.asInterval)
    })
  override def assignWindows(ts: Long): Seq[TimeWindow] = {
    val start = TimeWindow.startFor(ts, size.millis, offset.map(_.millis).getOrElse(0L))
    Seq(TimeWindow(start, start + size.millis))
  }
}
object TumblingEventTimeWindows {
  def of(size: Time): TumblingEventTimeWindows = TumblingEventTimeWindows(size)
  def of(size: Time, offset: Time): TumblingEventTimeWindows =
    TumblingEventTimeWindows(size, Some(offset))
}

final case class SlidingEventTimeWindows(size: Time, slide: Time) extends WindowAssigner {
  override def groupingColumn(ts: Column): Option[Column] =
    Some(window(ts, size.asInterval, slide.asInterval))
  override def assignWindows(ts: Long): Seq[TimeWindow] = {
    val last = TimeWindow.startFor(ts, slide.millis, 0L)
    // bound on ts, not last: a window [s, s+size) contains ts iff
    // s > ts − size (Flink's loop bound). `s > last − size` would also
    // emit windows that END at or before ts whenever size is not an
    // integer multiple of slide
    Iterator.iterate(last)(_ - slide.millis)
      .takeWhile(s => s > ts - size.millis)
      .map(s => TimeWindow(s, s + size.millis)).toSeq
  }
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
  /** Pre-merge point window, as in the reference: the windowed operator
    * merges overlapping sessions.
    */
  override def assignWindows(ts: Long): Seq[TimeWindow] =
    Seq(TimeWindow(ts, ts + gap.millis))
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
  override def assignWindows(ts: Long): Seq[TimeWindow] =
    Seq(TimeWindow(Long.MinValue, Long.MaxValue))
  override def isEventTime: Boolean = false
  def create(): GlobalWindows.type = this
}

/** `[start, end)` window metadata (TimeWindow.cs:10-89), shared by
  * assigners and the typed windowed operators. `maxTimestamp = end - 1`.
  */
final case class TimeWindow(start: Long, end: Long) {
  def maxTimestamp: Long = end - 1
}
object TimeWindow {
  /** Reference epoch-aligned start formula, TimeWindow.cs:76-89. */
  def startFor(ts: Long, size: Long, offset: Long): Long = {
    val rem = (ts - offset + size) % size
    ts - (if (rem < 0) rem + size else rem)
  }
}
