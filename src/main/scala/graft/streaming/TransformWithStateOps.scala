package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** `transformWithState` operators (Spark 4's arbitrary-state API) — the
  * closest Spark analogue of the reference's `KeyedWindowProcessor`
  * (TaskManager/Internal/KeyedWindowProcessor.cs:38-164): per-key pane
  * buffers, event-time TIMERS registered at window end, and firing when
  * the watermark passes — i.e. the `EventTimeTrigger` lifecycle
  * (DefaultTriggers.cs:7-29) made explicit rather than implied by a
  * windowed aggregation.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`), matching the
  * reference's RocksDB state backend (Storage.RocksDB).
  */
/** TriggerResult (Core.Api/Windowing/TriggerResult.cs:8-27): what a window
  * does after a trigger consultation — fire the pane, purge it, both, or
  * nothing.
  */
sealed abstract class TriggerResult(val fire: Boolean, val purge: Boolean)
object TriggerResult {
  case object Continue extends TriggerResult(false, false)
  case object Fire extends TriggerResult(true, false)
  case object Purge extends TriggerResult(false, true)
  case object FireAndPurge extends TriggerResult(true, true)
}

/** The reference's public trigger contract (Trigger<TElement,TWindow>,
  * Core.Api/Windowing/Trigger.cs:25-91) for the explicit-state window
  * path: `onElement` is consulted per element AFTER it joins its pane,
  * `onEventTime` when the watermark passes the window end. Arbitrary
  * Fire|Purge combinations compose early-firing, accumulating, and
  * discarding windows — the piece SURVEY §7.4 previously mapped only to
  * built-in output modes.
  */
trait WindowTrigger[V] extends Serializable {
  def onElement(element: V, tsMs: Long, window: graft.windowing.TimeWindow,
                paneSize: Long): TriggerResult = TriggerResult.Continue
  def onEventTime(window: graft.windowing.TimeWindow): TriggerResult =
    TriggerResult.FireAndPurge
}

object WindowTrigger {
  /** EventTimeTrigger (DefaultTriggers.cs:7-29): fire+purge at watermark. */
  def eventTime[V]: WindowTrigger[V] = new WindowTrigger[V] {}

  /** Count trigger: fire every `n` pane elements; `purge` controls whether
    * the fired pane resets (sliding-count vs accumulating early firing).
    */
  def count[V](n: Long, purgeOnFire: Boolean = false): WindowTrigger[V] = {
    // reject at build time: n = 0 would throw ArithmeticException per
    // element mid-stream, n < 0 would silently never fire
    require(n >= 1, s"count trigger needs n >= 1, got $n")
    new WindowTrigger[V] {
      override def onElement(element: V, tsMs: Long,
                             window: graft.windowing.TimeWindow,
                             paneSize: Long): TriggerResult =
        if (paneSize > 0 && paneSize % n == 0)
          (if (purgeOnFire) TriggerResult.FireAndPurge else TriggerResult.Fire)
        else TriggerResult.Continue
    }
  }
}

object TransformWithStateOps {

  /** Tumbling event-time process-window over transformWithState: elements
    * buffer in per-key ListState tagged with their window start; a timer at
    * each window end fires the pane exactly when the watermark crosses it
    * (Fire+Purge: emit then drop the pane, the EventTimeTrigger default).
    */
  def tumblingProcessWindow[K, V, OUT](
      grouped: KeyValueGroupedDataset[K, V], sizeMs: Long)(tsMs: V => Long)(
      processPane: (K, Long, Seq[V]) => OUT)(
      implicit tagEnc: Encoder[(Long, V)], outEnc: Encoder[OUT]): Dataset[OUT] = {

    val processor = new StatefulProcessor[K, V, OUT] {
      @transient private var buf: ListState[(Long, V)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        buf = getHandle.getListState[(Long, V)]("panes", tagEnc, TTLConfig.NONE)

      override def handleInputRows(key: K, rows: Iterator[V],
                                   timers: TimerValues): Iterator[OUT] = {
        val registered = scala.collection.mutable.Set.empty[Long]
        rows.foreach { v =>
          val ws = graft.datastream.WindowedStream.startFor(tsMs(v), sizeMs, 0L)
          val end = ws + sizeMs
          // drop elements whose window already fired (end ≤ watermark):
          // buffering them would leak state forever — no timer will come.
          // This is the EventTimeTrigger late-drop, applied at ingress.
          if (end > timers.getCurrentWatermarkInMs) {
            buf.appendValue((ws, v))
            if (!registered.contains(end)) {
              getHandle.registerTimer(end)
              registered += end
            }
          }
        }
        Iterator.empty
      }

      override def handleExpiredTimer(key: K, timers: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[OUT] = {
        val expiry = info.getExpiryTimeInMs
        val ws = expiry - sizeMs
        val all = buf.get().toIndexedSeq
        val (fire, keep) = all.partition(_._1 == ws)
        if (keep.isEmpty) buf.clear() else buf.put(keep.toArray)
        if (fire.isEmpty) Iterator.empty
        else Iterator.single(processPane(key, ws, fire.map(_._2)))
      }
    }

    grouped.transformWithState(processor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Tumbling process-window with a USER trigger (Trigger.cs:25-91 made
    * public): elements buffer per (key, window); after each element the
    * trigger decides Fire/Purge/both (early firing, discarding), and the
    * watermark crossing the window end consults `onEventTime` (default
    * Fire+Purge). Pane counts ride in a MapState keyed by window start so
    * `onElement` sees the pane size without scanning the buffer.
    */
  def triggeredTumblingProcessWindow[K, V, OUT](
      grouped: KeyValueGroupedDataset[K, V], sizeMs: Long,
      trigger: WindowTrigger[V])(tsMs: V => Long)(
      processPane: (K, Long, Seq[V]) => OUT)(
      implicit tagEnc: Encoder[(Long, V)], longEnc: Encoder[Long],
      outEnc: Encoder[OUT]): Dataset[OUT] = {

    val processor = new StatefulProcessor[K, V, OUT] {
      @transient private var buf: ListState[(Long, V)] = _
      @transient private var counts: MapState[Long, Long] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        buf = getHandle.getListState[(Long, V)]("panes", tagEnc, TTLConfig.NONE)
        counts = getHandle.getMapState[Long, Long]("counts", longEnc, longEnc, TTLConfig.NONE)
      }

      private def paneOf(ws: Long): IndexedSeq[(Long, V)] =
        buf.get().filter(_._1 == ws).toIndexedSeq

      private def dropPane(ws: Long): Unit = {
        val keep = buf.get().filterNot(_._1 == ws).toArray
        if (keep.isEmpty) buf.clear() else buf.put(keep)
        counts.removeKey(ws)
      }

      override def handleInputRows(key: K, rows: Iterator[V],
                                   timers: TimerValues): Iterator[OUT] = {
        val wm = timers.getCurrentWatermarkInMs
        val registered = scala.collection.mutable.Set.empty[Long]
        val out = scala.collection.mutable.ArrayBuffer.empty[OUT]
        rows.foreach { v =>
          val ws = graft.datastream.WindowedStream.startFor(tsMs(v), sizeMs, 0L)
          val end = ws + sizeMs
          if (end > wm) { // late elements past the fired window drop at ingress
            buf.appendValue((ws, v))
            val n = (if (counts.containsKey(ws)) counts.getValue(ws) else 0L) + 1L
            counts.updateValue(ws, n)
            if (!registered.contains(end)) {
              getHandle.registerTimer(end)
              registered += end
            }
            val res = trigger.onElement(v, tsMs(v),
              graft.windowing.TimeWindow(ws, end), n)
            if (res.fire) {
              val pane = paneOf(ws)
              if (pane.nonEmpty) out += processPane(key, ws, pane.map(_._2))
            }
            if (res.purge) dropPane(ws)
          }
        }
        out.iterator
      }

      override def handleExpiredTimer(key: K, timers: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[OUT] = {
        val ws = info.getExpiryTimeInMs - sizeMs
        val res = trigger.onEventTime(graft.windowing.TimeWindow(ws, ws + sizeMs))
        val pane = if (res.fire) paneOf(ws) else IndexedSeq.empty
        // the timer IS the window's cleanup time: ingress drops anything
        // with end <= watermark from here on, so the pane can never grow
        // again — state drops regardless of the trigger's purge flag
        // (Flink clears window state at cleanup time the same way; purge
        // only matters for EARLY fires out of onElement)
        dropPane(ws)
        if (res.fire && pane.nonEmpty)
          Iterator.single(processPane(key, ws, pane.map(_._2)))
        else Iterator.empty
      }
    }

    grouped.transformWithState(processor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Sliding event-time process-window with explicit timers
    * (KeyedWindowProcessor.cs:81-104 semantics for SlidingEventTimeWindows):
    * each element buffers ONCE tagged with its event time — not once per
    * covering window — and a timer is registered at every covering window's
    * end. On expiry the pane [end-size, end) is assembled by timestamp
    * range; elements whose LAST covering window has fired are dropped from
    * state, and late elements whose windows have all fired are dropped at
    * ingress (no timer would ever clean them).
    */
  def slidingProcessWindow[K, V, OUT](
      grouped: KeyValueGroupedDataset[K, V], sizeMs: Long, slideMs: Long)(
      tsMs: V => Long)(processPane: (K, Long, Seq[V]) => OUT)(
      implicit tagEnc: Encoder[(Long, V)], outEnc: Encoder[OUT]): Dataset[OUT] = {
    require(sizeMs % slideMs == 0, "size must be a multiple of slide")

    val processor = new StatefulProcessor[K, V, OUT] {
      @transient private var buf: ListState[(Long, V)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        buf = getHandle.getListState[(Long, V)]("elems", tagEnc, TTLConfig.NONE)

      override def handleInputRows(key: K, rows: Iterator[V],
                                   timers: TimerValues): Iterator[OUT] = {
        val wm = timers.getCurrentWatermarkInMs
        val registered = scala.collection.mutable.Set.empty[Long]
        rows.foreach { v =>
          val ts = tsMs(v)
          // latest window start covering ts, per the epoch-aligned formula
          val lastStart = graft.datastream.WindowedStream.startFor(ts, slideMs, 0L)
          if (lastStart + sizeMs > wm) { // at least one window still to fire
            buf.appendValue((ts, v))
            var ws = lastStart
            while (ws > ts - sizeMs) {
              val end = ws + sizeMs
              if (end > wm && !registered.contains(end)) {
                getHandle.registerTimer(end)
                registered += end
              }
              ws -= slideMs
            }
          }
        }
        Iterator.empty
      }

      override def handleExpiredTimer(key: K, timers: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[OUT] = {
        val end = info.getExpiryTimeInMs
        val ws = end - sizeMs
        val all = buf.get().toIndexedSeq
        val pane = all.filter { case (ts, _) => ts >= ws && ts < end }
        // an element is spent once its last covering window has fired
        val keep = all.filter { case (ts, _) =>
          graft.datastream.WindowedStream.startFor(ts, slideMs, 0L) + sizeMs > end
        }
        if (keep.isEmpty) buf.clear() else buf.put(keep.toArray)
        if (pane.isEmpty) Iterator.empty
        else Iterator.single(processPane(key, ws, pane.map(_._2)))
      }
    }

    grouped.transformWithState(processor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Session event-time process-window with explicit timers: the gap-merge
    * lifecycle the reference only stubbed (Trigger.OnMerge,
    * TimeWindow.Intersects/Cover) made concrete. Elements buffer per key;
    * every element registers a candidate close timer at ts+gap; on expiry
    * the buffer is split into sessions (consecutive-timestamp gaps ≥ gap
    * start a new one) and every session whose end has been passed by the
    * watermark fires and leaves state. Emits (key, sessStart, sessEnd,
    * pane).
    *
    * Scale bound: one key's OPEN sessions buffer in its ListState — state
    * is trimmed at every close, but a key that never pauses for `gap`
    * accumulates; that pathologically-hot-key case is the documented bound
    * of the typed path (the batch-scale form is session_window(), q28).
    */
  def sessionProcessWindow[K, V, OUT](
      grouped: KeyValueGroupedDataset[K, V], gapMs: Long)(
      tsMs: V => Long)(processPane: (K, Long, Long, Seq[V]) => OUT)(
      implicit tagEnc: Encoder[(Long, V)], outEnc: Encoder[OUT]): Dataset[OUT] = {

    val processor = new StatefulProcessor[K, V, OUT] {
      @transient private var buf: ListState[(Long, V)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        buf = getHandle.getListState[(Long, V)]("sess", tagEnc, TTLConfig.NONE)

      override def handleInputRows(key: K, rows: Iterator[V],
                                   timers: TimerValues): Iterator[OUT] = {
        val wm = timers.getCurrentWatermarkInMs
        rows.foreach { v =>
          val ts = tsMs(v)
          // element-lateness rule (Flink's isElementLate for sessions):
          // drop iff the element's OWN window [ts, ts+gap) ends at or
          // before the watermark. An element that would merge backwards
          // into a still-open later session is dropped too — matching
          // Flink, which judges lateness on the pre-merge window
          if (ts + gapMs > wm) {
            buf.appendValue((ts, v))
            getHandle.registerTimer(ts + gapMs)
          }
        }
        Iterator.empty
      }

      override def handleExpiredTimer(key: K, timers: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[OUT] = {
        val wm = math.max(timers.getCurrentWatermarkInMs, info.getExpiryTimeInMs)
        val all = buf.get().toIndexedSeq.sortBy(_._1)
        if (all.isEmpty) return Iterator.empty
        // split into sessions: a gap ≥ gapMs between consecutive elements
        // starts a new session (same rule as q28's oracle)
        val sessions = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[(Long, V)]]
        var cur = scala.collection.mutable.ArrayBuffer((all.head))
        all.tail.foreach { e =>
          if (e._1 - cur.last._1 >= gapMs) { sessions += cur.toIndexedSeq; cur = scala.collection.mutable.ArrayBuffer(e) }
          else cur += e
        }
        sessions += cur.toIndexedSeq
        val (closed, open) = sessions.partition(s => s.last._1 + gapMs <= wm)
        val keep = open.flatten
        if (keep.isEmpty) buf.clear() else buf.put(keep.toArray)
        closed.iterator.map { s =>
          processPane(key, s.head._1, s.last._1 + gapMs, s.map(_._2))
        }
      }
    }

    grouped.transformWithState(processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
