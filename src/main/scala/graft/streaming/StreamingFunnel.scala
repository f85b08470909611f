package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Streaming face of the q103 ordered-sequence funnel: a per-user state
  * machine over `transformWithState`, the reference's KeyedProcessFunction
  * pattern (per-key ValueState + conditional transitions) applied to
  * conversion tracking.
  *
  * State is three slots — first signup time, first qualifying click,
  * first qualifying purchase — each written at most once, so per-user
  * state is O(1) FOREVER on an unbounded stream (no event buffering; the
  * stream is consumed and dropped). A completed funnel emits one
  * (user, t1, t3) row at the purchase that closes it; an already-converted
  * user's further events are ignored.
  *
  * Ordering: rows within a micro-batch are folded in (ts, type) order
  * (batch-internal arrival order is not meaningful); ACROSS batches the
  * machine consumes events in arrival order, so cross-batch time travel
  * (a click in batch N+1 earlier than a signup already consumed in batch
  * N) is resolved in favor of what was already consumed — the standard
  * log-ordered (kappa) contract, same as the reference's keyed-stream
  * ordering guarantee per key.
  */
object StreamingFunnel {

  /** rows: (user_id, tUs, eventType). Emits (user_id, t1Us, t3Us) once
    * per user on funnel completion. gapUs bounds each step's delay.
    */
  def conversions(grouped: KeyValueGroupedDataset[Long, (Long, Long, String)],
                  gapUs: Long): Dataset[(Long, Long, Long)] = {
    val processor = new StatefulProcessor[Long, (Long, Long, String), (Long, Long, Long)] {
      @transient private var st: ValueState[(Long, Long, Long)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Long)](
          "funnel", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
                                   timers: TimerValues): Iterator[(Long, Long, Long)] = {
        var (t1, t2, t3) = if (st.exists()) st.get() else (-1L, -1L, -1L)
        if (t3 >= 0) return Iterator.empty // converted; nothing left to track
        var fired: Option[(Long, Long, Long)] = None
        // batch-internal sort: bounded by the user's events in THIS batch
        rows.toIndexedSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, e) =>
          if (t3 < 0) {
            if (t1 < 0) { if (e == "signup") t1 = t }
            else if (t2 < 0) {
              if (e == "click" && t > t1 && t - t1 <= gapUs) t2 = t
            } else if (e == "purchase" && t > t2 && t - t2 <= gapUs) {
              t3 = t
              fired = Some((key, t1, t3))
            }
          }
        }
        st.update((t1, t2, t3))
        fired.iterator
      }
    }
    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())(
      Encoders.product[(Long, Long, Long)])
  }
}
