package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Online greedy debounce — the true streaming semantics q184's batch
  * form approximates: an event is KEPT iff it arrives more than
  * `toleranceUs` after the last KEPT event of its key (not the last seen
  * one — a burst that chains 20 s apart forever still emits one event
  * per tolerance window, where the batch adjacent-gap form would emit
  * only the burst head).
  *
  * State per key is one row — (lastKeptTs, lastKeptId, frontierTs,
  * frontierId) — regardless of stream length. The (ts, id) frontier
  * drops replays and out-of-order arrivals (the monotone contract shared
  * with StreamingEwma/StreamingHolt), so restarts are idempotent.
  */
object StreamingDebounce {

  /** rows: (event_id, tsUs). Emits (key, event_id, tsUs) for kept events. */
  def kept(grouped: KeyValueGroupedDataset[(Long, String), (Long, Long)],
           toleranceUs: Long)(
      implicit stEnc: Encoder[(Long, Long, Long, Long)],
      outEnc: Encoder[(Long, String, Long, Long)]): Dataset[(Long, String, Long, Long)] = {

    val processor = new StatefulProcessor[(Long, String), (Long, Long), (Long, String, Long, Long)] {
      @transient private var st: ValueState[(Long, Long, Long, Long)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Long, Long)](
          "debounce", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: (Long, String), rows: Iterator[(Long, Long)],
                                   timers: TimerValues): Iterator[(Long, String, Long, Long)] = {
        var (keptTs, keptId, frTs, frId) =
          if (st.exists()) st.get()
          else (Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue)
        var seeded = st.exists()
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
        rows.toIndexedSeq.sortBy(r => (r._2, r._1)).foreach { case (id, ts) =>
          val inOrder = ts > frTs || (ts == frTs && id > frId)
          if (inOrder) {
            if (!seeded || ts - keptTs > toleranceUs) {
              keptTs = ts; keptId = id; seeded = true
              out += ((key._1, key._2, id, ts))
            }
            frTs = ts; frId = id
          }
        }
        if (seeded || frTs != Long.MinValue) st.update((keptTs, keptId, frTs, frId))
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
