package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Online two-sided CUSUM changepoint monitoring — the streaming face of
  * q159, emitting an alarm row the moment a series' cumulative residual
  * crosses its threshold (the whole point of CUSUM is catching the
  * drift WHILE it happens; the batch query reports counts after the
  * fact).
  *
  * State per key is one row — (lastTs, lastId, pos, neg) — regardless of
  * stream length. Rows fold in (ts, event_id) order within a batch;
  * rows at or behind the consumed frontier are dropped (the same
  * monotone replay-idempotence contract as StreamingEwma/Compact).
  * Alarm semantics match q159 exactly: pos ← max(0, pos + x − kUp)
  * alarms and resets when > h; neg ← min(0, neg + x − kDown) alarms and
  * resets when < −h. Identical IEEE ops in identical order make the
  * alarm SET (not just counts) bit-agree with the batch fold on an
  * in-order replay, which the spec asserts.
  */
object StreamingCusum {

  /** rows: (event_id, tsUs, value). Emits (key, event_id, kind, residual)
    * where kind is "up" | "down" and residual is the pre-reset excursion
    * that tripped the threshold.
    */
  def alarms(grouped: KeyValueGroupedDataset[Long, (Long, Long, Double)],
             kUp: Double, kDown: Double, h: Double)(
      implicit stEnc: Encoder[(Long, Long, Double, Double)],
      outEnc: Encoder[(Long, Long, String, Double)]): Dataset[(Long, Long, String, Double)] = {

    val processor = new StatefulProcessor[Long, (Long, Long, Double), (Long, Long, String, Double)] {
      @transient private var st: ValueState[(Long, Long, Double, Double)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Double, Double)](
          "residuals", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
                                   timers: TimerValues): Iterator[(Long, Long, String, Double)] = {
        var (lastTs, lastId, pos, neg) =
          if (st.exists()) st.get() else (Long.MinValue, Long.MinValue, 0.0, 0.0)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Double)]
        rows.toIndexedSeq.sortBy(r => (r._2, r._1)).foreach { case (id, ts, v) =>
          val inOrder = ts > lastTs || (ts == lastTs && id > lastId)
          if (inOrder) {
            val p2 = math.max(0.0, pos + v - kUp)
            val n2 = math.min(0.0, neg + v - kDown)
            if (p2 > h) { out += ((key, id, "up", p2)); pos = 0.0 } else pos = p2
            if (n2 < -h) { out += ((key, id, "down", n2)); neg = 0.0 } else neg = n2
            lastTs = ts; lastId = id
          }
        }
        st.update((lastTs, lastId, pos, neg))
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
