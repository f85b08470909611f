package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Online per-key Holt linear-trend smoothing — the streaming face of
  * q172, with prefix semantics: every accepted event (from the second
  * onward) emits the (level, trend) of the series consumed so far, so
  * the last emission per key equals the batch fold bit-for-bit when the
  * stream replays in event order.
  *
  * State per key is one fixed-width row — (lastTs, lastId, l, t, nSeen) —
  * regardless of stream length. Seeding matches q172: the first value is
  * held, the second sets l = v₂, t = v₂ − v₁, and subsequent values fold
  * l' = α·x + β·(l + t); t' = γ·(l' − l) + δ·t. Rows at or behind the
  * consumed (ts, event_id) frontier are DROPPED — the monotone contract
  * shared with StreamingEwma, making restart replays idempotent.
  *
  * All four coefficients are explicit literals rather than derived
  * (β = 1 − α differs by an ulp from the literal 0.7): bit-agreement
  * with the batch fold requires the caller to pass the same literals
  * q172 uses (0.3 / 0.7 / 0.1 / 0.9).
  */
object StreamingHolt {

  /** rows: (event_id, tsUs, value). Emits (key, event_id, level, trend)
    * for every accepted event once the two-point seed exists.
    */
  def smoothed(grouped: KeyValueGroupedDataset[Long, (Long, Long, Double)],
               alpha: Double, beta: Double, gamma: Double, delta: Double)(
      implicit stEnc: Encoder[(Long, Long, Double, Double, Long)],
      outEnc: Encoder[(Long, Long, Double, Double)]): Dataset[(Long, Long, Double, Double)] = {

    val processor = new StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double, Double)] {
      @transient private var st: ValueState[(Long, Long, Double, Double, Long)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Double, Double, Long)](
          "holt", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
                                   timers: TimerValues): Iterator[(Long, Long, Double, Double)] = {
        var (lastTs, lastId, l, t, n) =
          if (st.exists()) st.get() else (Long.MinValue, Long.MinValue, 0.0, 0.0, 0L)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
        rows.toIndexedSeq.sortBy(r => (r._2, r._1)).foreach { case (id, ts, v) =>
          val inOrder = ts > lastTs || (ts == lastTs && id > lastId)
          if (inOrder) {
            if (n == 0L) { l = v }                 // v₁ parked in the l slot
            else if (n == 1L) { t = v - l; l = v } // seed: l = v₂, t = v₂ − v₁
            else {
              val l2 = alpha * v + beta * (l + t)
              t = gamma * (l2 - l) + delta * t
              l = l2
            }
            n += 1L
            lastTs = ts; lastId = id
            if (n >= 2L) out += ((key, id, l, t))
          } // else: behind the frontier — replay or out-of-order, dropped
        }
        if (n > 0L) st.update((lastTs, lastId, l, t, n))
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
