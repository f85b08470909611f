package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Online per-key exponential smoothing — the streaming face of q158,
  * with prefix semantics: every event emits the EWMA of the series
  * consumed up to and including it, so the last emission per key equals
  * the batch fold exactly when the stream replays in event order.
  *
  * State per key is one row — (lastTs, lastId, ewma) — regardless of
  * stream length: the fold is associative over the prefix, nothing
  * buffers. Rows within a micro-batch fold in (ts, event_id) order;
  * rows at or behind the consumed frontier are DROPPED (the monotone
  * contract StreamingCompact uses — arrival duplicates and regressions
  * cannot perturb the fold, so restart replays are idempotent).
  *
  * `alpha` and `beta` are taken separately rather than `beta = 1 - alpha`
  * because IEEE rounding makes `1.0 - 0.2` ≠ the literal `0.8` by one
  * ulp — callers who need bit-agreement with a batch fold must pass the
  * same two literals the batch side uses (q158 uses 0.2 / 0.8).
  */
object StreamingEwma {

  /** rows: (event_id, tsUs, value). Emits (key, event_id, ewma) for every
    * accepted event — the smoothed value AFTER folding that event in.
    */
  def smoothed(grouped: KeyValueGroupedDataset[Long, (Long, Long, Double)],
               alpha: Double, beta: Double)(
      // one encoder serves both the (lastTs, lastId, ewma) state row and
      // the (key, event_id, ewma) output — the tuple shapes coincide
      implicit enc: Encoder[(Long, Long, Double)]): Dataset[(Long, Long, Double)] = {

    val processor = new StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {
      @transient private var st: ValueState[(Long, Long, Double)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Double)](
          "frontier", enc, TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
                                   timers: TimerValues): Iterator[(Long, Long, Double)] = {
        var (lastTs, lastId, ewma) =
          if (st.exists()) st.get() else (Long.MinValue, Long.MinValue, 0.0)
        var seeded = st.exists()
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        rows.toIndexedSeq.sortBy(r => (r._2, r._1)).foreach { case (id, ts, v) =>
          val inOrder = ts > lastTs || (ts == lastTs && id > lastId)
          if (inOrder) {
            ewma = if (seeded) alpha * v + beta * ewma else v
            seeded = true
            lastTs = ts; lastId = id
            out += ((key, id, ewma))
          } // else: behind the frontier — replay or out-of-order, dropped
        }
        if (seeded) st.update((lastTs, lastId, ewma))
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
