package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Online per-key z-score anomaly detection — the streaming face of
  * q110, with prefix semantics: each event is scored against the running
  * statistics of the events CONSUMED BEFORE it (an online monitor can't
  * see the future; the batch query scores against the global stats).
  *
  * State per key is three Longs — count, sum, sum-of-squares — in exact
  * integer cents, so the running moments are order-independent given the
  * fold order and never drift the way a running double accumulation
  * does. The z computation is scale-invariant (cents cancel), one double
  * division per event on exact operands.
  *
  * Ordering: rows within a micro-batch fold in (ts, event_id) order;
  * across batches the fold consumes arrival order — the same log-ordered
  * contract as StreamingFunnel.
  */
object StreamingZScore {

  /** rows: (event_id, tsMs, valueCents). Emits (key, event_id, z) for
    * events whose |z| against the prefix stats exceeds `threshold`
    * (needs ≥ 2 prior events and positive variance).
    */
  def flags(grouped: KeyValueGroupedDataset[Long, (Long, Long, Long)],
            threshold: Double)(
      implicit stEnc: Encoder[(Long, Long, Long)],
      outEnc: Encoder[(Long, Long, Double)]): Dataset[(Long, Long, Double)] = {

    val processor = new StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Double)] {
      @transient private var st: ValueState[(Long, Long, Long)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Long)](
          "moments", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
                                   timers: TimerValues): Iterator[(Long, Long, Double)] = {
        var (n, s, ss) = if (st.exists()) st.get() else (0L, 0L, 0L)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        rows.toIndexedSeq.sortBy(r => (r._2, r._1)).foreach { case (id, _, v) =>
          if (n >= 2) {
            val nD = n.toDouble
            val mean = s.toDouble / nD
            val variance = (nD * ss.toDouble - s.toDouble * s.toDouble) /
              (nD * (nD - 1.0))
            if (variance > 0) {
              val z = (v.toDouble - mean) / math.sqrt(variance)
              if (math.abs(z) > threshold) out += ((key, id, z))
            }
          }
          n += 1; s += v; ss += v * v
        }
        st.update((n, s, ss))
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
