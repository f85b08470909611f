package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Streaming face of q128's CDC last-writer-wins compaction: maintain the
  * latest surviving changelog row per key on an unbounded stream, emitting
  * a changelog of winners — the materialized-view maintenance loop every
  * incremental table format runs continuously.
  *
  * Mechanics: ValueState holds the current winner `(seq, op, payload)`;
  * each input batch folds to its max-seq candidate BEFORE touching state
  * (one state read/write per key per batch, not per row), and a new row
  * emits only when the winner changes — out-of-order rows with stale
  * sequence numbers are absorbed silently, which is exactly the
  * last-writer-wins contract (arrival order cannot influence the result,
  * only the monotone sequence can). Delete tombstones (`op = "D"`) win
  * like any other row and EMIT — a downstream materializer must see the
  * delete to drop the key; the live view is `filter(op != "D")`, matching
  * the batch query's post-fold filter.
  *
  * State per key is ONE row regardless of stream length — the same
  * bounded-state discipline as the other streaming twins. No timers: the
  * compacted table is defined at every instant, not at watermark closes.
  */
object StreamingCompact {

  /** rows: (seq, op, payload). Emits (key, seq, op, payload) whenever the
    * compacted winner for `key` changes. `seq` must be unique per key
    * (q128 uses the monotone day*10^10+orderkey sequence).
    */
  def latest[K, P](grouped: KeyValueGroupedDataset[K, (Long, String, P)])(
      implicit stEnc: Encoder[(Long, String, P)],
      outEnc: Encoder[(K, Long, String, P)]): Dataset[(K, Long, String, P)] = {

    val processor = new StatefulProcessor[K, (Long, String, P), (K, Long, String, P)] {
      @transient private var st: ValueState[(Long, String, P)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, String, P)]("winner", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: K, rows: Iterator[(Long, String, P)],
                                   timers: TimerValues): Iterator[(K, Long, String, P)] = {
        val batchBest = rows.maxBy(_._1)
        val cur = if (st.exists()) Some(st.get()) else None
        if (cur.forall(_._1 < batchBest._1)) {
          st.update(batchBest)
          Iterator.single((key, batchBest._1, batchBest._2, batchBest._3))
        } else Iterator.empty
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
