package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Streaming twin of the q192 rolling (windowed) median — the
  * percentile-over-frame window aggregate Spark lacks natively. Input is
  * the per-(key, day) exact-cent daily aggregate stream; for each
  * arriving day the processor emits the median over the trailing 7-day
  * PANE of that key, interpolated exactly like the batch expression
  * (rank 0.5·(n−1) over the sorted ≤7 exact-cent frame, so the result is
  * k or k.5 — both textbook interpolation forms coincide and the stream
  * value is bit-equal to batch q192's med7).
  *
  * State per key is the pane: at most `lookback` (day, cents) entries —
  * only the most recent `lookback` days survive each batch, so state is
  * O(keys × lookback) forever. The day frontier (the pane's max day)
  * makes replays idempotent the same way StreamingEwma's id frontier
  * does: a re-delivered day at or behind the frontier is dropped without
  * emission, so every (key, day) is emitted EXACTLY once and the value
  * always comes from the full trailing pane. (An emit-again alternative
  * would recompute old days against a partially evicted pane — the one
  * thing a bounded-state operator cannot do faithfully.)
  *
  * Divergence contract (same as StreamingHolt/StreamingEwma): days must
  * arrive in per-key ascending order — feed the operator from a
  * watermarked daily aggregation so each day's total is final and
  * in-order, exactly as batch q192 sees only final daily totals.
  */
object StreamingRollingMedian {

  /** rows: (day, cents). Emits (key, day, med7_cents_scaled) where the
    * third field is the interpolated median of the trailing ≤7 pane in
    * CENT units (divide by 100 downstream for currency, as q192 does).
    */
  def med7(grouped: KeyValueGroupedDataset[String, (Long, Long)],
           lookback: Int = 7)(
      implicit stEnc: Encoder[Seq[(Long, Long)]],
      outEnc: Encoder[(String, Long, Double)]): Dataset[(String, Long, Double)] = {

    val processor = new StatefulProcessor[String, (Long, Long), (String, Long, Double)] {
      @transient private var pane: ValueState[Seq[(Long, Long)]] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        pane = getHandle.getValueState[Seq[(Long, Long)]](
          "pane", stEnc, TTLConfig.NONE)

      /** Batch q192's exact interpolation: the frame holds ≤7 exact-cent
        * values, rank 0.5·(n−1) is k or k.5, every float op identical.
        */
      private def med(cents: Seq[Long]): Double = {
        val s = cents.sorted.map(_.toDouble)
        val rank = 0.5 * (s.length - 1)
        val lo = rank.toInt
        if (lo + 1 >= s.length) s.last
        else s(lo) * (1.0 - (rank - lo)) + s(lo + 1) * (rank - lo)
      }

      override def handleInputRows(key: String, rows: Iterator[(Long, Long)],
                                   timers: TimerValues): Iterator[(String, Long, Double)] = {
        var st: Map[Long, Long] =
          (if (pane.exists()) pane.get() else Seq.empty).toMap
        // frontier: replayed/late days at or behind the pane max are
        // dropped (no emission) — each (key, day) emits exactly once,
        // always against its full trailing pane
        var hi = if (st.isEmpty) Long.MinValue else st.keysIterator.max
        val out = rows.toSeq.distinct.sortBy(_._1).collect {
          case (day, cents) if day > hi =>
            hi = day
            st = st.updated(day, cents)
            // ROW-frame semantics (batch q192 is ROWS BETWEEN 6
            // PRECEDING AND CURRENT ROW over day order): the frame is
            // the ≤lookback most recent present days, dense or not
            val frame = st.keys.toSeq.sorted.takeRight(lookback).map(st)
            if (st.size > lookback)
              st = st.keys.toSeq.sorted.takeRight(lookback)
                .map(k => k -> st(k)).toMap
            (key, day, med(frame))
        }
        pane.update(st.toSeq.sortBy(_._1))
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
