package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Streaming face of q142's SCD2 dimension build: maintain type-2 version
  * history per key on an unbounded attribute changelog, emitting a version
  * row the moment it CLOSES (a differing attribute supersedes it) — the
  * continuous dimension-maintenance loop next to [[StreamingCompact]]'s
  * SCD1 latest-per-key view.
  *
  * Mechanics: ValueState holds only the OPEN version `(validFrom, attr,
  * version)`; each batch's rows for a key fold in sequence order, so a
  * batch with several changes emits every intermediate closure in one
  * state round-trip. A no-change row collapses (SCD2 change detection —
  * q142's null-safe lag compare); a row at or before the open version's
  * start is stale input and absorbs silently (the watermark-ordered
  * delivery contract — retroactive version splicing is a batch repair
  * job, not a streaming append).
  *
  * State per key is ONE open version regardless of stream length; closed
  * history lives only in the emitted append stream (the dimension table a
  * writer materializes). No timers: versions close on data, not time.
  */
object StreamingScd2 {

  /** rows: (seq, attr) with seq strictly increasing per key (encode the
    * event-time order, e.g. q128's day·10^10+orderkey). Emits
    * (key, version, attr, validFromSeq, validToSeq) on each closure.
    */
  def versions[K](grouped: KeyValueGroupedDataset[K, (Long, String)])(
      implicit stEnc: Encoder[(Long, String, Long)],
      outEnc: Encoder[(K, Long, String, Long, Long)]): Dataset[(K, Long, String, Long, Long)] = {

    val processor = new StatefulProcessor[K, (Long, String), (K, Long, String, Long, Long)] {
      @transient private var open: ValueState[(Long, String, Long)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        open = getHandle.getValueState[(Long, String, Long)]("open", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: K, rows: Iterator[(Long, String)],
                                   timers: TimerValues): Iterator[(K, Long, String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(K, Long, String, Long, Long)]
        var cur = if (open.exists()) Option(open.get()) else None
        rows.toSeq.sortBy(_._1).foreach { case (seq, attr) =>
          cur match {
            case None =>
              cur = Some((seq, attr, 1L))
            case Some((from, _, _)) if seq <= from =>
              () // stale/out-of-contract arrival: absorb
            case Some((_, a, _)) if a == attr =>
              () // no-change event: collapse
            case Some((from, a, v)) =>
              out += ((key, v, a, from, seq))
              cur = Some((seq, attr, v + 1))
          }
        }
        cur.foreach(open.update)
        out.iterator
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
