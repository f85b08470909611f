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
}
