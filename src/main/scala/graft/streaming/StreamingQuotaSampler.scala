package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Streaming twin of the q194 per-group quota sample: keep the k
  * lowest content-hash priorities per key as the stream flows. The
  * kept-set function is MERGEABLE (top-k by priority of a union folds
  * from per-part top-k's — the same property the batch TopKAggregator
  * leans on), so cross-batch accumulation in a k-row roster is exact:
  * after any prefix of the stream, the roster equals the batch q194
  * sample over the rows seen so far, independent of batch boundaries.
  *
  * Replays are naturally idempotent (set semantics by (priority, id));
  * state per key is AT MOST k (priority, id) pairs, forever. Each batch
  * emits the key's current roster (size + ordered id list) so sinks can
  * track sample churn as the corpus grows.
  */
object StreamingQuotaSampler {

  /** rows: (id, priority). Emits (key, n_kept, ids_csv) per batch per
    * key seen in that batch, roster ordered by (priority, id) — exactly
    * q194's rank order.
    */
  def keep(grouped: KeyValueGroupedDataset[String, (Long, Long)], k: Int)(
      implicit stEnc: Encoder[Seq[(Long, Long)]],
      outEnc: Encoder[(String, Long, String)]): Dataset[(String, Long, String)] = {

    val processor = new StatefulProcessor[String, (Long, Long), (String, Long, String)] {
      @transient private var roster: ValueState[Seq[(Long, Long)]] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        roster = getHandle.getValueState[Seq[(Long, Long)]](
          "roster", stEnc, TTLConfig.NONE)

      override def handleInputRows(key: String, rows: Iterator[(Long, Long)],
                                   timers: TimerValues): Iterator[(String, Long, String)] = {
        val prev = if (roster.exists()) roster.get() else Seq.empty
        // stored as (priority, id) so tuple order IS the sample order
        val merged = (prev ++ rows.map { case (id, p) => (p, id) })
          .distinct.sorted.take(k)
        roster.update(merged)
        Iterator.single((key, merged.length.toLong,
          merged.map(_._2).mkString(",")))
      }
    }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
