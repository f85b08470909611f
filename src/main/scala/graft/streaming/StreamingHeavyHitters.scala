package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import graft.operators.SpaceSaving

/** Streaming heavy hitters: the space-saving summary as keyed streaming
  * state. Each micro-batch folds its per-key slice into the bounded
  * counter map (MapState entries are individual store keys — RocksDB at
  * scale) and emits that key's refreshed top-k snapshot.
  *
  * State per key is O(capacity) FOREVER, however long the stream — the
  * property that makes per-key vocabulary/trending-token tracking viable
  * on an unbounded ingest: a plain streaming groupBy(token).count() grows
  * state with the distinct-token universe instead. Per batch, at most
  * `capacity` counter writes per touched key.
  */
object StreamingHeavyHitters {

  /** (key, item, cnt, rnk) snapshot rows per touched key per micro-batch;
    * downstream keeps the latest snapshot per key (append mode).
    */
  def topK[K](grouped: KeyValueGroupedDataset[K, (K, String)], k: Int,
              capacity: Int)(
      implicit strEnc: Encoder[String], lngEnc: Encoder[Long],
      outEnc: Encoder[(K, String, Long, Long)]): Dataset[(K, String, Long, Long)] =
    KeyedStateOps.processWithMapState[K, (K, String), String, Long,
        (K, String, Long, Long)](grouped) { (key, rows, ms) =>
      // indexed summary: O(log capacity) per token — the minBy-scan form
      // costs O(capacity) per eviction, and at capacity every unseen
      // token evicts
      val summary = new graft.operators.SpaceSavingSummary(capacity)
      summary.load(ms.entries())
      rows.foreach { case (_, item) => summary.offer(item) }
      // rewrite the (<= capacity) counters; evicted entries must not linger
      ms.clear()
      ms.putAll(summary.entries.toSeq)
      summary.topK(k).iterator.zipWithIndex.map {
        case ((item, cnt), i) => (key, item, cnt, (i + 1).toLong)
      }
    }
}
