package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import graft.operators.CountMin

/** Streaming count-min sketch: the per-key depth×width grid as keyed
  * streaming state. Each micro-batch folds its slice into touched-cell
  * deltas (one read-modify-write per TOUCHED cell, not a rewrite of the
  * grid — MapState entries are individual store keys, RocksDB at scale)
  * and emits the key's refreshed point estimates for the probe set.
  *
  * State per key is O(depth × width) FOREVER; because cell merge is
  * addition, the streaming accumulation over any batch split is
  * bit-identical to the batch [[graft.operators.CountMinAggregator]] over
  * the same rows (spec-asserted) — the unified-runtime property the
  * space-saving summary can only guarantee in its exact regime.
  */
object StreamingCountMin {

  /** (key, probe, est) snapshot rows per touched key per micro-batch;
    * downstream keeps the latest snapshot per key (append mode).
    */
  def estimates[K](grouped: KeyValueGroupedDataset[K, (K, String)],
                   probes: Seq[String], depth: Int, width: Int)(
      implicit intEnc: Encoder[Int], lngEnc: Encoder[Long],
      outEnc: Encoder[(K, String, Long)]): Dataset[(K, String, Long)] =
    KeyedStateOps.processWithMapState[K, (K, String), Int, Long,
        (K, String, Long)](grouped) { (key, rows, ms) =>
      val delta = scala.collection.mutable.HashMap.empty[Int, Long]
      rows.foreach { case (_, item) =>
        var i = 0
        while (i < depth) {
          val idx = i * width + CountMin.cell(item, i, width)
          delta.update(idx, delta.getOrElse(idx, 0L) + 1L)
          i += 1
        }
      }
      delta.foreach { case (idx, d) =>
        ms.put(idx, ms.get(idx).getOrElse(0L) + d)
      }
      probes.iterator.map { p =>
        var min = Long.MaxValue
        var i = 0
        while (i < depth) {
          val c = ms.get(i * width + CountMin.cell(p, i, width)).getOrElse(0L)
          if (c < min) min = c
          i += 1
        }
        (key, p, min)
      }
    }
}
