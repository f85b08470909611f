package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy hitters (Metwally et al.'s classic bounded-counter
  * summary): per group, keep at most `capacity` (item, count) counters;
  * an unseen item past capacity evicts the minimum counter and inherits
  * its count + 1. Guarantees: any item with true frequency > N/capacity
  * is retained, counts overestimate by at most the evicted minimum, and
  * when `capacity` ≥ the group's distinct-item count the summary is
  * EXACT. Merge sums counters pairwise then re-trims — associative and
  * commutative over the trim order for the exact regime; in the approx
  * regime it keeps the standard space-saving error bound.
  *
  * Scale posture: state per group is O(capacity) regardless of stream
  * length — the vocabulary-mining / top-k-tokens shape that at 100 TB
  * replaces a full (group, token) count-shuffle with map-side partials
  * of bounded size. Deterministic: eviction and final ranking both break
  * ties by (count, item) ordering.
  */
object SpaceSaving {
  /** One space-saving update against a MUTABLE counter map (the streaming
    * state form — the batch Aggregator below folds immutably).
    */
  def offer(counters: scala.collection.mutable.HashMap[String, Long],
            item: String, capacity: Int): Unit =
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < capacity => counters.update(item, 1L)
      case None =>
        val (minItem, minCnt) = counters.minBy { case (i, c) => (c, i) }
        counters.remove(minItem)
        counters.update(item, minCnt + 1)
    }

  /** Deterministic top-k of a counter map: count desc, item asc. */
  def topK(counters: collection.Map[String, Long], k: Int): Seq[(String, Long)] =
    counters.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
}

/** Indexed mutable summary for hot update paths: a TreeSet over
  * (count, item) tracks the eviction minimum, so each update is
  * O(log capacity) — the bare `offer`'s minBy scan is O(capacity) PER
  * EVICTION, and at capacity every unseen item evicts, which on an
  * unseen-heavy token stream multiplies the whole hot path by the
  * capacity. Identical algorithm and (count, item) tie-breaks, so
  * results are bit-identical to the scan form.
  */
final class SpaceSavingSummary(capacity: Int) {
  require(capacity >= 1)
  private val m = scala.collection.mutable.HashMap.empty[String, Long]
  private val idx = scala.collection.mutable.TreeSet.empty[(Long, String)]

  def offer(item: String): Unit = m.get(item) match {
    case Some(c) =>
      idx.remove((c, item)); m.update(item, c + 1); idx.add((c + 1, item))
    case None if m.size < capacity =>
      m.update(item, 1L); idx.add((1L, item))
    case None =>
      val min @ (minCnt, minItem) = idx.head
      idx.remove(min); m.remove(minItem)
      m.update(item, minCnt + 1); idx.add((minCnt + 1, item))
  }

  /** Seed from persisted state (streaming MapState restore). */
  def load(entries: Iterator[(String, Long)]): Unit =
    entries.foreach { case (i, c) => m.update(i, c); idx.add((c, i)) }

  def entries: Iterator[(String, Long)] = m.iterator
  def size: Int = m.size
  def topK(k: Int): Seq[(String, Long)] = SpaceSaving.topK(m, k)
}

final class SpaceSavingAggregator(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1 && capacity >= k)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < capacity => b.updated(item, 1L)
      case None =>
        val (minItem, minCnt) = b.minBy { case (i, c) => (c, i) }
        (b - minItem).updated(item, minCnt + 1)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else summed.toSeq.sortBy { case (i, c) => (-c, i) }.take(capacity).toMap
  }

  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)

  // Native Tungsten map encoder, NOT Encoders.kryo: Kryo's FieldSerializer
  // needs reflective access to java.nio internals (HeapByteBuffer), which
  // Java 17 blocks unless the JVM was launched with --add-opens — the
  // aggregator would then fail or not depending on launcher flags. The
  // expression encoder is also codegen-friendly and shuffles as a compact
  // UnsafeMapData instead of a Kryo blob.
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
