package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter (Bloom 1970): an m-bit array where each item sets k
  * hash-derived bits; membership reads them back. NO false negatives —
  * ever — and false positives at ~(set-bit fraction)^k: the classic
  * pre-filter that skips a shuffle/lookup for definitely-absent keys
  * (dedup probe tables, semi-join pushdown, cache admission).
  *
  * Merge is bitwise OR — associative, commutative, idempotent — so
  * map-side partials are one m-bit word array per partition and the
  * merged filter is bit-identical under ANY partitioning or duplication
  * of input slices (OR is idempotent where count-min's addition is not).
  * Bit positions derive from the repo-wide portable md5 hash; the q88
  * oracle rebuilds every WORD of the array in DuckDB and compares the
  * filter itself, not just probe answers.
  */
object Bloom {
  /** Bit position of `item` for hash function `i` (portableHashLocal is
    * < 2^32, so the mod is non-negative).
    */
  def bitPos(item: String, i: Int, mBits: Int): Int =
    (graft.llm.Similarity.portableHashLocal(s"bloom$i|$item") % mBits).toInt

  /** Membership probe: all k bits set ⇒ "maybe present" (never a false
    * negative); any clear bit ⇒ definitely absent.
    */
  def contains(words: Array[Long], item: String, k: Int, mBits: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = bitPos(item, i, mBits)
      if ((words(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Typed aggregator building the m-bit filter as 64-bit words. */
final class BloomAggregator(k: Int, mBits: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(k >= 1 && mBits >= 64 && mBits % 64 == 0,
    "mBits must be a positive multiple of 64")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val p = Bloom.bitPos(item, i, mBits)
      b(p >> 6) |= (1L << (p & 63))
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
