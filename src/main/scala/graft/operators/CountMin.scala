package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode & Muthukrishnan): a depth×width grid of
  * counters; every item increments one cell per row (row-seeded hash),
  * and a point estimate reads the MINIMUM of its cells. Guarantees:
  * estimates NEVER undercount, and overcount by at most εN (ε ≈ e/width)
  * with probability 1−δ (δ ≈ e^−depth). The complement of the
  * space-saving summary: space-saving answers "which items are big",
  * count-min answers "how big is THIS item" for any item, in O(depth ×
  * width) state per group regardless of stream length.
  *
  * Merge is elementwise addition — exactly associative/commutative, so
  * map-side partial aggregation carries one bounded grid per partition
  * instead of a (group, token) count-shuffle, and a sketch merged from
  * any partitioning is bit-identical to a single-pass build (unlike
  * space-saving's approx regime). Cells derive from the repo-wide
  * portable md5 hash, so an external engine rebuilds the identical grid
  * from the same bytes (the q87 oracle recomputes every probed cell in
  * DuckDB).
  */
object CountMin {
  /** Column index of `item` in sketch row `row` (row-seeded portable
    * hash; portableHashLocal is < 2^32, so the mod is non-negative).
    */
  def cell(item: String, row: Int, width: Int): Int =
    (graft.llm.Similarity.portableHashLocal(s"cms$row|$item") % width).toInt

  /** Point estimate: min over rows of the item's cell. */
  def estimate(cells: Array[Long], item: String, depth: Int, width: Int): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = cells(i * width + cell(item, i, width))
      if (c < min) min = c
      i += 1
    }
    min
  }
}

/** Typed aggregator building the depth×width grid (row-major Array). */
final class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      b(i * width + CountMin.cell(item, i, width)) += 1
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
