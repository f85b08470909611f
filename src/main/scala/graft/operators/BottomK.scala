package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic bottom-k sample sketch: keeps the k rows with the
  * smallest (priority, id) key over ANY input order or partitioning.
  *
  * Properties that make it a sketch rather than a sample:
  *  - mergeable: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ++ bottom-k(B)),
  *    so partial aggregation bounds shuffle state at k rows per partition
  *    (ScalaCheck'd in ArithmeticProps);
  *  - reproducible: priorities are content hashes (portableHash), so an
  *    engine with the same hash selects the SAME sample — the DuckDB
  *    oracle re-derives the sketch exactly, which no random reservoir
  *    can offer;
  *  - quantiles of the k-sample estimate corpus quantiles with rank
  *    error O(1/√k) — the q191 query asserts the bound in-output.
  */
final class BottomKAggregator(k: Int)(
    implicit seqEnc: Encoder[Seq[(Long, Long, Double)]])
    extends Aggregator[(Long, Long, Double), Seq[(Long, Long, Double)], Seq[(Long, Long, Double)]] {
  require(k > 0)
  private def keep(s: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    s.sortBy { case (prio, id, _) => (prio, id) }.take(k)
  override def zero: Seq[(Long, Long, Double)] = Seq.empty
  override def reduce(b: Seq[(Long, Long, Double)], a: (Long, Long, Double)) =
    keep(b :+ a)
  override def merge(a: Seq[(Long, Long, Double)], b: Seq[(Long, Long, Double)]) =
    keep(a ++ b)
  override def finish(r: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    keep(r)
  override def bufferEncoder = seqEnc
  override def outputEncoder = seqEnc
}
