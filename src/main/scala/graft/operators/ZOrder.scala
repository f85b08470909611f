package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — multi-dimensional data clustering for
  * file skipping. Sorting/range-partitioning a 100 TB table by
  * `zvalue(x, y)` before the parquet write gives every output file a tight
  * bounding box in BOTH dimensions, so min/max footer stats prune scans
  * with predicates on either column — the standard layout optimization
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`) rebuilt as a plain Column
  * expression: pure integer bit math, codegen-friendly, zero shuffle of
  * its own (the write's range partitioner does the one shuffle).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of x lands at position 2i, bit i of y at 2i+1.
    * Inputs are clamped into [0, 2^bits) by masking — callers bucket raw
    * columns first (see `bucket`).
    */
  def zvalue(x: Column, y: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, "bits out of range")
    val mask = (1L << bits) - 1
    val xs = x.cast("long").bitwiseAND(lit(mask))
    val ys = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucket of a numeric column into [0, 2^bits): clamped
    * floor((v − lo) / width). The quantizer every z-order layout needs in
    * front of continuous columns.
    */
  def bucket(v: Column, lo: Double, width: Double, bits: Int = 10): Column = {
    val cells = (1L << bits) - 1
    least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0)), lit(cells.toDouble))
      .cast("long")
  }

  /** The same interleave as DuckDB SQL (for oracles): a sum of per-bit
    * terms — bit i of x scaled to 4^i, bit i of y to 2·4^i.
    */
  def zvalueSql(xExpr: String, yExpr: String, bits: Int = 10): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($xExpr) & $mask) >> $i & 1) * ${1L << (2 * i)}",
          s"((($yExpr) & $mask) >> $i & 1) * ${1L << (2 * i + 1)}")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }
}
