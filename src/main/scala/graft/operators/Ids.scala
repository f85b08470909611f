package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous global row numbering at scale — the distributed
  * zipWithIndex. The naive `row_number().over(Window.orderBy(k))` drags
  * the ENTIRE table into one partition (the classic 100 TB killer). A
  * window over `spark_partition_id()` avoids that but pays a SECOND
  * full-table shuffle (hash on the partition id — Catalyst can't see it's
  * already satisfied by the range exchange). The one-shuffle shape is
  * RDD `zipWithIndex` over the range-sorted table:
  *
  *   1. range-repartition + in-partition sort on the order key — the same
  *      single shuffle a global ORDER BY pays;
  *   2. zipWithIndex: one lightweight count job for per-partition sizes
  *      (a partition-count array on the driver, never row data), then a
  *      narrow map adding offset + local index.
  *
  * Ids depend only on the global order of the unique key — range boundary
  * placement cancels out — so the result is deterministic end-to-end.
  * Training pipelines use this for stable example ids, shard manifests,
  * and resumable iteration order. This is one of the rare
  * per-partition-imperative cases where the RDD layer is the right tool
  * (SURVEY §7.1): the operation is "index rows in partition order",
  * which no declarative operator expresses without an extra shuffle.
  */
object Ids {

  /** (original columns…, `idCol`) with `idCol` = 1..N in `orderCol` order.
    * `orderCol` must be unique (ids are then deterministic end-to-end).
    */
  def contiguousRowIds(df: DataFrame, orderCol: String,
                       idCol: String = "rid"): DataFrame = {
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
