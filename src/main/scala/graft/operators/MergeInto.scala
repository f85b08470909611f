package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch `MERGE INTO` semantics (ANSI SQL:2003 / Delta-Hudi-Iceberg
  * style): apply a keyed delta of upserts and delete tombstones to a base
  * snapshot in ONE full-outer pass —
  *
  *   WHEN MATCHED AND op = 'D'  THEN DELETE
  *   WHEN MATCHED               THEN UPDATE SET * (delta row wins)
  *   WHEN NOT MATCHED AND op ≠ 'D' THEN INSERT *
  *
  * Complements `q128`'s changelog COMPACTION (latest-per-key fold of many
  * change rows): merge applies ONE resolved change row per key against an
  * existing table — the nightly-apply half of the incremental-table
  * lifecycle, where compaction is the intra-batch half.
  *
  * Reference scope: FLINK.NET exposes sinks, not table maintenance; this
  * sits in the "beyond the reference" pipeline tier (SURVEY §8 extension
  * tables).
  *
  * Scale shape: one equi-key full-outer shuffle (AQE-planned — broadcast
  * when the delta is small, skew-split when a key floods), then a narrow
  * classify/select; no window, no driver state. The output carries a
  * `_class` column (`kept/updated/inserted/deleted`) so audits aggregate
  * from the same pass that produced the rows — deleted rows surface with
  * their BASE values for the audit and are filtered by writers.
  *
  * Contract: `delta` has the base schema plus `opCol` ∈ {'U','I','D'}
  * (U and I both upsert — the class column reports which one actually
  * happened), at most one delta row per key (enforce upstream via q128
  * compaction), and non-null keys on both sides.
  */
object MergeInto {

  def apply(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
            opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = base.columns.filterNot(keyCols.contains).toSeq
    require(valueCols.nonEmpty, "base must carry non-key columns")
    val b = base.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(s"_b_$c"))
        :+ lit(1).as("_b_present"): _*) // all-null value rows still count
    val d = delta.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(s"_d_$c"))
        ++ Seq(col(opCol).as("_op"), lit(1).as("_d_present")): _*)
    val joined = b.join(d, keyCols, "full_outer")
    val inBase = col("_b_present").isNotNull
    val inDelta = col("_d_present").isNotNull
    // a delta row with a null op is a contract violation — fail loudly at
    // evaluation instead of silently classifying it as 'kept' (matched
    // keys would ignore the delta; unmatched keys would emit an all-null
    // 'kept' row)
    val cls = when(inDelta && col("_op").isNull,
        raise_error(concat(lit(s"MergeInto: null $opCol in delta for key "),
          concat_ws(",", keyCols.map(c => col(c).cast("string")): _*))))
      .when(inDelta && col("_op") === "D",
        when(inBase, lit("deleted")).otherwise(lit("noop")))
      .when(inDelta && inBase, lit("updated"))
      .when(inDelta, lit("inserted"))
      .otherwise(lit("kept"))
    val values = valueCols.map { c =>
      // deleted rows keep BASE values (audit surface); upserts take delta
      when(cls === "updated" || cls === "inserted", col(s"_d_$c"))
        .otherwise(col(s"_b_$c")).as(c)
    }
    joined
      .select(keyCols.map(col) ++ values :+ cls.as("_class"): _*)
      .where(col("_class") =!= "noop") // delete of a missing key: no row
  }

  /** The applied table a writer would persist: merge minus tombstones. */
  def applied(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
              opCol: String): DataFrame =
    apply(base, delta, keyCols, opCol)
      .where(col("_class") =!= "deleted").drop("_class")
}
