package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.5 interval-join row).
  *
  * Spark bounds stream-stream join state with watermarks plus a time-range
  * condition: each side keeps only rows younger than the watermark minus the
  * interval, so state is O(rate × interval) regardless of total volume —
  * the property that makes the join run forever at scale.
  */
object StreamJoins {

  /** Interval join: left ⋈ right on `key` where
    * right.ts ∈ [left.ts − lowerMs, left.ts + upperMs].
    * Both inputs MUST carry watermarks (use WatermarkStrategy.assign).
    *
    * `joinType` extends the matrix to the outer faces ("leftOuter",
    * "rightOuter", "fullOuter"): an unmatched row emits with nulls once
    * the watermark proves no in-range partner can still arrive — i.e.
    * when its join state expires, which is exactly the time-range bound.
    * Spark requires the range condition on BOTH outer sides' event-time
    * columns for that proof; this condition form satisfies it.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String, leftTs: String, rightTs: String,
                   lowerMs: Long, upperMs: Long,
                   joinType: String = "inner"): DataFrame = {
    val cond =
      left(keyCol) === right(keyCol) &&
        right(rightTs) >= left(leftTs) - expr(s"INTERVAL $lowerMs MILLISECONDS") &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $upperMs MILLISECONDS")
    left.join(right, cond, joinType).drop(right(keyCol))
  }

  /** BATCH interval join in equi-join shape: right.ts ∈ [left.ts,
    * left.ts + upperMs] on a shared key. A naive (key, range-predicate)
    * join is an equi-join on key only — one hot key degenerates to a
    * per-key cross product. Bucketing time into `upperMs`-wide windows
    * makes (key, bucket) the join key: each left row explodes into the ≤2
    * buckets its interval can touch, the join is a plain shuffled
    * hash/sort-merge join, and the exact bound filters after the match.
    * Candidate volume is O(rows × pairs-per-2-buckets), never per-key n².
    * Columns: left* prefixed `a_`, right* `b_` for the caller to select.
    */
  def bucketedIntervalJoin(left: DataFrame, right: DataFrame,
                           keyCol: String, tsCol: String,
                           upperMs: Long): DataFrame = {
    require(upperMs > 0)
    val w = upperMs
    val la = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .withColumn("__bucket", explode(array_distinct(array(
        floor(unix_millis(col(s"a_$tsCol")) / w),
        floor((unix_millis(col(s"a_$tsCol")) + w) / w)))))
      .withColumn("__key", col(s"a_$keyCol"))
    val rb = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      .withColumn("__bucket", floor(unix_millis(col(s"b_$tsCol")) / w))
      .withColumn("__key", col(s"b_$keyCol"))
    la.join(rb, Seq("__key", "__bucket"))
      .where(col(s"b_$tsCol") >= col(s"a_$tsCol") &&
        unix_millis(col(s"b_$tsCol")) - unix_millis(col(s"a_$tsCol")) <= w)
      .drop("__key", "__bucket")
  }
}

/** Skew mitigation for heavy-hitter join keys (SURVEY §4: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join handles sort-merge cases at
  * runtime; explicit salting is for when one side is broadcast-sized but a
  * handful of keys dominate the big side's shuffle.
  */
object Salting {

  /** Join `big` to `small` on `key`, exploding `small` across `salts`
    * replicas and salting `big` rows randomly-but-deterministically (hash of
    * a row-unique column), so each hot key spreads over `salts` reducers.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltSourceCol: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(col(saltSourceCol)), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
