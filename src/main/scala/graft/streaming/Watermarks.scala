package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.windowing.Time

/** Watermark strategy surface (SURVEY §2.7) mirroring the reference's
  * `WatermarkStrategy<T>` factories (FlinkDotNet.Core/Windowing/
  * WatermarkManager.cs:210-275).
  *
  * Spark derives the watermark per micro-batch as max(eventTime) − delay,
  * which IS the reference's `MonotonicWatermarkGenerator` (wm = max(ts) −
  * outOfOrderness, IWatermarkGenerator.cs:15+). Periodic emission
  * (WatermarkManager.cs:145-205) is the per-batch cadence. Punctuated
  * per-record watermarks (WatermarkManager.cs:108-140) are expressed by
  * deriving the watermark COLUMN from marker records only (`forPunctuated`):
  * max() ignores the nulls non-markers project, so a batch without a marker
  * leaves the watermark where the last marker put it — per-record
  * punctuation quantized to micro-batch boundaries (the SURVEY §7.4
  * divergence, now bounded by batch granularity instead of unsupported).
  * Multi-input alignment (global wm = min over inputs,
  * WatermarkManager.cs:57) is Spark's default `multipleWatermarkPolicy=min`.
  */
sealed trait WatermarkStrategy extends Serializable {
  def delay: Time
  /** Attach to a streaming frame's event-time column. */
  def assign(df: DataFrame, tsCol: String): DataFrame =
    df.withWatermark(tsCol, s"${delay.millis} milliseconds")
}

object WatermarkStrategy {
  /** ForMonotonousTimestamps: no out-of-orderness tolerated. */
  def forMonotonousTimestamps(): WatermarkStrategy =
    Bounded(Time.milliseconds(1))
  /** ForBoundedOutOfOrderness(delay). */
  def forBoundedOutOfOrderness(delay: Time): WatermarkStrategy = Bounded(delay)

  /** Punctuated (PunctuatedWatermarkGenerator, WatermarkManager.cs:108-140):
    * ONLY records satisfying `isMarker` advance the watermark, to their
    * event time − delay. Ordinary records buffer but never close windows —
    * the source explicitly signals completeness, e.g. end-of-epoch control
    * records in a CDC feed.
    *
    * LIMITATION: the watermark lives on the synthetic `__punct_ts` column
    * (markers only), so downstream operators that must find event-time
    * metadata on their own column — an append-mode windowed aggregation
    * over `tsCol`, `dropDuplicatesWithinWatermark(tsCol)` — should window
    * on `__punct_ts`-aware columns or use a Bounded strategy; plain
    * transformWithState/mapGroupsWithState consumers (which read the
    * GLOBAL watermark from timers) work as-is, which is what the spec
    * exercises.
    */
  def forPunctuated(isMarker: org.apache.spark.sql.Column,
                    delay: Time): WatermarkStrategy = Punctuated(isMarker, delay)

  private final case class Bounded(delay: Time) extends WatermarkStrategy

  private final case class Punctuated(isMarker: org.apache.spark.sql.Column,
                                      delay: Time) extends WatermarkStrategy {
    override def assign(df: DataFrame, tsCol: String): DataFrame = {
      import org.apache.spark.sql.functions._
      df.withColumn("__punct_ts", when(isMarker, col(tsCol)))
        .withWatermark("__punct_ts", s"${delay.millis} milliseconds")
    }
  }
}
