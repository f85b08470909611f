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
  * per-record watermarks (WatermarkManager.cs:108-140) are NOT expressible —
  * approximated by a zero/small delay; divergence documented per SURVEY §7.4.
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

  private final case class Bounded(delay: Time) extends WatermarkStrategy
}
