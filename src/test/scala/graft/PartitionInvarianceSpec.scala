package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB determinism net: every numerically-sensitive query must
  * produce BIT-IDENTICAL rows regardless of parallelism — shuffle
  * partition count, AQE on/off — because a production cluster will never
  * reproduce the test harness's partition layout. The repo's arithmetic
  * discipline (exact integer/decimal partials, float ops once per
  * output row on exact operands) is exactly the property under test: a
  * partition-order-dependent double sum sneaking into one of these
  * queries fails here before it flips a driver hash at some future SF.
  *
  * Queries chosen for sensitivity: float-heavy aggregates (q95 moments,
  * q131 regression, q110 z-scores, q171 Welch, q143 PSI), ordered folds
  * (q158 EWMA, q172 Holt), windowed exact-cents pipelines (q179
  * decomposition, q181 LTV, q138 Pareto), percentile-boundary assignment
  * (q170, q137), and the Gini rank pipeline (q178).
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSession._

  private val sensitive = Seq(
    "q95_stats_exact", "q110_anomaly_zscore", "q131_regression",
    "q137_rfm", "q138_pareto", "q143_psi_drift", "q158_ewma",
    "q170_decile_lift", "q171_welch_ttest", "q172_holt_trend",
    "q178_skew_report", "q179_seasonal_decompose", "q181_cohort_ltv",
    "q182_forecast_backtest", "q185_benford")

  private def canon(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
      case f: Float => java.lang.Float.floatToRawIntBits(f).toString
      case v => v.toString
    }.mkString("|")).sorted.toSeq
  }

  test("sensitive queries are bit-identical across parallelism and AQE") {
    val conf = spark.conf
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      val baseline = sensitive.map(n => n -> canon(n)).toMap
      for ((parts, aqe) <- Seq(("7", "false"), ("13", "true"))) {
        conf.set("spark.sql.shuffle.partitions", parts)
        conf.set("spark.sql.adaptive.enabled", aqe)
        sensitive.foreach { n =>
          val got = canon(n)
          assert(got === baseline(n),
            s"$n diverged at shuffle.partitions=$parts aqe=$aqe — " +
              "a partition-order-dependent computation crept in")
        }
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", prevParts)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
