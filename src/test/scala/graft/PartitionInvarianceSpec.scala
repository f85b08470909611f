package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB determinism net: every query must produce BIT-IDENTICAL
  * rows regardless of parallelism — shuffle partition count, AQE on/off —
  * because a production cluster will never reproduce the test harness's
  * partition layout. The repo's arithmetic discipline (exact
  * integer/decimal partials, float ops once per output row on exact
  * operands) is exactly the property under test: a partition-order-
  * dependent double sum sneaking into any query fails here before it
  * flips a driver hash at some future SF.
  *
  * r6 ran a hand-picked 15-query sensitive set; this is the FULL gate
  * (VERDICT r6 item 3): every SparkEntry query minus an explicit,
  * justified exclusion list, so new queries are covered by default.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSession._

  /** Queries excluded with cause. Keep this list empty unless a query's
    * semantics are genuinely layout-dependent — nothing currently is.
    */
  private val excluded: Map[String, String] = Map.empty

  private def canon(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
      case f: Float => java.lang.Float.floatToRawIntBits(f).toString
      case s: Seq[_] => s.mkString("[", ",", "]")
      case v => v.toString
    }.mkString("|")).sorted.toSeq
  }

  test("every query is bit-identical across parallelism and AQE") {
    val gate = SparkEntry.queries.keys.toSeq.sorted.filterNot(excluded.contains)
    val conf = spark.conf
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      val baseline = gate.map(n => n -> canon(n)).toMap
      for ((parts, aqe) <- Seq(("7", "false"), ("13", "true"))) {
        conf.set("spark.sql.shuffle.partitions", parts)
        conf.set("spark.sql.adaptive.enabled", aqe)
        val diverged = gate.flatMap { n =>
          val got = canon(n)
          if (got == baseline(n)) None
          else Some(s"$n at shuffle.partitions=$parts aqe=$aqe")
        }
        assert(diverged.isEmpty,
          "partition-order-dependent computation crept into:\n" +
            diverged.mkString("\n"))
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", prevParts)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
