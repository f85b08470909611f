package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.windowing._

class WindowingSpec extends AnyFunSuite {
  import TestSession._

  /** Reference start formula (TimeWindow.cs:76-89):
    * start = ts - (ts - offset + size) % size, for offset < size.
    */
  private def refWindowStart(tsMs: Long, sizeMs: Long, offsetMs: Long): Long = {
    val rem = (tsMs - offsetMs + sizeMs) % sizeMs
    tsMs - (if (rem < 0) rem + sizeMs else rem)
  }

  test("Spark window() start matches the reference epoch-aligned formula") {
    val rnd = new scala.util.Random(42)
    val configs = Seq((1000L, 0L), (3600000L, 0L), (86400000L, 0L), (3600000L, 900000L))
    for ((size, off) <- configs) {
      val samples = Seq.fill(25)(math.abs(rnd.nextLong()) % 4102444800000L) :+
        size :+ (size + off) :+ 0L  // boundary cases
      val got = spark.createDataFrame(samples.map(Tuple1(_))).toDF("ms")
        .select(col("ms"), unix_millis(
          window(timestamp_millis(col("ms")), s"$size milliseconds",
                 s"$size milliseconds", s"$off milliseconds")
            .getField("start")).as("w_start"))
        .collect()
      got.foreach { r =>
        val (ts, ws) = (r.getLong(0), r.getLong(1))
        assert(ws === refWindowStart(ts, size, off),
          s"ts=$ts size=$size off=$off")
        assert(ws <= ts && ts < ws + size)
      }
    }
  }

  test("session windows merge iff gap < threshold") {
    import spark.implicits._
    // user 1: events at 0s, 10s (merge), 3600s (new session)
    val df = Seq((1L, 0L), (1L, 10000L), (1L, 3600000L))
      .toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
    assert(df.count() === 2)
  }

  test("window queries all run with stable schemas") {
    graft.queries.WindowQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("Time factories produce ms-precision durations (Time.cs:8-56)") {
    assert(Time.seconds(2).millis === 2000L)
    assert(Time.minutes(3).millis === 180000L)
    assert(Time.hours(1).millis === 3600000L)
    assert(Time.days(1).millis === 86400000L)
  }

  test("assigners produce grouping expressions; global produces none") {
    assert(TumblingEventTimeWindows.of(Time.hours(1)).groupingColumn(col("ts")).isDefined)
    assert(SlidingEventTimeWindows.of(Time.hours(2), Time.hours(1)).groupingColumn(col("ts")).isDefined)
    assert(EventTimeSessionWindows.withGap(Time.minutes(5)).groupingColumn(col("ts")).isDefined)
    assert(GlobalWindows.groupingColumn(col("ts")).isEmpty)
    assert(!GlobalWindows.isEventTime)
  }
}
