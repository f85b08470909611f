package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datastream._
import graft.table.TableEnvironment
import graft.windowing._

class DataStreamSpec extends AnyFunSuite {
  import TestSession._

  test("map/filter/flatMap/keyBy/reduce wordcount matches groupBy") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val words = env.fromCollection(Seq("a b a", "c b a"))
      .flatMap(_.split(" ").toSeq)
      .map(w => (w, 1L))
      .keyBy(_._1)
      .reduce((x, y) => (x._1, x._2 + y._2))
      .map { case (w, (_, n)) => (w, n) }
      .collect().toMap
    assert(words === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("typed two-input join combines matched pairs (IJoinFunction contract)") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val left = env.fromCollection(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val right = env.fromCollection(Seq((1L, 10), (2L, 20), (4L, 40)))
    val out = left.join(right)(_._1, _._1) { (l, r) => (l._2, r._2) }
      .collect().toSet
    assert(out === Set(("a", 10), ("b", 20))) // inner: unmatched keys drop
  }

  test("typed join against a small dimension plans as a broadcast hash join") {
    val df = graft.queries.DataStreamQueries.queries("q62_ds_typed_join")(
      spark, sfDir)
    df.head() // materialize so AQE settles the final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"typed join over a dim should broadcast:\n$plan")
  }

  test("rich lifecycle opens once per partition before first element") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val acc = spark.sparkContext.longAccumulator("opens")
    val out = env.fromDataset(spark.range(100).map(_.toInt).repartition(4))
      .mapRich(new RichMapFunction[Int, Int] {
        @transient private var opened = false
        override def open(): Unit = { opened = true; acc.add(1) }
        override def map(v: Int): Int = { assert(opened); v * 2 }
      })
      .collect()
    assert(out.sum === (0 until 100).map(_ * 2).sum)
    assert(acc.value === 4)
  }

  test("typed tumbling window reduce matches DataFrame window aggregation") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val data = Seq((1L, 100L, 1.0), (1L, 3600001L, 2.0), (1L, 200L, 3.0), (2L, 100L, 4.0))
    val typed = env.fromCollection(data)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows.of(Time.hours(1)), _._2)
      .reduce((a, b) => (a._1, a._2, a._3 + b._3))
      .map { case (k, ws, v) => (k, ws, v._3) }
      .collect().toSet
    assert(typed === Set((1L, 0L, 4.0), (1L, 3600000L, 2.0), (2L, 0L, 4.0)))
  }

  test("typed sliding window assigns size/slide windows per element") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val rows = env.fromCollection(Seq((1L, 7200000L, 1.0)))
      .keyBy(_._1)
      .window(SlidingEventTimeWindows.of(Time.hours(2), Time.hours(1)), _._2)
      .reduce((a, b) => a)
      .collect()
    assert(rows.map(_._2).toSet === Set(3600000L, 7200000L))
  }

  test("typed sliding path equals the Column window() on a non-divisible size/slide") {
    import spark.implicits._
    // size 10s / slide 4s: size is NOT a multiple of slide — the case
    // where a wrong assignment bound emits windows that end at or before
    // the element. Ground truth is Spark's own window() expression.
    val data = Seq.tabulate(40)(i => (1L, i * 1731L + 500L, 1L))
    val env = StreamExecutionEnvironment(spark)
    val typed = env.fromCollection(data)
      .keyBy(_._1)
      .window(SlidingEventTimeWindows.of(
        Time.milliseconds(10000), Time.milliseconds(4000)), _._2)
      .reduce((a, b) => (a._1, a._2, a._3 + b._3))
      .collect()
      .map(r => r._2 -> r._3._3).toMap
    val column = data.toDF("k", "ts", "one")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.timestamp_millis($"ts"),
        "10 seconds", "4 seconds"))
      .count()
      .select($"window.start".cast("long") * 1000, $"count")
      .as[(Long, Long)].collect().toMap
    assert(typed === column)
  }

  test("user-defined window assigner flows through reduce and process") {
    import spark.implicits._
    // Custom assigner nothing in graft.windowing knows about: "day parts"
    // — windows snap to fixed 8-hour shifts, plus elements in the last
    // hour of a shift ALSO belong to the next shift (handover overlap).
    // Only assignWindows is implemented; no DataStream code pattern-matches
    // on the type (the reference's open IWindowAssigner contract).
    object ShiftWindows extends WindowAssigner {
      private val eight = 8L * 3600000L
      override def groupingColumn(ts: org.apache.spark.sql.Column) = None
      override def assignWindows(ts: Long): Seq[TimeWindow] = {
        val start = TimeWindow.startFor(ts, eight, 0L)
        val base = TimeWindow(start, start + eight)
        if (ts >= base.end - 3600000L)
          Seq(base, TimeWindow(base.end, base.end + eight))
        else Seq(base)
      }
    }
    val env = StreamExecutionEnvironment(spark)
    val eight = 8L * 3600000L
    val data = Seq((1L, 100L, 1.0),            // shift 0 only
                   (1L, eight - 1800000L, 2.0), // handover: shift 0 AND 1
                   (1L, eight + 100L, 4.0))     // shift 1 only
    val reduced = env.fromCollection(data)
      .keyBy(_._1)
      .window(ShiftWindows, _._2)
      .reduce((a, b) => (a._1, a._2, a._3 + b._3))
      .map { case (k, ws, v) => (k, ws, v._3) }
      .collect().toSet
    assert(reduced === Set((1L, 0L, 3.0), (1L, eight, 6.0)))
    // process sees the custom window's real (start, end), not re-derived
    val fn = new ProcessWindowFunction[Long, (Long, Long, Double), (Long, Long, Long, Long)] {
      def process(key: Long, w: TimeWindow, els: Iterator[(Long, Long, Double)]) =
        Seq((key, w.start, w.end, els.size.toLong))
    }
    val processed = env.fromCollection(data)
      .keyBy(_._1)
      .window(ShiftWindows, _._2)
      .process(fn)
      .collect().toSet
    assert(processed === Set((1L, 0L, eight, 2L), (1L, eight, 2 * eight, 2L)))
  }

  test("session process function merges panes and exposes window metadata") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val fn = new ProcessWindowFunction[Long, (Long, Long), (Long, Long, Long)] {
      def process(key: Long, w: TimeWindow, els: Iterator[(Long, Long)]) =
        Seq((key, w.start, els.size.toLong))
    }
    val out = env.fromCollection(Seq((1L, 0L), (1L, 1000L), (1L, 10000000L)))
      .keyBy(_._1)
      .window(EventTimeSessionWindows.withGap(Time.minutes(30)), _._2)
      .process(fn)
      .collect().toSet
    assert(out === Set((1L, 0L, 2L), (1L, 10000000L, 1L)))
  }

  test("rich filter/flatMap run lifecycle; setParallelism repartitions") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val opens = spark.sparkContext.longAccumulator("rf-opens")
    val out = env.fromDataset(spark.range(20).map(_.toInt).repartition(2))
      .filterRich(new RichFilterFunction[Int] {
        override def open(): Unit = opens.add(1)
        override def filter(v: Int): Boolean = v % 2 == 0
      })
      .flatMapRich(new RichFlatMapFunction[Int, Int] {
        override def flatMap(v: Int): IterableOnce[Int] = Seq(v, v)
      })
      .setParallelism(5)
    assert(out.collect().sorted === (0 until 20 by 2).flatMap(v => Seq(v, v)).sorted)
    // one action ran; filterRich opened once per input partition
    assert(opens.value === 2)
    assert(out.ds.rdd.getNumPartitions === 5)
  }

  test("count evictor trims each pane to the last N elements by time") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val fn = new ProcessWindowFunction[Long, (Long, Long, Double), (Long, Long, Double)] {
      def process(key: Long, w: TimeWindow, els: Iterator[(Long, Long, Double)]) = {
        val seq = els.toSeq
        Seq((key, w.start, seq.map(_._3).sum))
      }
    }
    val data = Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (1L, 300L, 4.0), (1L, 3600100L, 8.0))
    val out = env.fromCollection(data)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows.of(Time.hours(1)), _._2)
      .evictor(CountEvictor.of(2))
      .process(fn)
      .collect().toSet
    // window [0,1h): last 2 of (1,2,4) -> 2+4; window [1h,2h): just 8
    assert(out === Set((1L, 0L, 6.0), (1L, 3600000L, 8.0)))
  }

  test("time evictor drops the stale head of each pane before the window fn") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val fn = new ProcessWindowFunction[Long, (Long, Long, Double), (Long, Long, Double)] {
      def process(key: Long, w: TimeWindow, els: Iterator[(Long, Long, Double)]) =
        Seq((key, w.start, els.map(_._3).sum))
    }
    // one 1h window; newest element at t=59min → TimeEvictor(10min) keeps
    // only elements within [49min, 59min]
    val m = 60000L
    val data = Seq((1L, 1 * m, 1.0), (1L, 30 * m, 2.0), (1L, 52 * m, 4.0), (1L, 59 * m, 8.0))
    val out = env.fromCollection(data)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows.of(Time.hours(1)), _._2)
      .evictor(TimeEvictor.of(10 * m, (e: (Long, Long, Double)) => e._2))
      .process(fn)
      .collect().toSet
    assert(out === Set((1L, 0L, 12.0)))
  }

  test("allowedLateness declares on event-time windows, rejects global") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val ks = env.fromCollection(Seq((1L, 1L))).keyBy(_._1)
    ks.window(TumblingEventTimeWindows.of(Time.hours(1)), _._2)
      .allowedLateness(Time.minutes(5)) // fine
    assertThrows[IllegalArgumentException] {
      ks.window(GlobalWindows, _._2).allowedLateness(Time.minutes(5))
    }
  }

  test("windowed aggregate runs the accumulator contract per pane") {
    import spark.implicits._
    val env = StreamExecutionEnvironment(spark)
    val avg = new graft.operators.AggregateFunction[(Long, Long, Double), (Double, Long), Double] {
      def createAccumulator() = (0.0, 0L)
      def add(a: (Double, Long), v: (Long, Long, Double)) = (a._1 + v._3, a._2 + 1)
      def getResult(a: (Double, Long)) = if (a._2 == 0) 0.0 else a._1 / a._2
      def merge(a: (Double, Long), b: (Double, Long)) = (a._1 + b._1, a._2 + b._2)
    }
    val out = env.fromCollection(Seq((1L, 100L, 2.0), (1L, 200L, 4.0), (1L, 3600500L, 9.0)))
      .keyBy(_._1)
      .window(TumblingEventTimeWindows.of(Time.hours(1)), _._2)
      .aggregate(avg)
      .collect().toSet
    assert(out === Set((1L, 0L, 3.0), (1L, 3600000L, 9.0)))
  }

  test("scalar UDFs register through spark.udf for the SQL surface (§2.11)") {
    spark.udf.register("double_it", (x: Long) => x * 2)
    assert(spark.sql("SELECT double_it(21)").head().getLong(0) === 42L)
  }

  test("native expressions are callable from SQL after registration") {
    graft.llm.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT word_shingles('a b c d', 3) AS sh,
         minhash_signature(word_shingles('a b c d', 3), 8) AS mh""").head()
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(row.getSeq[String](1).length === 8)
    assert(row.getSeq[String](1).forall(_.matches("[0-9a-f]{8}")))
  }

  test("GraftExtensions injects every native fn at session build (spark.sql.extensions)") {
    // a FRESH session built with ONLY the extensions applied — SQL-only
    // users (thrift server, notebooks) get the functions without touching
    // Scala. Builder.getOrCreate returns the active session if one is
    // set, so clear and restore around the build (same SparkContext).
    import org.apache.spark.sql.classic.{SparkSession => CS}
    val prevDefault = CS.getDefaultSession
    val prevActive = CS.getActiveSession
    CS.clearDefaultSession(); CS.clearActiveSession()
    val s2 =
      try org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_)).getOrCreate()
      finally {
        prevDefault.foreach(CS.setDefaultSession)
        prevActive.foreach(CS.setActiveSession)
      }
    val row = s2.sql(
      """SELECT word_shingles('a b c d', 2) AS sh,
         cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
         simhash(array('x', 'y'), 16) AS sh16,
         size(hyperplane_band_buckets(array(1.0d, 2.0d), 4, 4, 2)) AS nb""").head()
    assert(row.getSeq[String](0) === Seq("a b", "b c", "c d"))
    assert(row.getDouble(1) === 1.0)
    assert(row.getLong(2) >= 0L && row.getLong(2) <= 65535L)
    assert(row.getInt(3) === 4)
  }

  test("TableEnvironment registers, lists, queries and fetches tables") {
    import spark.implicits._
    val env = TableEnvironment.create(spark)
    env.fromDataStream("t_nums", spark.range(10).toDF("n"))
    assert(env.listTables().contains("t_nums"))
    assert(env.getTable("t_nums").isDefined)
    assert(env.getTable("nope").isEmpty)
    assert(env.sqlQuery("SELECT sum(n) s FROM t_nums").head().getLong(0) === 45L)
  }
}
