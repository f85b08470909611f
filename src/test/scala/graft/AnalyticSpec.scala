package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.AnalyticQueries

/** Specs for the round-4 analytic widening (q89–q97): semantics the
  * DuckDB oracle can't see (plan shapes, reshaping inverses) plus value
  * sanity at sf0.001.
  */
class AnalyticSpec extends AnyFunSuite {
  import TestSession._

  test("every analytic query runs and has an oracle") {
    AnalyticQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
      assert(AnalyticQueries.oracles.contains(name), s"$name lacks an oracle")
    }
  }

  test("pivot with explicit values adds no discovery pass and stays partial-agg'd") {
    val df = AnalyticQueries.queries("q89_pivot")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // two keyed exchanges, both fed by map-side partial aggregates over
    // the (source, lang) cardinality — nothing row-scale crosses the wire
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2,
      s"pivot with explicit values must not add discovery passes:\n$plan")
    assert(plan.contains("partial_count") && plan.contains("partial_pivotfirst"),
      s"pivot exchanges must carry partial aggregates:\n$plan")
    // every cell non-null after fill, row sums equal the doc count
    val rows = df.collect()
    val langs = Seq("de", "en", "es", "fr", "zh")
    val total = rows.map(r => langs.map(l => r.getAs[Long](l)).sum).sum
    val docs = graft.core.Tables.documents(spark, sfDir).count()
    assert(total === docs, "pivot cells must partition the corpus")
  }

  test("unpivot is pivot's inverse on the metric axis") {
    val long = AnalyticQueries.queries("q97_unpivot")(spark, sfDir)
    val n = graft.core.Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 49.0).count()
    assert(long.count() === 3 * n, "3 metric rows per source row")
    assert(long.select("metric").distinct().count() === 3)
    // melting is lossless: re-widening recovers the quantity column
    val wide = long.groupBy("l_orderkey", "l_linenumber")
      .pivot("metric", Seq("l_quantity")).agg(first(col("val")))
    assert(wide.filter(col("l_quantity") <= 49.0).count() === 0)
  }

  test("fuzzy dedup join is blocked: equi-join on (brand,size), not a cartesian") {
    val df = AnalyticQueries.queries("q90_fuzzy_dedup")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"blocking key must make this an equi-join:\n$plan")
    // self-distance is 0 but k_a<k_b excludes it; pairs are symmetric-free
    // (at sf0.001 the blocks may hold no qualifying pair — sum is null then)
    val pairs = df.agg(coalesce(sum("n_pairs"), lit(0L))).head.getLong(0)
    assert(pairs >= 0)
  }

  test("argmax picks the value at the max key, deterministically") {
    val rows = AnalyticQueries.queries("q91_argmax")(spark, sfDir).collect()
    val orders = graft.core.Tables.orders(spark, sfDir)
    rows.foreach { r =>
      val pri = r.getAs[String]("o_orderpriority")
      val expect = orders.filter(col("o_orderpriority") === pri)
        .orderBy(col("o_orderkey").desc).select("o_totalprice").head.getDouble(0)
      assert(r.getAs[Double]("latest_price") === expect, s"argmax mismatch for $pri")
    }
  }

  test("window suite: percent_rank/cume_dist bounds, full-frame first/last") {
    val rows = AnalyticQueries.queries("q92_window_suite")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getAs[Double]("pct_rank"); val cd = r.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      assert(r.getAs[Long]("first_key") <= r.getAs[Long]("last_key"))
    }
    // last_key must be the PARTITION max (full frame), not the running max
    val byPri = rows.groupBy(_.getAs[String]("o_orderpriority"))
    byPri.foreach { case (_, rs) =>
      val maxKey = rs.map(_.getAs[Long]("o_orderkey")).max
      assert(rs.forall(_.getAs[Long]("last_key") == maxKey))
    }
  }

  test("row ids are contiguous and never use a single-partition sort window") {
    val df = AnalyticQueries.queries("q100_row_ids")(spark, sfDir)
    // the 100 TB killer this operator exists to avoid: a global window
    // serializes the table into ONE partition. zipWithIndex keeps the
    // range layout — at sf0.001 AQE (correctly) coalesces the tiny
    // exchange, so pin it off to observe the partitioning itself.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assert(
      AnalyticQueries.queries("q100_row_ids")(spark, sfDir).rdd.getNumPartitions > 1,
      "global row numbering must not serialize the table")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val n = df.count()
    val stats = df.agg(min("rid"), max("rid"), countDistinct("rid")).head
    assert(stats.getLong(0) === 1L && stats.getLong(1) === n &&
      stats.getLong(2) === n, "ids must be exactly 1..N")
    // id order matches key order
    val rows = df.orderBy("rid").select("o_orderkey").collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted), "rid order must follow the key order")
  }

  test("grouping sets: each set's rows re-aggregate the same table; flags disambiguate") {
    val rows = AnalyticQueries.queries("q101_grouping_sets")(spark, sfDir).collect()
    val total = graft.core.Tables.orders(spark, sfDir).count()
    // the () set is one row counting everything; each single-column set
    // partitions the table
    val grand = rows.filter(r => r.getAs[Long]("g_status") == 1 && r.getAs[Long]("g_priority") == 1)
    assert(grand.length === 1 && grand.head.getAs[Long]("n") === total)
    val bySet = rows.filterNot(grand.contains).groupBy(r =>
      (r.getAs[Long]("g_status"), r.getAs[Long]("g_priority")))
    assert(bySet.keySet === Set((0L, 1L), (1L, 0L)))
    bySet.values.foreach(rs => assert(rs.map(_.getAs[Long]("n")).sum === total))
  }

  test("gap-fill: grid is dense per user, filled value carries across empty hours") {
    val rows = AnalyticQueries.queries("q102_gapfill")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[Long]("hour_s")).sorted
      // dense hourly grid: consecutive steps of exactly 3600 s
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600L },
        "grid must have no gaps")
      // forward fill: never null after the first (observed) hour
      assert(rs.forall(r => !r.isNullAt(r.fieldIndex("filled"))))
      // empty hours exist in the fixture and carry the previous value
      val byHour = rs.sortBy(_.getAs[Long]("hour_s"))
      val gapCarries = byHour.zip(byHour.tail).filter(_._2.getAs[Long]("n_obs") == 0L)
      gapCarries.foreach { case (prev, cur) =>
        assert(cur.getAs[Double]("filled") === prev.getAs[Double]("filled"),
          "an unobserved hour must carry the previous filled value")
      }
    }
  }

  test("funnel: fold form equals the 3-stage join-chain form; steps monotone") {
    val row = AnalyticQueries.queries("q103_funnel")(spark, sfDir).head()
    val (s1, s2, s3) = (row.getAs[Long]("step1_users"),
      row.getAs[Long]("step2_users"), row.getAs[Long]("step3_users"))
    assert(s1 >= s2 && s2 >= s3, "funnel steps must be non-increasing")
    assert(s1 > 0, "fixture has signups")
    // independent computation via the oracle's join-chain shape
    val gap = 12L * 3600L * 1000000L
    val e = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val c1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("t")).as("t1"))
    val c2 = e.filter(col("event_type") === "click").join(c1, "user_id")
      .filter(col("t") > col("t1") && col("t") - col("t1") <= gap)
      .groupBy("user_id").agg(min(col("t")).as("t2"))
    val c3 = e.filter(col("event_type") === "purchase").join(c2, "user_id")
      .filter(col("t") > col("t2") && col("t") - col("t2") <= gap)
      .groupBy("user_id").agg(min(col("t")).as("t3"))
    assert((c1.count(), c2.count(), c3.count()) === ((s1, s2, s3)),
      "sorted fold must equal the join-chain funnel")
    val expectedUs = c3.join(c1, "user_id")
      .agg(coalesce(sum(col("t3") - col("t1")), lit(0L))).head().getLong(0)
    assert(row.getAs[Long]("total_convert_us") === expectedUs)
  }

  test("retention: week-0 equals cohort size; no negative offsets; never exceeds cohort") {
    val rows = AnalyticQueries.queries("q104_retention")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("week_k") >= 0L))
    val users = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_s"))
    // every user appears in exactly one cohort's week-0 row
    val week0Total = byCohort.values
      .map(_.find(_.getAs[Long]("week_k") == 0L).map(_.getAs[Long]("active_users")).getOrElse(0L))
      .sum
    assert(week0Total === users, "week-0 rows must partition all users into cohorts")
    byCohort.values.foreach { rs =>
      val size = rs.find(_.getAs[Long]("week_k") == 0L).get.getAs[Long]("active_users")
      assert(rs.forall(_.getAs[Long]("active_users") <= size),
        "retention can never exceed cohort size")
    }
  }

  test("triangles: planted K4, and orientation bounds the hub's wedge fan-out") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) plus pendant edge 4-5 (0 new)
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L))
      .toDF("u", "v")
    val s = graft.operators.Triangles.summary(k4).head()
    assert((s.getAs[Long]("n_nodes"), s.getAs[Long]("n_edges"),
      s.getAs[Long]("n_triangles")) === ((5L, 7L, 4L)))
    // wedges: deg 3,3,3,4,1 → 3+3+3+6+0 = 15
    assert(s.getAs[Long]("n_wedges") === 15L)

    // star: hub 0 with 40 leaves, plus one leaf-leaf edge → 1 triangle.
    // Unoriented, the hub fans out C(40,2)=780 wedges; oriented, the hub
    // ranks HIGHEST (max degree) so every edge points leaf→hub and the
    // hub emits zero wedges — out-degrees stay ≤ 2 everywhere.
    val star = ((1L to 40L).map(l => (0L, l)) :+ (1L, 2L)).toDF("u", "v")
    val ss = graft.operators.Triangles.summary(star).head()
    assert(ss.getAs[Long]("n_triangles") === 1L)
    val maxOut = graft.operators.Triangles.orientedOutDegrees(star)
      .agg(max($"out_d")).head().getLong(0)
    assert(maxOut <= 2L, s"orientation must defuse the hub (max out-degree $maxOut)")
  }

  test("pagerank: cycle fixed point, hand-computed star ranks, partition-invariant") {
    import spark.implicits._
    // directed 3-cycle: od=1 everywhere → p1 = 150000 + (1e6*17) div 20
    // = 1000000 exactly; unit ranks are a fixed point of the quantized map
    val cycle = Seq((1L,2L),(2L,3L),(3L,1L)).toDF("src","dst")
    val cr = graft.operators.PageRank.ranks(cycle, iters = 3).collect()
    assert(cr.length === 3 && cr.forall(_.getAs[Long]("pr") === 1000000L))

    // symmetrized star 0–{1,2,3}: hand-quantized rounds
    // p1: hub = 150000 + 3*850000 = 2700000
    //     leaf = 150000 + 17000000 div 60 = 433333
    // p2: hub = 150000 + 3*(433333*17 div 20) = 150000 + 3*368333 = 1254999
    //     leaf = 150000 + (2700000*17) div (20*3) = 915000
    val star = Seq((0L,1L),(0L,2L),(0L,3L),(1L,0L),(2L,0L),(3L,0L)).toDF("src","dst")
    val sr = graft.operators.PageRank.ranks(star, iters = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(sr(0L) === 1254999L)
    assert(Seq(1L,2L,3L).forall(sr(_) === 915000L))

    // quantized arithmetic ⇒ bit-identical under any partitioning
    val g = AnalyticQueries.queries("q106_pagerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("v")), Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2).select(col("u"), col("v"))
    val shuffled = pairs.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
      .repartition(7)
    val g2 = graft.operators.PageRank.ranks(shuffled, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(g.sameElements(g2), "ranks must not depend on partition layout")
  }

  test("histogram buckets partition the table; stats formula matches Spark's corr") {
    val h = AnalyticQueries.queries("q94_histogram")(spark, sfDir)
    assert(h.agg(sum("n")).head.getLong(0) ===
      graft.core.Tables.orders(spark, sfDir).count())
    // exact-sum corr agrees with Spark's streaming corr to float tolerance
    val exact = AnalyticQueries.queries("q95_stats_exact")(spark, sfDir)
      .select("l_returnflag", "corr_qty_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val spark_ = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(corr("l_quantity", "l_extendedprice").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(v - spark_(k)) < 1e-9, s"corr disagrees for $k: $v vs ${spark_(k)}")
    }
  }

  test("top-k per group is a bounded aggregate, not a ranking window") {
    val df = AnalyticQueries.queries("q116_topk_per_group")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"top-k must not rank through a window sort:\n$plan")
    assert(plan.contains("partial_topkaggregator") ||
      plan.toLowerCase.contains("partial_"),
      s"aggregator must run map-side partials:\n$plan")
    // values agree with the window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= 3)
      .select("o_orderpriority", "pos", "o_orderkey", "o_totalprice")
    assert(df.exceptAll(ref).isEmpty && ref.exceptAll(df).isEmpty,
      "bounded top-k must equal the ranking-window result")
  }

  test("ratio-to-report shares sum to 1 per month") {
    val df = AnalyticQueries.queries("q117_ratio_to_report")(spark, sfDir)
    df.groupBy(col("month")).agg(sum(col("share")).as("s")).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"shares must sum to 1: $r")
    }
  }

  test("moving window sums exactly the trailing 7 days, gaps included") {
    val df = AnalyticQueries.queries("q118_moving_window")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getDecimal(3)))
    val byKey = df.groupBy(_._1)
    byKey.foreach { case (_, rows) =>
      val daily = rows.map(r => r._2 -> r._3).toMap
      rows.foreach { case (_, day, _, rev7) =>
        val expected = daily.filter { case (d, _) =>
          d >= day - 6L * 86400000L && d <= day }.values
          .map(BigDecimal(_)).sum
        assert(BigDecimal(rev7) == expected,
          s"trailing sum wrong at $day: $rev7 vs $expected")
      }
    }
  }

  test("scd2 build: dense versions, one open range, chained validity, real changes") {
    val rows = graft.queries.AnalyticQueries.queries("q142_scd2_build")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("version"),
        r.getAs[String]("priority"), r.getAs[java.time.LocalDateTime]("valid_from"),
        r.getAs[java.time.LocalDateTime]("valid_to")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to vs.length).toSeq,
        s"cust $cust versions not dense")
      assert(sorted.count(_._5 == null) === 1, s"cust $cust open ranges != 1")
      assert(sorted.last._5 == null, s"cust $cust open range must be latest")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"cust $cust validity not chained")
          assert(a._3 != b._3, s"cust $cust consecutive versions must differ")
        case _ =>
      }
    }
  }

  test("skyline output is exactly the non-dominated set (brute force)") {
    val pts = graft.core.Tables.part(spark, sfDir)
      .select(col("p_size").cast("long"), col("p_retailprice"))
      .distinct().collect().map(r => (r.getLong(0), r.getDouble(1)))
    val dominated = (a: (Long, Double)) => pts.exists(b =>
      b != a && b._1 <= a._1 && b._2 <= a._2 && (b._1 < a._1 || b._2 < a._2))
    val expect = pts.filterNot(dominated).toSet
    val got = AnalyticQueries.queries("q148_skyline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === expect,
      s"skyline diverged: extra=${got -- expect} missing=${expect -- got}")
  }

  test("bitmap distinct equals exact count_distinct per group") {
    val exact = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = AnalyticQueries.queries("q149_bitmap_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(got === exact, "chunked-bitmap popcounts must be EXACT, not approximate")
  }

  test("BFS hop counts match a driver-side reference BFS") {
    val edges = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = edges.groupBy(_._1).map { case (o, es) => o -> es.map(_._2).toSet }
    val byPart = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1).toSet }
    val seed = edges.map(_._2).min
    var hops = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1 to 3) {
      val next = frontier.flatMap(byPart.getOrElse(_, Set.empty))
        .flatMap(byOrder.getOrElse(_, Set.empty)) -- hops.keySet
      hops ++= next.map(_ -> h.toLong)
      frontier = next
    }
    val got = AnalyticQueries.queries("q147_bfs_reach")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === hops,
      s"min-hop sets diverged: extra=${got.keySet -- hops.keySet} " +
        s"missing=${hops.keySet -- got.keySet}")
  }
}
