package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QualityQueries

/** Independent-reference specs for the data-platform widening (q164–q168):
  * each operator is re-derived on the driver from collected sf0.001
  * fixtures by a DIFFERENT code path (plain Scala collections, BigDecimal
  * folds, a hand-rolled DP levenshtein, an explicit interpolated
  * percentile) and must agree exactly with the distributed implementation
  * — a second proof beside the DuckDB oracle.
  */
class QualitySpec extends AnyFunSuite {
  import TestSession._

  test("every quality query runs and has an oracle") {
    QualityQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
      assert(QualityQueries.oracles.contains(name), s"$name lacks an oracle")
    }
  }

  private def lineitems(): Array[(Long, Int, Double, Double, Double, java.time.LocalDateTime)] =
    graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getAs[java.time.LocalDateTime](5)))

  test("q164 constraint metrics match a plain-Scala single pass") {
    val li = lineitems()
    val n = li.length.toLong
    val nPk = li.map(r => (r._1, r._2)).distinct.length.toLong
    val nDiscOk = li.count(r => r._5 >= 0.0 && r._5 <= 0.1).toLong
    val sumPrice = li.map(r => BigDecimal(r._4).setScale(2)).sum
    val expected = Map(
      "size_ge_1000" -> (n.toDouble, if (n >= 1000) 1 else 0),
      "completeness_l_quantity" -> (1.0, 1),
      "uniqueness_order_line" -> (nPk.toDouble / n, if (nPk == n) 1 else 0),
      "compliance_discount_0_to_0.1" ->
        (nDiscOk.toDouble / n, if (nDiscOk == n) 1 else 0),
      "min_quantity_ge_1" -> (li.map(_._3).min, 1),
      "max_quantity_le_50" -> (li.map(_._3).max, 1),
      "mean_price_in_range" -> (sumPrice.toDouble / n, 1))
    val got = QualityQueries.queries("q164_dq_suite")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (m, p)) =>
      assert(got(k)._1 === m, s"$k metric"); assert(got(k)._2 === p, s"$k passed")
    }
  }

  test("q165 maintained view equals a driver-side signed recompute") {
    val cutoff = java.time.LocalDateTime.of(1997, 1, 1, 0, 0)
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"),
        col("l_quantity"), col("l_shipdate")).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.getAs[java.time.LocalDateTime](4).isBefore(cutoff)) 1
        else if (r.getInt(2) % 7 == 0) -1 else 1,
        BigDecimal(r.getDouble(3)).setScale(2)))
    val expect = rows.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.map(v => v._3 * v._2).sum, vs.map(_._2.toLong).sum)
    }
    val got = QualityQueries.queries("q165_incremental_view")(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, (q, c)) =>
      assert(got(k)._1 === q.toDouble, s"$k qty")
      assert(got(k)._2 === c, s"$k count")
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q166 links match a brute-force all-pairs scan with DP levenshtein") {
    val cs = graft.core.Tables.customer(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getString(4)))
    val expect = (for {
      a <- cs; b <- cs
      if a._3 == b._3 && a._5 == b._5 && a._1 < b._1
      l = lev(a._2, b._2)
      score = (if (l <= 2) 2 else 0) +
        (if (math.abs(math.round(a._4 * 100) - math.round(b._4 * 100)) < 50000L) 1
         else 0)
      if score >= 2
    } yield ((a._1, b._1), (l, score))).toMap
    val got = QualityQueries.queries("q166_record_linkage")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getInt(3))))
      .toMap
    assert(got === expect,
      s"extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet}")
  }

  /** Spark's exact `percentile`: rank = p·(n−1) over the sorted values,
    * interpolated as lo·(1−d) + hi·d — the same float expression Spark's
    * Percentile.getPercentile evaluates (the algebraically equal
    * lo + d·(hi−lo) differs in the last ulp for some inputs).
    */
  private def pct(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val rank = p * (s.length - 1)
    val lo = rank.toInt
    if (lo + 1 >= s.length) s.last
    else s(lo) * (1.0 - (rank - lo)) + s(lo + 1) * (rank - lo)
  }

  test("q167 robust outliers match driver-side median/MAD") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val med = ev.groupBy(_._2).map { case (t, vs) => t -> pct(vs.map(_._3).toSeq, 0.5) }
    val mad = ev.groupBy(_._2).map { case (t, vs) =>
      t -> pct(vs.map(v => math.abs(v._3 - med(t))).toSeq, 0.5)
    }
    val expect = ev.flatMap { case (id, t, v) =>
      val z = 0.6745 * (v - med(t)) / mad(t)
      if (math.abs(z) > 3.5) Some(id -> z) else None
    }.toMap
    val got = QualityQueries.queries("q167_mad_outliers")(spark, sfDir)
      .select(col("event_id"), col("robust_z")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expect.keySet,
      s"extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet}")
    expect.foreach { case (id, z) => assert(got(id) === z, s"event $id z") }
  }

  test("q168 recommendations match a driver-side co-occurrence fold") {
    val bi = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = bi.groupBy(_._1).map { case (_, vs) => vs.map(_._2) }
    val cnt = collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.foreach { parts =>
      for (a <- parts; b <- parts if a != b)
        cnt((a, b)) = cnt.getOrElse((a, b), 0L) + 1L
    }
    val expect = cnt.toSeq.groupBy(_._1._1).flatMap { case (item, pairs) =>
      pairs.sortBy { case ((_, rec), c) => (-c, rec) }.take(3).zipWithIndex
        .map { case (((_, rec), c), i) => (item, rec) -> (c, (i + 1).toLong) }
    }
    val got = QualityQueries.queries("q168_cooccur_recs")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expect,
      s"extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet}")
  }

  private def eventsTyped(): Array[(Long, String, Double, Long)] =
    graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))

  test("q169 overlap matches driver-side set intersection") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val seg = ev.groupBy(identity).filter(_._2.length >= 15).keys
      .toSeq.groupBy(_._2).map { case (t, ks) => t -> ks.map(_._1).toSet }
    val types = seg.keys.toSeq.sorted
    val expect = (for {
      a <- types; b <- types if a < b
      common = (seg(a) & seg(b)).size if common > 0
    } yield (a, b) ->
      (common.toLong,
        common.toDouble / (seg(a).size + seg(b).size - common))).toMap
    val got = QualityQueries.queries("q169_audience_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === expect)
  }

  test("q170 deciles match driver-side boundary assignment") {
    val spend = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val scores = spend.values.map(_.toDouble).toSeq
    val bs = (1 to 9).map(i => pct(scores, i / 10.0))
    val byDecile = spend.values.groupBy(v => bs.count(_ < v.toDouble) + 1)
    val tot = spend.values.sum.toDouble
    val ncust = spend.size
    val got = QualityQueries.queries("q170_decile_lift")(spark, sfDir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === byDecile.keySet)
    byDecile.foreach { case (d, vs) =>
      val avg = vs.sum.toDouble / vs.size
      assert(got(d)._1 === vs.size.toLong, s"decile $d count")
      assert(got(d)._2 === avg, s"decile $d avg")
      assert(got(d)._3 === avg / (tot / ncust), s"decile $d lift")
    }
  }

  test("q171 Welch t/df match a driver-side exact-moment computation") {
    val ev = eventsTyped()
    val stats = ev.groupBy(_._2).map { case (t, vs) =>
      val cents = vs.map(v => BigInt(math.round(v._3 * 100)))
      val n = vs.length.toLong
      val sv = cents.sum; val svv = cents.map(c => c * c).sum
      val nD = n.toDouble
      t -> (n, sv.toDouble / nD,
        (nD * svv.toDouble - sv.toDouble * sv.toDouble) / (nD * (nD - 1.0)))
    }
    val types = stats.keys.toSeq.sorted
    val expect = (for { a <- types; b <- types if a < b } yield {
      val (na, ma, s2a) = stats(a); val (nb, mb, s2b) = stats(b)
      val sea = s2a / na.toDouble; val seb = s2b / nb.toDouble
      (a, b) -> ((ma - mb) / math.sqrt(sea + seb),
        (sea + seb) * (sea + seb) /
          (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)))
    }).toMap
    val got = QualityQueries.queries("q171_welch_ttest")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, (t, df)) =>
      assert(got(k)._1 === t, s"$k t"); assert(got(k)._2 === df, s"$k df") }
  }

  test("q172 Holt state matches an explicit driver-side recurrence") {
    val ev = eventsTyped()
    val expect = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).collect { case (u, vs) if vs.length >= 2 =>
        val ordered = vs.sortBy(v => (v._2, v._3)).map(_._4)
        var l = ordered(1); var t = ordered(1) - ordered(0)
        ordered.drop(2).foreach { x =>
          val l2 = 0.3 * x + 0.7 * (l + t)
          t = 0.1 * (l2 - l) + 0.9 * t; l = l2
        }
        u -> (vs.length.toLong, l, t, l + t)
      }
    val got = QualityQueries.queries("q172_holt_trend")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (u, e) => assert(got(u) === e, s"user $u") }
    assert(ev.nonEmpty)
  }

  test("q173 recursive spine covers every month between bounds, gap-filled") {
    val months = QualityQueries.queries("q173_recursive_spine")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getDouble(1),
        r.getLong(2)))
      .sortBy(_._1.toString)
    // spine property: consecutive months, no gaps, data-driven bounds
    months.sliding(2).foreach { case Array(a, b) =>
      assert(a._1.plusMonths(1) === b._1, s"gap after ${a._1}")
    case _ => ()
    }
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderdate"), col("o_totalprice")).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).withDayOfMonth(1)
        .toLocalDate.atStartOfDay, BigDecimal(r.getDouble(1)).setScale(2)))
    val byMonth = orders.groupBy(_._1)
      .map { case (m, vs) => m -> (vs.map(_._2).sum, vs.length.toLong) }
    assert(months.head._1 === byMonth.keys.min(Ordering.by((_: java.time.LocalDateTime).toString)))
    assert(months.last._1 === byMonth.keys.max(Ordering.by((_: java.time.LocalDateTime).toString)))
    months.foreach { case (m, rev, n) =>
      val (er, en) = byMonth.getOrElse(m, (BigDecimal(0), 0L))
      assert(rev === er.toDouble, s"$m revenue"); assert(n === en, s"$m count")
    }
  }

  test("q174 lateral top-2 matches a driver-side per-customer sort") {
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = orders.groupBy(_._1).iterator.flatMap { case (c, os) =>
      os.sortBy(o => (-o._3, o._2)).take(2).map(o => (c, o._2, o._3))
    }.toSet
    val got = QualityQueries.queries("q174_lateral_topn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect,
      s"extra=${(got -- expect).take(3)} missing=${(expect -- got).take(3)}")
  }

  test("q175 golden records match a driver-side union-find survivorship") {
    val cs = graft.core.Tables.customer(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        math.round(r.getDouble(3) * 100), r.getString(4)))
    val parent = collection.mutable.Map(cs.map(c => c._1 -> c._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- cs; b <- cs
      if a._3 == b._3 && a._5 == b._5 && a._1 < b._1
      if lev(a._2, b._2) <= 2 && math.abs(a._4 - b._4) < 50000L
    } {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCluster = cs.groupBy(c => find(c._1))
    val names = cs.map(c => c._1 -> (c._2, c._5)).toMap
    val expect = byCluster.map { case (cid, ms) =>
      cid -> (ms.length.toLong, names(cid)._1, names(cid)._2,
        ms.map(_._4).sum.toDouble / 100.0, ms.map(_._4).max.toDouble / 100.0)
    }
    val got = QualityQueries.queries("q175_entity_resolution")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet === expect.keySet,
      s"extra=${(got.keySet -- expect.keySet).take(5)} missing=${(expect.keySet -- got.keySet).take(5)}")
    expect.foreach { case (cid, e) => assert(got(cid) === e, s"cluster $cid") }
  }

  test("q176 trigram top-20 matches a driver-side journey walk") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).foreach { case (_, vs) =>
      val seq = vs.sortBy(v => (v._2, v._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).foreach { t =>
        val k = t.mkString(">"); counts(k) = counts.getOrElse(k, 0L) + 1L
      }
    }
    val expect = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val got = QualityQueries.queries("q176_trigram_patterns")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expect)
  }

  test("q177 weighted median matches a driver-side cumulative scan") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3),
        math.round(r.getDouble(4))))
    val expect = li.groupBy(_._1).map { case (rf, vs) =>
      val sorted = vs.sortBy(v => (v._2, v._3, v._4))
      val totw = sorted.map(_._5).sum
      var cum = 0L
      val med = sorted.find { v => cum += v._5; cum * 2 >= totw }.get._2
      rf -> (med, totw)
    }
    val got = QualityQueries.queries("q177_weighted_median")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got === expect)
  }

  test("q178 skew stats match driver-side exact rank arithmetic") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def ref(keys: Array[Long]): (Long, Long, Double, Double, Double) = {
      val sizes = keys.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      val n = sizes.size.toLong
      val stot = sizes.values.sum
      val smax = sizes.values.max
      val szD = sizes.values.map(_.toDouble).toSeq
      val ranked = sizes.toSeq.sortBy { case (k, sz) => (sz, k) }
      val trs = ranked.zipWithIndex.map { case ((_, sz), i) => (i + 1) * sz }.sum
      val gini = (2.0 * trs - (n + 1).toDouble * stot.toDouble) /
        (n.toDouble * stot.toDouble)
      (n, stot, smax.toDouble / stot, pct(szD, 0.99) / pct(szD, 0.5), gini)
    }
    val expect = Map("l_partkey" -> ref(li.map(_._1)),
      "l_suppkey" -> ref(li.map(_._2)))
    val got = QualityQueries.queries("q178_skew_report")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (d, e) =>
      assert(got(d)._1 === e._1, s"$d n"); assert(got(d)._2 === e._2, s"$d tot")
      assert(got(d)._3 === e._3, s"$d top_share")
      assert(got(d)._4 === e._4, s"$d p99_p50")
      assert(math.abs(got(d)._5 - e._5) < 1e-12, s"$d gini")
    }
  }

  test("q179 decomposition matches a driver-side STL-lite recomputation") {
    val daily = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderdate"), col("o_totalprice")).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val idx = daily.map(_._1).zipWithIndex.toMap
    val full = daily.zipWithIndex.collect {
      case ((d, c), i) if i >= 3 && i + 3 < daily.length =>
        val s7 = (i - 3 to i + 3).map(daily(_)._2).sum
        (d, c, s7, 7 * c - s7, ((d + 4) % 7).toInt)
    }
    val seasonal = full.groupBy(_._5).map { case (dow, vs) =>
      dow -> vs.map(_._4).sum.toDouble / (700.0 * vs.length)
    }
    val expect = full.map { case (d, c, s7, num, dow) =>
      val detr = num.toDouble / 700.0
      d -> (c.toDouble / 100.0, s7.toDouble / 700.0, seasonal(dow),
        detr - seasonal(dow))
    }.toMap
    val got = QualityQueries.queries("q179_seasonal_decompose")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (d, e) => assert(got(d) === e, s"day $d") }
    assert(idx.nonEmpty)
  }

  test("q180 profiler predicts the exact executed self-join cardinality") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ref(keys: Array[Long]): (Double, Long, Long) = {
      val c = keys.groupBy(identity).map { case (_, v) => v.length.toLong }
      (c.map(x => x * x).sum.toDouble, c.size.toLong, c.max)
    }
    val expect = Map("l_partkey" -> ref(li.map(_._1)),
      "l_suppkey" -> ref(li.map(_._2)), "l_orderkey" -> ref(li.map(_._3)))
    val got = QualityQueries.queries("q180_join_cardinality")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expect)
    // the profiler's promise: its number IS the executed join's count
    val partJoin = li.map(_._1).groupBy(identity)
      .map { case (_, v) => v.length.toLong * v.length }.sum
    assert(got("l_partkey")._1 === partJoin.toDouble)
  }

  test("q181 LTV curve matches a driver-side cohort fold") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").cast("long")
          .as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val cohort = ev.groupBy(_._1).map { case (u, vs) =>
      val cd = vs.map(_._4).min; u -> (cd / 7, cd)
    }
    val sizes = cohort.values.groupBy(_._1).map { case (w, m) => w -> m.size }
    val rev = ev.filter(_._2 == "purchase")
      .groupBy(e => (cohort(e._1)._1, (e._4 - cohort(e._1)._2) / 7))
      .map { case (k, vs) => k -> vs.map(e => math.round(e._3 * 100)).sum }
    val expect = rev.groupBy(_._1._1).flatMap { case (cw, entries) =>
      var cum = 0L
      entries.toSeq.sortBy(_._1._2).map { case ((_, aw), cents) =>
        cum += cents
        (cw, aw) -> (sizes(cw).toLong, cents.toDouble / 100.0,
          cum.toDouble / 100.0)
      }
    }
    val got = QualityQueries.queries("q181_cohort_ltv")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got === expect)
  }

  test("q182 backtest metrics match an explicit day-aligned scan") {
    val daily = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderdate"), col("o_totalprice")).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).sum }
    val aligned = daily.toSeq.flatMap { case (d, c) =>
      daily.get(d - 7).map(fc => (c, fc)) }
    val n = aligned.length
    val sae = aligned.map { case (c, fc) => math.abs(c - fc) }.sum
    val se = aligned.map { case (c, fc) => c - fc }.sum
    val sa = aligned.map(_._1).sum
    val row = QualityQueries.queries("q182_forecast_backtest")(spark, sfDir)
      .collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getDouble(1) === sae.toDouble / 100.0 / n)
    assert(row.getDouble(2) === sae.toDouble / sa.toDouble)
    assert(row.getDouble(3) === se.toDouble / sa.toDouble)
  }

  test("q183 reports zero orphans on the fixture and counts children") {
    val got = QualityQueries.queries("q183_referential_integrity")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet === Set("lineitem->orders", "lineitem->part",
      "lineitem->supplier", "orders->customer", "customer->nation"))
    val nLi = graft.core.Tables.lineitem(spark, sfDir).count()
    assert(got("lineitem->orders") === ((0L, nLi)))
    // a synthetic orphan IS detected: drop half the parent set and re-run
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val halfParents = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0)
    val orphans = li.select(col("l_orderkey"))
      .join(halfParents.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti").count()
    assert(orphans > 0, "synthetic orphan probe should find violations")
  }

  test("q184 debounce keeps exactly the burst-starting events") {
    val ev = eventsTyped()
    val byUserType = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
    val expect = byUserType.map { case (k, vs) =>
      val ordered = vs.map(_._2).sortBy(v => (v._2, v._1))
      val kept = ordered.head +: ordered.sliding(2).collect {
        case Array(a, b) if b._2 - a._2 > 21600000000L => b
      }.toSeq
      k -> (kept.length.toLong, kept.map(_._1).min)
    }
    val got = QualityQueries.queries("q184_debounce")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expect)
    assert(ev.nonEmpty)
  }

  test("q185 Benford digits come from exact cents, not float log10") {
    val cents = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100))
    val obs = cents.map(_.toString.head.asDigit).groupBy(identity)
      .map { case (d, v) => d -> v.length.toLong }
    val n = obs.values.sum
    val probs = Map(1 -> 0.30102999566398119, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829993, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514)
    val got = QualityQueries.queries("q185_benford")(spark, sfDir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === obs.keySet)
    obs.foreach { case (d, o) =>
      val exp = n.toDouble * probs(d)
      val contrib = (o.toDouble - exp) * (o.toDouble - exp) / exp
      assert(got(d)._1 === o, s"digit $d count")
      assert(got(d)._2 === exp, s"digit $d expected")
      assert(got(d)._3 === contrib, s"digit $d contrib")
    }
  }

  test("q186 zone maps match a driver-side layout simulation") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')")
          .cast("long").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dLo = li.map(_._2).min; val dHi = li.map(_._2).max
    val oLo = li.map(_._1).min; val oHi = li.map(_._1).max
    def skip(assign: ((Long, Long)) => Long): (Long, Long) = {
      // keep as Seq: mapping a Map to (mn, mx) pairs would re-key on mn
      // and collapse files sharing a min day
      val zones = li.groupBy(assign).valuesIterator.map(vs =>
        (vs.map(_._2).min, vs.map(_._2).max)).toSeq
      (zones.size.toLong,
        zones.count { case (mn, mx) => mx < dLo + 49 || mn > dLo + 55 }.toLong)
    }
    val nat = skip { case (o, _) => (o - oLo) * 64 / (oHi - oLo + 1) }
    val clu = skip { case (_, d) => (d - dLo) * 64 / (dHi - dLo + 1) }
    val got = QualityQueries.queries("q186_pruning_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("ingest_order") === nat)
    assert(got("date_clustered") === clu)
    // the operator's reason to exist: clustering must dominate ingest order
    assert(clu._2 > nat._2,
      "date-clustered layout should skip strictly more files")
  }

  test("q187 funnel latencies match a driver-side step walk") {
    val gap = 43200000000L
    val ev = eventsTyped()
    val byUser = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val lats = byUser.valuesIterator.flatMap { vs =>
      val t1s = vs.filter(_._2 == "signup").map(_._3)
      if (t1s.isEmpty) None else {
        val t1 = t1s.min
        val t2s = vs.filter(v => v._2 == "click" && v._3 > t1 && v._3 - t1 <= gap).map(_._3)
        if (t2s.isEmpty) None else {
          val t2 = t2s.min
          val t3s = vs.filter(v => v._2 == "purchase" && v._3 > t2 && v._3 - t2 <= gap).map(_._3)
          if (t3s.isEmpty) None
          else { val t3 = t3s.min; Some((t3 - t1, t2 - t1, t3 - t2)) }
        }
      }
    }.toSeq
    val row = QualityQueries.queries("q187_funnel_latency")(spark, sfDir)
      .collect().head
    assert(row.getLong(0) === lats.length.toLong)
    if (lats.isEmpty) {
      (1 to 4).foreach(i => assert(row.isNullAt(i), s"col $i should be NULL"))
    } else {
      assert(row.getDouble(1) === pct(lats.map(_._1.toDouble), 0.5))
      assert(row.getDouble(2) === pct(lats.map(_._1.toDouble), 0.9))
      assert(row.getDouble(3) === pct(lats.map(_._2.toDouble), 0.5))
      assert(row.getDouble(4) === pct(lats.map(_._3.toDouble), 0.5))
    }
    assert(ev.nonEmpty)
  }

  test("q188 split matches a driver-side first-order classification") {
    val o = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay,
        math.round(r.getDouble(2) * 100)))
    val firstDay = o.groupBy(_._1).map { case (c, vs) => c -> vs.map(_._2).min }
    val expect = o.groupBy(v => (v._2 / 30,
        if (v._2 == firstDay(v._1)) "new" else "returning"))
      .map { case (k, vs) =>
        k -> (vs.length.toLong, vs.map(_._3).sum.toDouble / 100.0) }
    val got = QualityQueries.queries("q188_new_vs_returning")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expect)
  }

  test("q189 group split has zero leakage and partitions every event") {
    val rows = QualityQueries.queries("q189_grouped_split")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    rows.values.foreach { case (_, _, leaky) => assert(leaky === 0L) }
    val nEv = graft.core.Tables.events(spark, sfDir).count()
    assert(rows.values.map(_._1).sum === nEv, "splits partition the events")
    val nUsers = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.values.map(_._2).sum === nUsers, "splits partition the users")
  }

  test("q190 SRM cells match driver-side exact counts") {
    val users = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .withColumn("split", graft.llm.TextFunctions.splitAssign(col("user_id")))
      .collect().map(r => r.getString(1))
    val obs = users.groupBy(identity).map { case (s, v) => s -> v.length.toLong }
    val n = users.length
    val probs = Map("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    val got = QualityQueries.queries("q190_srm_check")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === obs.keySet)
    obs.foreach { case (s, o) =>
      val exp = n.toDouble * probs(s)
      assert(got(s)._1 === o, s"$s count")
      assert(got(s)._2 === exp, s"$s expected")
      assert(got(s)._3 === (o.toDouble - exp) * (o.toDouble - exp) / exp, s"$s contrib")
    }
  }

  test("q191 sketch sample is the deterministic hash bottom-256 per group") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"),
        graft.llm.TextFunctions.portableHash(col("event_id").cast("string"), 7)
          .as("prio"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).map { case (t, vs) =>
      val sample = vs.sortBy(v => (v._4, v._2)).take(256).map(_._3)
      t -> (sample.length.toLong, pct(sample.toSeq, 0.5))
    }
    val exact = ev.groupBy(_._1).map { case (t, vs) =>
      t -> (pct(vs.map(_._3).toSeq, 0.35), pct(vs.map(_._3).toSeq, 0.65)) }
    val got = QualityQueries.queries("q191_bottomk_quantile")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getInt(4)))
      .toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (t, (nS, est)) =>
      assert(got(t)._1 === nS, s"$t sample size")
      assert(got(t)._2 === est, s"$t estimate")
      val (lo, hi) = exact(t)
      assert((got(t)._3 == 1) === (est >= lo && est <= hi), s"$t bound flag")
    }
  }

  test("q192 rolling median matches a driver-side trailing-frame walk") {
    val daily = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map(r => ((r.getString(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val expect = daily.groupBy(_._1._1).flatMap { case (prio, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      days.indices.map { i =>
        val frame = days.slice(math.max(0, i - 6), i + 1).map(_._2.toDouble)
        (prio, days(i)._1) ->
          (days(i)._2.toDouble / 100.0, pct(frame, 0.5) / 100.0)
      }
    }
    val got = QualityQueries.queries("q192_rolling_median")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, e) => assert(got(k) === e, s"$k") }
  }
}
