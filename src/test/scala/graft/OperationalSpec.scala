package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.OperationalQueries

/** Independent-reference specs for the operational-analytics widening
  * (q152–q158): each operator is re-derived on the driver from collected
  * sf0.001 fixtures by a DIFFERENT code path (plain Scala collections,
  * BigDecimal, explicit folds) and must agree exactly with the
  * distributed implementation — a second proof beside the DuckDB oracle.
  */
class OperationalSpec extends AnyFunSuite {
  import TestSession._

  test("every operational query runs and has an oracle") {
    OperationalQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
      assert(OperationalQueries.oracles.contains(name), s"$name lacks an oracle")
    }
  }

  private def collectedEvents(): Array[(Long, Long, Long, Double)] =
    graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("q152 big orders match a BigDecimal driver-side aggregation") {
    val qty = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity")).collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val expect = qty.filter(_._2 > 200).keySet
    val got = OperationalQueries.queries("q152_big_orders")(spark, sfDir)
      .select(col("o_orderkey"), col("qty")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expect,
      s"order sets diverged: extra=${got.keySet -- expect} missing=${expect -- got.keySet}")
    got.foreach { case (k, q) =>
      assert(q === qty(k).toDouble, s"order $k qty $q != ${qty(k)}") }
  }

  test("q153 lone-late suppliers match explicit driver-side set algebra") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
    val odate = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate")).collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    val part = li.map(l => (l._1, l._2)).toSet
    val late = li.filter(l => l._3.isAfter(odate(l._1).plusDays(150)))
      .map(l => (l._1, l._2)).toSet
    val lone = late.filter { case (o, s) =>
      part.exists(p => p._1 == o && p._2 != s) &&
        !late.exists(p => p._1 == o && p._2 != s)
    }
    val expect = lone.groupBy(_._2).map { case (s, os) => s -> os.size.toLong }
    val names = graft.core.Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = OperationalQueries.queries("q153_lone_late_supplier")(spark, sfDir)
      .collect().map(r => names(r.getString(0)) -> r.getLong(1)).toMap
    assert(got === expect, "lone-late waits must match the set-algebra reference")
  }

  test("q154 per-minute overlap matches a driver-side session fold") {
    val gapUs = 30L * 60 * 1000 * 1000
    val sessions = collectedEvents()
      .groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var s0, s1 = -1L
        sorted.foreach { e =>
          if (s0 < 0 || e._2 - s1 > gapUs) {
            if (s0 >= 0) bounds += ((s0, s1)); s0 = e._2
          }
          s1 = e._2
        }
        if (s0 >= 0) bounds += ((s0, s1))
        bounds.map { case (a, b) => (u, a / 60000000L, b / 60000000L) }
      }
    val expect = sessions.flatMap { case (u, m0, m1) => (m0 to m1).map(m => (m, u)) }
      .groupBy(_._1)
      .map { case (m, us) => m -> (us.size.toLong, us.map(_._2).distinct.size.toLong) }
    val got = OperationalQueries.queries("q154_interval_overlap")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect, "per-minute concurrency must match the fold reference")
  }

  test("q155 growth accounting: bridge identity and driver reference agree") {
    val ud = collectedEvents().map(e => (e._1, e._2 / 86400000000L)).distinct
    val byUser = ud.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).sorted }
    var newC, retC, resC, churnC = Map.empty[Long, Long].withDefaultValue(0L)
    byUser.values.foreach { days =>
      days.zipWithIndex.foreach { case (d, i) =>
        if (i == 0) newC += d -> (newC(d) + 1)
        else if (days(i - 1) == d - 1) retC += d -> (retC(d) + 1)
        else resC += d -> (resC(d) + 1)
        val isLast = i == days.length - 1
        if (isLast || days(i + 1) > d + 1) churnC += (d + 1) -> (churnC(d + 1) + 1)
      }
    }
    val got = OperationalQueries.queries("q155_growth_accounting")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val allDays = (newC.keySet ++ retC.keySet ++ resC.keySet ++ churnC.keySet)
    assert(got.keySet === allDays)
    allDays.foreach { d =>
      assert(got(d) === ((newC(d), retC(d), resC(d), churnC(d))), s"day $d diverged")
    }
    // the bridge identity: DAU(d) = new + retained + resurrected
    val dau = ud.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    dau.foreach { case (d, n) =>
      val (nw, rt, rs, _) = got(d)
      assert(nw + rt + rs === n, s"day $d bridge identity broken")
    }
    // every user is born exactly once and churns exactly once
    assert(newC.values.sum === byUser.size.toLong)
    assert(churnC.values.sum === byUser.size.toLong +
      byUser.values.map(ds => ds.sliding(2).count {
        case Array(a, b) => b > a + 1; case _ => false }).sum)
  }

  test("q156 grid radius join equals the brute-force distance scan") {
    val cust = graft.core.Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map(k => (k, k * 48271 % 10000, k * 69621 % 10000))
    val supp = graft.core.Tables.supplier(spark, sfDir)
      .select(col("s_suppkey")).collect().map(_.getLong(0))
      .map(k => (k, (k * 48271 + 7) % 10000, (k * 69621 + 11) % 10000))
    val expect = cust.flatMap { case (c, x, y) =>
      val d2s = supp.map { case (_, sx, sy) =>
        (x - sx) * (x - sx) + (y - sy) * (y - sy) }.filter(_ <= 1000000L)
      if (d2s.isEmpty) None else Some(c -> (d2s.length.toLong, d2s.min))
    }.toMap
    val got = OperationalQueries.queries("q156_grid_radius_join")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect,
      "grid bucketing must not change the radius-join answer")
  }

  test("q157 chi-square cells: exact counts, marginal identities, driver math") {
    val rows = OperationalQueries.queries("q157_chi_square")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val n = rows.map(_._3).sum
    // expected counts reconstruct from the cells' own marginals, bit-exact
    val rt = rows.groupBy(_._1).map { case (k, cs) => k -> cs.map(_._3).sum }
    val ct = rows.groupBy(_._2).map { case (k, cs) => k -> cs.map(_._3).sum }
    rows.foreach { case (p, st, o, e, c) =>
      val eRef = (rt(p) * ct(st)).toDouble / n.toDouble
      assert(e === eRef, s"cell ($p,$st) expected")
      val cRef = (o.toDouble - eRef) * (o.toDouble - eRef) / eRef
      assert(c === cRef, s"cell ($p,$st) contribution")
    }
    // marginal identity: expected counts sum to n (within float tolerance)
    assert(math.abs(rows.map(_._4).sum - n.toDouble) < 1e-6)
    assert(n === graft.core.Tables.orders(spark, sfDir).count())
  }

  test("q161 OHLC struct-extreme bars match row-walked candles") {
    val expect = collectedEvents()
      .groupBy(e => (e._1, e._2 / 3600000000L)).map { case ((u, h), evs) =>
        val walked = evs.sortBy(e => (e._2, e._3)).map(_._4)
        (u, h) -> ((walked.head, walked.max, walked.min, walked.last,
          walked.size.toLong))
      }
    val got = OperationalQueries.queries("q161_ohlc_bars")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(got === expect, "candles must match the ordered walk")
  }

  test("q162 TWAP equals an exact-rational reference and ignores fold order") {
    val expect = collectedEvents()
      .groupBy(_._1).map { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        var sv = BigDecimal(0); var st = 0L
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            val dt = b._2 - a._2
            sv += BigDecimal(a._4).setScale(2, BigDecimal.RoundingMode.HALF_UP) * dt
            st += dt
          case _ =>
        }
        u -> (if (st == 0) None else Some(sv.toDouble / st.toDouble), st)
      }
    val got = OperationalQueries.queries("q162_twap")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2)))).toMap
    assert(got === expect,
      "time-weighted average must be exact decimal x micros until one division")
  }

  test("q160 attribution matches a brute-force lookback scan; totals conserve") {
    val evs = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val touches = Set("view", "click", "signup")
    val byUser = evs.groupBy(_._1)
    var nFirst = Map.empty[String, Long].withDefaultValue(0L)
    var nLast = Map.empty[String, Long].withDefaultValue(0L)
    var revFirst = Map.empty[String, BigDecimal].withDefaultValue(BigDecimal(0))
    var revLast = Map.empty[String, BigDecimal].withDefaultValue(BigDecimal(0))
    var purchases = 0L
    byUser.values.foreach { us =>
      us.filter(_._4 == "purchase").foreach { case (_, pus, _, _, v) =>
        purchases += 1
        val win = us.filter(e => touches(e._4) &&
          e._2 >= pus - 86400000000L && e._2 <= pus - 1).sortBy(e => (e._2, e._3))
        val f = if (win.isEmpty) "direct" else win.head._4
        val l = if (win.isEmpty) "direct" else win.last._4
        val d = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        nFirst += f -> (nFirst(f) + 1); revFirst += f -> (revFirst(f) + d)
        nLast += l -> (nLast(l) + 1); revLast += l -> (revLast(l) + d)
      }
    }
    val got = graft.queries.OperationalQueries.queries("q160_attribution")(
      spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val channels = nFirst.keySet ++ nLast.keySet
    assert(got.keySet === channels)
    channels.foreach { ch =>
      val (nf, rf, nl, rl) = got(ch)
      assert(nf === nFirst(ch) && nl === nLast(ch), s"$ch counts")
      assert(rf === revFirst(ch).toDouble && rl === revLast(ch).toDouble,
        s"$ch revenue")
    }
    // conservation: every purchase attributed exactly once on each side
    assert(got.values.map(_._1).sum === purchases)
    assert(got.values.map(_._3).sum === purchases)
  }

  test("q159 CUSUM alarms and residuals are bit-exact vs a driver fold") {
    val expect = collectedEvents()
      .groupBy(_._1).map { case (u, evs) =>
        var pos = 0.0; var neg = 0.0; var up = 0L; var down = 0L
        evs.sortBy(e => (e._2, e._3)).map(_._4).foreach { v =>
          val p2 = math.max(0.0, pos + v - 60.0)
          val n2 = math.min(0.0, neg + v - 40.0)
          if (p2 > 200.0) { up += 1; pos = 0.0 } else pos = p2
          if (n2 < -200.0) { down += 1; neg = 0.0 } else neg = n2
        }
        u -> ((up, down, pos, neg))
      }
    val got = OperationalQueries.queries("q159_cusum")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(got === expect, "CUSUM fold must match the imperative reference")
    assert(got.values.exists(v => v._1 > 0 || v._2 > 0),
      "fixture should trip some alarms")
  }

  test("q163 RRF fusion matches sort-ranked lists fused on the driver") {
    // lexical ranks: the (oracle-verified) BM25 scores, sort-ranked here
    // instead of through TopKAggregator — the aggregator's bounded
    // ranking must agree with the plain sort
    val lex = graft.llm.Bm25.score(
      graft.core.Tables.documents(spark, sfDir), "doc_id", "text",
      Seq("join", "hash", "window"))
      .select(col("doc_id"), col("score_micro")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // semantic ranks: driver-side cosine vs vec 0, same ordered fold +
    // 6-decimal HALF_UP rounding as the Column implementation
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q0 = vecs(0L)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val sem = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val c = dot(q0, v) / (math.sqrt(dot(q0, q0)) * math.sqrt(dot(v, v)))
      id -> BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expect = (lex.keySet ++ sem.keySet).map { id =>
      val lr = lex.getOrElse(id, 0L); val sr = sem.getOrElse(id, 0L)
      id -> ((lr, sr,
        (if (lr > 0) 1.0 / (60L + lr) else 0.0)
          + (if (sr > 0) 1.0 / (60L + sr) else 0.0)))
    }.toMap
    val got = graft.queries.EmbeddingQueries.queries("q163_rrf_fusion")(
      spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === expect, "bounded-aggregator ranks + fusion must match sort ranks")
    assert(got.nonEmpty && got.values.exists(v => v._1 > 0 && v._2 > 0),
      "some docs should appear in both lists")
  }

  test("q158 EWMA is bit-exact vs a driver-side left fold") {
    val expect = collectedEvents()
      .groupBy(_._1).map { case (u, evs) =>
        val vals = evs.sortBy(e => (e._2, e._3)).map(_._4)
        u -> vals.tail.foldLeft(vals.head)((acc, x) => 0.2 * x + 0.8 * acc)
      }
    val got = OperationalQueries.queries("q158_ewma")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (u, v) =>
      assert(got(u) === v, s"user $u EWMA must be BIT-exact (same fold order)")
    }
  }
}
