package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-level cross-checks for the q243–q250 statistics tail.
  *
  * The oracle gate proves Spark == DuckDB, but both sides share the
  * FORMULA (value-domain collapse + grid quantization); these tests
  * validate the formula itself against independent reference
  * algorithms on the sf0.001 fixture — an O(n²) raw-pair scan for
  * Kendall τ-b, the classic sequential pool-adjacent-violators sweep
  * for the closed-form minimax isotonic fit, a brute-force pairwise
  * count for the tie-aware AUC, and a direct floating-point jackknife
  * for the grid-assembled standard error. Collects here are test-only
  * (≤ a few thousand fixture rows), never in the queries.
  */
class RobustStatsSpec extends AnyFunSuite {
  import TestSession._

  private def queryRow(name: String): org.apache.spark.sql.Row = {
    val r = SparkEntry.queries(name)(spark, sfDir).collect()
    assert(r.length == 1, s"$name expected 1 row, got ${r.length}")
    r(0)
  }

  test("q245 Kendall tau-b equals the O(n^2) raw-pair scan") {
    val xy = graft.core.Tables.lineitem(spark, sfDir)
      .selectExpr("cast(l_quantity as long) x",
        "cast(round(l_discount * 100) as long) y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var d = 0L
    var i = 0
    while (i < xy.length) {
      var j = i + 1
      while (j < xy.length) {
        val s = java.lang.Long.signum(xy(i)._1 - xy(j)._1) *
          java.lang.Long.signum(xy(i)._2 - xy(j)._2)
        if (s > 0) c += 1 else if (s < 0) d += 1
        j += 1
      }
      i += 1
    }
    val n = xy.length.toLong
    val tx = xy.groupBy(_._1).values.map(g => g.length.toLong)
      .map(t => t * (t - 1) / 2).sum
    val ty = xy.groupBy(_._2).values.map(g => g.length.toLong)
      .map(t => t * (t - 1) / 2).sum
    val n0 = n * (n - 1) / 2
    val tau = (c - d).toDouble /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
    val row = queryRow("q245_kendall_tau")
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Double]("c_pairs") === c.toDouble)
    assert(row.getAs[Double]("d_pairs") === d.toDouble)
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-12)
  }

  test("q243 MI / chi-square / Cramér's V match the direct float form") {
    val ls = graft.core.Tables.documents(spark, sfDir)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = ls.length.toDouble
    val cell = ls.groupBy(identity).view.mapValues(_.length.toDouble)
    val rm = ls.groupBy(_._1).view.mapValues(_.length.toDouble)
    val km = ls.groupBy(_._2).view.mapValues(_.length.toDouble)
    val mi = cell.map { case ((l, s), c) =>
      (c / n) * math.log(c * n / (rm(l) * km(s)))
    }.sum
    val chi2 = cell.map { case ((l, s), c) =>
      val e = rm(l) * km(s) / n
      (c - e) * (c - e) / e
    }.sum
    val v = math.sqrt(chi2 / n / math.min(rm.size - 1, km.size - 1))
    val row = queryRow("q243_mutual_information")
    assert(row.getAs[Long]("n") === ls.length.toLong)
    assert(row.getAs[Long]("r_levels") === rm.size.toLong)
    assert(row.getAs[Long]("k_levels") === km.size.toLong)
    // grid error: ≤ 1e-9 per cell for MI, ≤ n·1e-9 per cell for χ²
    assert(math.abs(row.getAs[Double]("mi") - mi) < 1e-5)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-4 * n)
    assert(math.abs(row.getAs[Double]("cramers_v") - v) < 1e-5)
  }

  test("q244 Theil–Sen slope/intercept equal the raw-pair weighted medians") {
    val xy = graft.core.Tables.lineitem(spark, sfDir)
      .selectExpr("cast(l_quantity as long) x",
        "cast(round(l_discount * 100) as long) y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // all O(n²) cross-x pair slopes, weight 1 each — the multiset the
    // query reproduces through the contingency's ca·cb weights
    val wBySlope = new java.util.HashMap[Double, Long]()
    var i = 0
    while (i < xy.length) {
      var j = 0
      while (j < xy.length) {
        if (xy(i)._1 < xy(j)._1) {
          val m = (xy(j)._2 - xy(i)._2).toDouble /
            (xy(j)._1 - xy(i)._1).toDouble
          wBySlope.merge(m, 1L, _ + _)
        }
        j += 1
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    def weightedMedian(wv: Seq[(Double, Long)]): Double = {
      val sorted = wv.sortBy(_._1)
      val wt = sorted.map(_._2).sum
      var cw = 0L
      sorted.find { case (_, w) => cw += w; 2 * cw >= wt }.get._1
    }
    val slope = weightedMedian(
      wBySlope.asScala.toSeq.map { case (m, w) => (m.toDouble, w.toLong) })
    val vals = xy.groupBy { case (x, y) => y.toDouble - slope * x.toDouble }
      .view.mapValues(_.length.toLong).toSeq
    val intercept = weightedMedian(vals)
    val row = queryRow("q244_theil_sen")
    assert(row.getAs[Double]("slope") === slope)
    assert(row.getAs[Double]("intercept") === intercept)
  }

  test("q246 Bhattacharyya/Hellinger match the direct float form") {
    import org.apache.spark.sql.functions.{col, explode}
    val cnt = graft.core.Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(graft.llm.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = cnt.groupBy(_._1).view
      .mapValues(g => g.map(t => (t._2, t._3)).toMap).toMap
    val tots = bySrc.view.mapValues(_.values.sum.toDouble).toMap
    val rows = SparkEntry.queries("q246_hellinger")(spark, sfDir).collect()
    assert(rows.length === bySrc.size * (bySrc.size - 1) / 2)
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val common = bySrc(sa).keySet.intersect(bySrc(sb).keySet)
      val bc = common.toSeq.map { t =>
        math.sqrt(bySrc(sa)(t).toDouble * bySrc(sb)(t).toDouble) /
          (math.sqrt(tots(sa)) * math.sqrt(tots(sb)))
      }.sum
      assert(r.getAs[Long]("n_common") === common.size.toLong)
      // per-term floor-grid bias plus the reference's own float-sum
      // rounding: budget 4e-9 × |common vocabulary| (any formula error
      // would show at ≥ 1e-6·|common|)
      val tol = 4e-9 * common.size + 1e-12
      val bcQ = r.getAs[Double]("bhattacharyya")
      assert(math.abs(bcQ - bc) < tol)
      // hellinger amplifies a BC perturbation by 1/(2h) near BC→1, so
      // check it as exact internal consistency with the query's own BC
      assert(r.getAs[Double]("hellinger") ===
        math.sqrt(math.max(0.0, 1.0 - bcQ)))
    }
  }

  test("q247 Calinski–Harabasz matches an independent Scala replication") {
    val rows = graft.core.Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 16384.0 + 0.5).toLong).toArray))
    val d = rows.head._2.length
    val byLabel = rows.groupBy(_._1)
    def cents(g: Array[(Int, Array[Long])]): Array[Long] = {
      val n = g.length.toLong
      Array.tabulate(d) { i =>
        val sv = g.map(_._2(i)).sum
        math.floor((2 * sv + n).toDouble / (2.0 * n)).toLong
      }
    }
    val labCents = byLabel.view.mapValues(g => cents(g)).toMap
    val gCent = cents(rows.map(r => (0, r._2)))
    var tw = 0L
    rows.foreach { case (l, q) =>
      val c = labCents(l)
      var i = 0
      while (i < d) { val e = q(i) - c(i); tw += e * e; i += 1 }
    }
    var tb = 0L
    byLabel.foreach { case (l, g) =>
      val c = labCents(l)
      var s = 0L; var i = 0
      while (i < d) { val e = c(i) - gCent(i); s += e * e; i += 1 }
      tb += g.length.toLong * s
    }
    val k = byLabel.size; val nv = rows.length
    val ch = (tb.toDouble / (k - 1)) / (tw.toDouble / (nv - k))
    val row = queryRow("q247_calinski_harabasz")
    assert(row.getAs[Long]("n_vectors") === nv.toLong)
    assert(row.getAs[Long]("n_labels") === k.toLong)
    assert(row.getAs[Long]("trace_w") === tw)
    assert(row.getAs[Long]("trace_b") === tb)
    assert(math.abs(row.getAs[Double]("ch") - ch) < 1e-12 * ch)
  }

  test("q248 minimax isotonic fit equals sequential weighted PAVA") {
    // reference: classic PAVA sweep with exact-rational pool means
    // (BigInt cross-multiplication comparisons — no float until the
    // final mean), over the same collapsed (x → sum, weight) domain
    val dom = graft.core.Tables.lineitem(spark, sfDir)
      .selectExpr("cast(l_quantity as long) x",
        "cast(round(l_discount * 100) as long) c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (x, g) =>
        (x, g.map(_._2).sum, g.length.toLong)
      }.toArray.sortBy(_._1)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[
      (BigInt, BigInt, Int)] // (sum, weight, span)
    dom.foreach { case (_, sx, wx) =>
      var s = BigInt(sx); var w = BigInt(wx); var span = 1
      while (blocks.nonEmpty &&
        blocks.last._1 * w >= s * blocks.last._2) { // prevMean >= curMean
        val (ps, pw, pc) = blocks.remove(blocks.length - 1)
        s += ps; w += pw; span += pc
      }
      blocks += ((s, w, span))
    }
    val pava = blocks.flatMap { case (s, w, span) =>
      Seq.fill(span)(s.toDouble / w.toDouble)
    }
    assert(pava.length === dom.length)
    val fit = SparkEntry.queries("q248_isotonic_fit")(spark, sfDir)
      .orderBy("x").collect()
    fit.zip(pava).foreach { case (row, ref) =>
      val got = row.getAs[Double]("isotonic_fit_pct")
      assert(math.abs(got - ref) < 2e-9,
        s"x=${row.getAs[Long]("x")}: query $got vs PAVA $ref")
    }
    // and the fit is non-decreasing
    fit.map(_.getAs[Double]("isotonic_fit_pct")).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-15)
      case _ =>
    }
  }

  test("q249 AUC equals the brute-force tie-aware pairwise count") {
    import org.apache.spark.sql.functions.{col, size}
    val sl = graft.core.Tables.documents(spark, sfDir)
      .select(size(graft.llm.TextFunctions.tokens(col("text")))
        .cast("long").as("s"), (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val posS = sl.filter(_._2).map(_._1)
    val negS = sl.filterNot(_._2).map(_._1)
    var num2 = BigInt(0) // doubled numerator: 2*wins + ties
    posS.foreach { p =>
      negS.foreach { q =>
        if (p > q) num2 += 2 else if (p == q) num2 += 1
      }
    }
    val auc = num2.toDouble /
      (2.0 * posS.length.toDouble * negS.length.toDouble)
    val row = queryRow("q249_auc_length")
    assert(row.getAs[Long]("n_pos") === posS.length.toLong)
    assert(row.getAs[Long]("n_neg") === negS.length.toLong)
    assert(math.abs(row.getAs[Double]("auc") - auc) < 1e-12)
  }

  test("q250 grid-assembled jackknife SE matches the direct float form") {
    val fo = graft.core.Tables.orders(spark, sfDir)
      .selectExpr("cast(o_custkey % 32 as long) f",
        "cast(round(o_totalprice * 100) as long) cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val folds = fo.groupBy(_._1).map { case (_, g) =>
      (g.map(_._2).sum, g.length.toLong)
    }.toArray
    val st = folds.map(_._1).sum; val nt = folds.map(_._2).sum
    val g = folds.length
    val thetas = folds.map { case (sc, nc) =>
      (st - sc).toDouble / (nt - nc).toDouble
    }
    val mean = thetas.sum / g
    val varJack = thetas.map(t => (t - mean) * (t - mean)).sum *
      (g - 1).toDouble / g.toDouble
    val row = queryRow("q250_jackknife_se")
    assert(row.getAs[Long]("n_orders") === nt)
    assert(row.getAs[Long]("revenue_cents") === st)
    // query quantizes each theta to the 1e-9 grid before Σg/Σg²;
    // the direct form doesn't — agree to the grid's error budget
    assert(math.abs(row.getAs[Double]("jack_se_cents") - math.sqrt(varJack))
      < 1e-4 * math.max(1.0, math.sqrt(varJack)))
  }

  test("q238 Kaplan–Meier terminal step with d == n_at_risk pins to " +
      "the grid floor: survival 0, log_survival finite") {
    // fixture whose spans are ALL within the 365-day censor horizon,
    // so the largest span day has every remaining at-risk order
    // eventing (d == n_at_risk) — the log(0) = -Inf hole the sf
    // fixtures' >365-day spans never exercise
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-km").toString
    val li = Seq(
        (1L, "1995-01-01"), (1L, "1995-01-01"), // span 0
        (2L, "1995-01-01"), (2L, "1995-01-06"), // span 5
        (3L, "1995-02-01"), (3L, "1995-02-06"), // span 5
        (4L, "1995-03-01"), (4L, "1995-03-11")) // span 10 (largest)
      .toDF("l_orderkey", "d")
      .select(col("l_orderkey"),
        col("d").cast("timestamp").as("l_shipdate"))
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = SparkEntry.queries("q238_kaplan_meier")(spark, tmp)
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("t")).toSeq === Seq(0L, 5L, 10L))
    assert(out.map(_.getAs[Long]("n_at_risk")).toSeq === Seq(4L, 3L, 1L))
    val lng0 = math.floor(math.log(1.0 - 1.0 / 4.0) * 1e9).toLong
    val lng5 = math.floor(math.log(1.0 - 2.0 / 3.0) * 1e9).toLong
    val lngT = -1000000000000L // the guard's grid floor
    assert(out(0).getAs[Double]("log_survival") === lng0 / 1e9)
    assert(out(1).getAs[Double]("log_survival") === (lng0 + lng5) / 1e9)
    val term = out(2)
    assert(term.getAs[Long]("d") === 1L)
    assert(term.getAs[Double]("log_survival") ===
      (lng0 + lng5 + lngT).toDouble / 1e9)
    assert(!term.getAs[Double]("log_survival").isInfinite)
    assert(term.getAs[Double]("survival") === 0.0)
  }
}
