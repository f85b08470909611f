package graft

import java.math.RoundingMode
import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-level cross-checks for the q251–q260 evaluation pack.
  *
  * The oracle gate proves Spark == DuckDB, but both sides share the
  * FORMULA (integer grids, shared literal constants); these tests
  * validate the formulas against independent reference algorithms on
  * the sf0.001 fixture: double-precision power iteration for the
  * integer-grid PCA, a driver-side sorted brute force for nDCG/MRR,
  * a direct float ECE/Brier recompute (no grid), a sequential greedy
  * for MMR, a from-scratch KMV sketch evaluation, and a sequential
  * float Markov iteration. Collects are test-only (≤ a few thousand
  * fixture rows), never in the queries.
  */
class EvalCrossSpec extends AnyFunSuite {
  import TestSession._

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val vecs: Map[Long, (Array[Double], Int)] =
    graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) ev", "label")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getInt(2)))
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  /** (query -> candidates ranked by (round6 cosine desc, id asc)). */
  private lazy val ranked: Map[Long, Seq[(Long, Double)]] =
    vecs.keys.filter(_ < 10).map { q =>
      val qv = vecs(q)._1
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, (v, _)) => (id, round6(cosine(qv, v))) }
        .sortBy { case (id, s) => (-s, id) }
    }.toMap

  test("q253 nDCG matches a double-precision brute force") {
    val out = SparkEntry.queries("q253_ndcg_retrieval")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.size === 10)
    ranked.foreach { case (q, cand) =>
      val qLabel = vecs(q)._2
      val rels = cand.map { case (id, _) => vecs(id)._2 == qLabel }
      val dcg = rels.take(10).zipWithIndex.collect {
        case (true, i) => 1.0 / (math.log(i + 2) / math.log(2))
      }.sum
      val nRel = rels.count(identity)
      val idcg = (1 to math.min(10, nRel))
        .map(r => 1.0 / (math.log(r + 1) / math.log(2))).sum
      val expected = if (nRel == 0) 0.0 else dcg / idcg
      val got = out(q).getAs[Double]("ndcg")
      assert(math.abs(got - expected) < 1e-9,
        s"q=$q ndcg $got vs brute $expected")
      assert(out(q).getAs[Long]("n_rel") === nRel.toLong)
    }
  }

  test("q254 MRR/hits match the brute-force ranking exactly") {
    val out = SparkEntry.queries("q254_mrr_recall")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    ranked.foreach { case (q, cand) =>
      val qLabel = vecs(q)._2
      val relIdx = cand.take(10).zipWithIndex
        .filter { case ((id, _), _) => vecs(id)._2 == qLabel }
        .map(_._2 + 1)
      assert(out(q).getAs[Long]("hit1") === relIdx.count(_ <= 1).toLong)
      assert(out(q).getAs[Long]("hit5") === relIdx.count(_ <= 5).toLong)
      assert(out(q).getAs[Long]("hit10") === relIdx.size.toLong)
      val rr = relIdx.headOption.map(1.0 / _).getOrElse(0.0)
      assert(math.abs(out(q).getAs[Double]("rr") - rr) < 1e-15)
    }
  }

  test("q260 MMR selections match a sequential greedy") {
    val out = SparkEntry.queries("q260_mmr_rerank")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("mmr_rank"))
        .map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    ranked.foreach { case (q, cand) =>
      val pool = cand.take(10)
      val rel = pool.toMap
      var selected = Vector.empty[Long]
      while (selected.size < 3) {
        val next = pool.filterNot(p => selected.contains(p._1))
          .map { case (id, r) =>
            val mmr =
              if (selected.isEmpty) r
              else r * 0.5 - selected.map(s =>
                round6(cosine(vecs(id)._1, vecs(s)._1))).max * 0.5
            (id, mmr)
          }
          .minBy { case (id, m) => (-m, id) }._1
        selected :+= next
      }
      assert(out(q) === selected, s"q=$q")
    }
  }

  test("q259 loadings and eigenvalue match double-precision power " +
      "iteration on the same quantized covariance") {
    val out = SparkEntry.queries("q259_pca_power")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("dim"),
        r.getAs[Double]("loading"), r.getAs[Double]("eigenvalue")))
      .sortBy(_._1)
    val d = 64
    val q = vecs.values.map { case (v, _) =>
      v.map(x => math.floor(x * 16384.0 + 0.5)) }.toArray
    val n = q.length.toDouble
    val s = Array.tabulate(d)(j => q.map(_(j)).sum)
    val c = Array.tabulate(d, d) { (i, j) =>
      val p = q.map(v => v(i) * v(j)).sum
      // the query truncates (n·P − s_i s_j) / n² toward zero
      val exact = (n * p - s(i) * s(j)) / (n * n)
      if (exact < 0) math.ceil(exact) else math.floor(exact)
    }
    var v = Array.fill(d)(1e6)
    for (_ <- 1 to 5) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(x =>
        if (m == 0) 0.0
        else if (x < 0) -math.floor(-x * 1e6 / m) else math.floor(x * 1e6 / m))
    }
    val w3 = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    val num = (0 until d).map(i => v(i) * w3(i)).sum
    val dnm = (0 until d).map(i => v(i) * v(i)).sum
    out.foreach { case (dim, loading, eig) =>
      assert(math.abs(loading - v(dim.toInt) / 1e6) < 1e-3,
        s"dim=$dim loading $loading vs float ${v(dim.toInt) / 1e6}")
      assert(math.abs(eig - num / dnm) < math.abs(num / dnm) * 1e-3 + 1e-6)
    }
    // the iterate is genuinely spectral: one more double step barely
    // rotates it (cos > 0.999 against its own next iterate)
    val nv = math.sqrt(dnm); val nw = math.sqrt(w3.map(x => x * x).sum)
    assert(num / (nv * nw) > 0.99, "power iterate far from fixed point")
  }

  test("q255 ECE and Brier match a gridless double recompute") {
    val stop = graft.queries.LlmQueries.stopwords.toSet
    val rows = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("text", "lang").collect().map { r =>
        val toks = r.getString(0).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        val p = if (toks.isEmpty) 0.0
          else toks.count(stop.contains).toDouble / toks.length
        (p, if (r.getString(1) == "en") 1.0 else 0.0)
      }
    val nn = rows.length.toDouble
    val byBin = rows.groupBy { case (p, _) =>
      math.min(math.floor(p * 10).toLong, 9L) }
    val ece = byBin.values.map { g =>
      math.abs(g.map(_._2).sum - g.map(_._1).sum) }.sum / nn
    val brier = rows.map { case (p, y) => (p - y) * (p - y) }.sum / nn
    val out = SparkEntry.queries("q255_calibration")(spark, sfDir).collect()
    assert(math.abs(out.head.getAs[Double]("ece") - ece) < 1e-6)
    assert(math.abs(out.head.getAs[Double]("brier") - brier) < 1e-6)
    out.foreach { r =>
      val g = byBin(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_docs") === g.length.toLong)
      assert(math.abs(r.getAs[Double]("conf")
        - g.map(_._1).sum / g.length) < 1e-6)
    }
  }

  test("q256 Fleiss' kappa matches a direct driver-side computation") {
    val stop = graft.queries.LlmQueries.stopwords.toSet
    val nps = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("text", "n_chars").collect().map { r =>
        val toks = r.getString(0).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        val p = if (toks.isEmpty) 0.0
          else toks.count(stop.contains).toDouble / toks.length
        (if (r.getLong(1) > 500) 1 else 0) +
          (if (toks.length > 80) 1 else 0) + (if (p >= 0.25) 1 else 0)
      }
    val nI = nps.length.toDouble
    val pBar = nps.map(np => np * np + (3 - np) * (3 - np) - 3).sum /
      (6.0 * nI)
    val pPos = nps.sum / (3.0 * nI)
    val pE = pPos * pPos + (1 - pPos) * (1 - pPos)
    val kappa = (pBar - pE) / (1 - pE)
    val r = SparkEntry.queries("q256_fleiss_kappa")(spark, sfDir)
      .collect()(0)
    assert(r.getAs[Long]("n_items") === nps.length.toLong)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-12)
  }

  test("q257 KMV estimates match a from-scratch sequential sketch and " +
      "stay within sketch error of exact") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(tok: String): Long = {
      val dig = md.digest(s"11|$tok".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.take(4).map("%02x".format(_)).mkString, 16)
    }
    val bySource: Map[String, Set[String]] =
      graft.core.Tables.documents(spark, sfDir)
        .selectExpr("source", "text").collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.flatMap(_.getString(1).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty)).toSet).toMap
    val sketches = bySource.view.mapValues { toks =>
      val hs = toks.map(h).toSeq.sorted.take(256)
      val theta = if (hs.size < 256) 4294967296L else hs.max
      (hs.toSet, theta)
    }.toMap
    val out = SparkEntry.queries("q257_theta_sketch_setops")(spark, sfDir)
      .collect()
    assert(out.length === bySource.size * (bySource.size - 1) / 2)
    out.foreach { r =>
      val (sa, sb) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (ha, ta) = sketches(sa); val (hb, tb) = sketches(sb)
      val th = math.min(ta, tb)
      val na = ha.count(_ < th); val nb = hb.count(_ < th)
      val ni = ha.intersect(hb).count(_ < th)
      assert(r.getAs[Long]("na") === na.toLong, s"$sa/$sb")
      assert(r.getAs[Long]("ni") === ni.toLong, s"$sa/$sb")
      val estU = (na + nb - ni) * 4294967296.0 / th
      assert(math.abs(r.getAs[Double]("est_union") - estU) < 1e-6)
      // statistical contract: k=256 ⇒ RSE ≈ 1/√254 ≈ 6.3%; allow 5σ
      val exactU = r.getAs[Long]("exact_union").toDouble
      assert(math.abs(r.getAs[Double]("est_union") - exactU)
        <= 0.32 * exactU + 32.0,
        s"$sa/$sb union est ${r.getAs[Double]("est_union")} vs $exactU")
    }
  }

  test("q258 stationary distribution matches a sequential float " +
      "iteration and sums to ~1") {
    val trans = graft.core.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) t", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values
      .flatMap { evs =>
        val sorted = evs.sortBy(e => (e._2, e._3)).map(_._4)
        sorted.zip(sorted.drop(1))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = graft.core.Tables.events(spark, sfDir)
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    val rowSum = types.map(t =>
      t -> trans.collect { case ((f, _), c) if f == t => c }.sum).toMap
    var x = types.map(_ -> 1.0 / types.length).toMap
    for (_ <- 1 to 3) {
      x = types.map { j =>
        val inflow = types.collect {
          case i if rowSum(i) > 0 =>
            x(i) * trans.getOrElse((i, j), 0L).toDouble / rowSum(i)
        }.sum
        val self = if (rowSum(j) == 0) x(j) else 0.0
        j -> (inflow + self)
      }.toMap
    }
    val out = SparkEntry.queries("q258_markov_stationary")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_out"), r.getAs[Double]("p3"))).toMap
    assert(out.keySet === types.toSet)
    types.foreach { t =>
      assert(out(t)._1 === rowSum(t), s"n_out($t)")
      assert(math.abs(out(t)._2 - x(t)) < 1e-6, s"p3($t)")
    }
    // grid floor-division only ever LOSES mass, ≤ |types|²/1e12 per step
    val mass = out.values.map(_._2).sum
    assert(mass <= 1.0 + 1e-12 && mass > 1.0 - 1e-6)
  }

  test("q251/q252 mixing weights and budget quotas are consistent") {
    val rows = SparkEntry.queries("q251_temperature_mixture")(spark, sfDir)
      .collect()
    val shares = rows.map(_.getAs[Double]("share")).sum
    val ws = rows.map(_.getAs[Double]("w_sqrt")).sum
    assert(math.abs(shares - 1.0) < 1e-9 && math.abs(ws - 1.0) < 1e-9)
    // sqrt temperature flattens: small sources gain, large sources shed
    val minRow = rows.minBy(_.getAs[Long]("n_tokens"))
    val maxRow = rows.maxBy(_.getAs[Long]("n_tokens"))
    assert(minRow.getAs[Double]("w_sqrt") >= minRow.getAs[Double]("share"))
    assert(maxRow.getAs[Double]("w_sqrt") <= maxRow.getAs[Double]("share"))
    val b = SparkEntry.queries("q252_token_budget")(spark, sfDir).collect()
    b.foreach { r =>
      assert(r.getAs[Long]("quota_tokens")
        <= r.getAs[Long]("n_tokens") * 4)
      assert(r.getAs[Long]("quota_tokens") + r.getAs[Long]("shortfall")
        === r.getAs[Long]("ideal_tokens"))
    }
    // the un-capped ideal allocation exhausts the budget up to the
    // per-source floor losses
    val ideals = b.map(_.getAs[Long]("ideal_tokens")).sum
    assert(ideals <= 1000000L && ideals > 1000000L - b.length)
  }
}
