package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column, in bit-exact
  * integer arithmetic so an external engine reproduces the exact same
  * clustering (same pattern as the integer-quantized PageRank in
  * `PageRank.scala`: quantize once, then every comparison and every
  * centroid update is integer math with a deterministic rounding rule).
  *
  * Reference scope: FLINK.NET ships no clustering, but a training-data
  * pipeline needs one (topic balancing, dedup-cluster seeding, embedding
  * QA); this is the §"beyond the reference" ML tier next to IVF-Flat in
  * `llm/Similarity.scala`.
  *
  * Scale shape (the MLlib shape):
  *  - assignment is a ZERO-SHUFFLE narrow map: the k×d centroid matrix is
  *    a broadcast-sized literal folded into the row expression, so each
  *    pass streams the corpus once inside whole-stage codegen;
  *  - recompute is ONE hash-agg shuffle per iteration producing k×(d+1)
  *    longs (per-dim sums + counts as columns, map-side partials — the
  *    corpus never re-partitions);
  *  - the only driver materialization is those k rows per iteration —
  *    centroids are driver state re-broadcast each round, exactly like a
  *    prefix-sum offset table. Nothing driver-side scales with n.
  *
  * Determinism rules (mirrored verbatim in the DuckDB oracle):
  *  - coordinates quantize to round-half-up(x·2^14) longs;
  *  - distance is integer squared-L2; argmin ties break to the LOWER
  *    centroid id (strict `<` while scanning ids ascending);
  *  - new centroid coordinate = round-half-up(sum/n) computed as
  *    floorDiv(2·sum + n, 2·n) in exact integer math;
  *  - seeds are the k smallest vec_ids' vectors (no RNG);
  *  - a centroid whose cluster empties drops out (both engines drop it
  *    identically; never happens on non-degenerate embedding data).
  */
object KMeans {

  val Scale = 16384L // 2^14: |q| ≤ ~2^15 for unit-norm-ish floats, so a
                     // 64-dim squared distance stays ≤ ~2^36 — Long-safe
                     // headroom up to ~2^26 rows per cluster sum.

  /** round-half-up(x·Scale) as a long — the q86/q99 quantization rule. */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * lit(Scale.toDouble) + lit(0.5)).cast("long"))

  /** One assignment pass: per-row argmin over the broadcast centroid
    * literal. `centroids` are (cid, coords) with coords.length = d.
    * `array_min` over (d, c) structs — lexicographic struct compare =
    * smallest distance, ties to the LOWEST cid, exactly the ascending
    * strict-`<` scan (r16: the previous when-fold referenced its
    * accumulator twice per centroid, doubling the expression tree per
    * centroid — 2^k nodes; this is linear in k, same values).
    */
  private def assignExpr(qv: Column, centroids: Seq[(Long, Seq[Long])]): Column =
    array_min(array(centroids.sortBy(_._1).map { case (cid, coords) =>
      struct(
        aggregate(
          zip_with(qv, typedlit(coords), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, v) => s + v).as("d"),
        lit(cid).as("c"))
    }: _*))

  /** Run `iters` assignment passes (centroids recomputed between passes,
    * not after the last). Returns the final assignment:
    * (vec_id, cid, dist) — dist is the integer squared-L2 to the centroid
    * the row was assigned against.
    */
  def assign(embeddings: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame =
    assignWithCentroids(embeddings, idCol, vecCol, k, iters)._1

  /** One `trained()` run serving BOTH faces — the natural IVF flow
    * (centroids for the build plus the assignments) without running
    * the full multi-pass Lloyd loop twice. Returns (assignments as in
    * [[assign]], centroids as in [[centroids]]). The quantized corpus
    * stays persisted because the assignment DataFrame is lazy over it;
    * callers needing only the centroid table get the unpersist via
    * [[centroids]].
    */
  def assignWithCentroids(embeddings: DataFrame, idCol: String,
                          vecCol: String, k: Int, iters: Int)
      : (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (q, cents) = trained(embeddings, idCol, vecCol, k, iters)
    val best = assignExpr(col("qv"), cents)
    val asn = q.select(col("vec_id"), best.getField("c").as("cid"),
      best.getField("d").as("dist"))
    val cdf = cents.map { case (cid, coords) =>
      (cid, coords.map(_.toDouble / Scale.toDouble))
    }.toDF("cid", "cv")
    (asn, cdf)
  }

  /** The centroids the FINAL assignment pass runs against (seeds after
    * iters−1 recomputes), dequantized back to doubles (exact division
    * by the power-of-two scale): (cid, cv array<double>) — the table
    * [[graft.llm.Similarity.ivfBuildWith]] takes as its coarse
    * quantizer, wiring "sampled k-means centroids" end-to-end (q313).
    * cids are the seed vec_ids (the k smallest).
    */
  def centroids(embeddings: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (q, cents) = trained(embeddings, idCol, vecCol, k, iters)
    q.unpersist() // centroids are a driver-side Seq — the quantized
                  // corpus has served its last pass
    cents.map { case (cid, coords) =>
      (cid, coords.map(_.toDouble / Scale.toDouble))
    }.toDF("cid", "cv")
  }

  /** Seeds + iters−1 (assign → recompute) rounds; returns the persisted
    * quantized corpus and the final-pass centroid literals.
    */
  private def trained(embeddings: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int)
      : (DataFrame, Seq[(Long, Seq[Long])]) = {
    require(k > 0 && iters > 0)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings
      .select(col(idCol).cast("long").as("vec_id"), quantize(col(vecCol)).as("qv"))
      // consumed once per assignment pass + once per recompute
      .transform(graft.core.Caching.persist)
    // seeds: the k smallest vec_ids' quantized vectors (tiny sorted take)
    var centroids: Seq[(Long, Seq[Long])] = q.orderBy("vec_id").limit(k)
      .as[(Long, Seq[Long])].collect().toSeq
    // dims from the seed rows — one fewer driver job than a head() on q
    // (empty input fails on the same seed collect either way)
    val d = centroids.head._2.length

    var pass = 1
    while (pass < iters) {
      val best = assignExpr(col("qv"), centroids)
      val assigned = q.select(col("vec_id"), col("qv"),
        best.getField("c").as("cid"))
      // one hash-agg shuffle: k rows × (d sums + count) — columnar
      // per-dim sums so the partial aggregate is map-side combined
      val sums = (0 until d).map(i => sum(col("qv")(i)).as(s"s$i"))
      val rows = assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      centroids = rows.map { r =>
        val n = r.getAs[Long]("n")
        val coords = (0 until d).map { i =>
          val s = r.getAs[Long](s"s$i")
          Math.floorDiv(2 * s + n, 2 * n) // round-half-up(s/n), exact
        }
        r.getAs[Long]("cid") -> coords
      }.toSeq
      pass += 1
    }
    (q, centroids)
  }

  /** Cluster summary for the oracle surface: size and inertia (Σ dist of
    * members against their assignment-time centroid) per cluster.
    */
  def summary(embeddings: DataFrame, idCol: String, vecCol: String,
              k: Int, iters: Int): DataFrame = {
    val a = assign(embeddings, idCol, vecCol, k, iters)
    a.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("dist")).as("inertia"))
  }

  /** DuckDB oracle for `summary` — the same passes unrolled as CTEs.
    * Centroid recompute uses CAST(floor((2·s+n)/(2.0·n)) AS BIGINT):
    * all operands are < 2^53 so the double division is exact enough that
    * its floor equals integer floorDiv (the ratio is never within one
    * double ULP of an integer unless it IS that integer).
    */
  def oracleSql(k: Int, iters: Int, dims: Int): String = {
    require(iters >= 1)
    val base =
      s"""WITH q AS (SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * $Scale.0 + 0.5) AS BIGINT)) AS qv
       FROM embeddings),
     dim AS (SELECT unnest(range($dims)) AS i),
     c0 AS (SELECT q.vec_id AS cid, dim.i, q.qv[dim.i + 1] AS c
            FROM q, dim
            WHERE q.vec_id IN (SELECT vec_id FROM q ORDER BY vec_id LIMIT $k))"""
    val passes = (1 to iters).map { p =>
      val cin = s"c${p - 1}"
      val dist =
        s"""d$p AS (SELECT q.vec_id, c.cid,
           sum((q.qv[c.i + 1] - c.c) * (q.qv[c.i + 1] - c.c)) AS dist
         FROM q, $cin c GROUP BY 1, 2),
     a$p AS (SELECT vec_id, cid, dist FROM (
           SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           FROM d$p) WHERE rn = 1)"""
      val recompute =
        if (p == iters) ""
        else s""",
     s$p AS (SELECT a$p.cid, dim.i, sum(q.qv[dim.i + 1]) AS s, count(*) AS n
         FROM a$p JOIN q USING (vec_id), dim GROUP BY 1, 2),
     c$p AS (SELECT cid, i,
           CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) AS c FROM s$p)"""
      s",\n     $dist$recompute"
    }.mkString
    s"""$base$passes
     SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(dist) AS BIGINT) AS inertia
     FROM a$iters GROUP BY cid"""
  }
}
