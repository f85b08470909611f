package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity
import graft.operators.KMeans

/** Round-8 widening, part 4: spectral and diversified-ranking operators
  * over the embedding corpus — distributed PCA (top principal component
  * by power iteration, exact integer arithmetic end to end) and MMR
  * (maximal-marginal-relevance) re-ranking, the diversity pass a RAG
  * serving stack runs after ANN retrieval. Both carry DuckDB oracles.
  *
  * Scale notes (100 TB posture):
  *  - q259's only corpus-sized stage is ONE pass through
  *    [[graft.operators.GramMatrixAgg]]: each vector folds into a fixed
  *    (n, Σq, Σqqᵀ) long buffer — no row amplification, and the
  *    exchange carries ≤G = 64 buffer rows total regardless of corpus
  *    size (the classic distributed-Gram trick as a typed aggregate;
  *    r8's declarative form posexploded 4096 cells/vector and was the
  *    bench's hottest line). The power iteration itself runs on the
  *    4096-row covariance table. Partial buffers combine in
  *    DECIMAL(38,0) (n·2^30 overflows long at n ≥ 2^33 in one buffer —
  *    the G-way hash split keeps each buffer under that, addExact
  *    guards it loudly); the
  *    iteration renormalizes to a 1e6 integer grid each step with
  *    explicit sign-handling (Spark DIV truncates toward zero, DuckDB
  *    `//` floors — they agree only on non-negative operands, so both
  *    sides divide magnitudes).
  *  - q260's candidate sets are the top-10 ANN results per probe: every
  *    stage after retrieval runs on O(probes·k²) rows. Scores stay on
  *    the round-6 grid of q45's ranking convention; MMR's λ = 0.5 blend
  *    multiplies by an exactly-representable constant, so the greedy
  *    argmax (score desc, id asc) is bit-portable.
  */
object VectorQueries {

  private val D = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top principal component of the quantized embedding covariance by
    // five power-iteration steps from the uniform start, all exact
    // integer: covariance C = (n·P − s·sᵀ) div n² on the KMeans 2^14
    // grid, iterate w = C·v, renormalize to max|w| = 1e6. Output: the
    // 64 loadings and the Rayleigh-quotient eigenvalue.
    "q259_pca_power" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), KMeans.quantize(col("embedding")).as("qv"))
      // ONE corpus pass, zero row amplification: the typed Gram
      // aggregate folds each vector into a fixed (n, Σq, Σqqᵀ) long
      // buffer per hash group (G groups bound any single buffer's row
      // count — exact-long headroom to G·2^33 rows); the ≤G partial
      // rows then combine in DECIMAL, so the downstream integer math
      // is bit-identical to the old 4096-cells-per-vector explode
      val G = 64
      val parts = emb
        .groupBy(pmod(hash(col("vec_id")), lit(G)).as("g"))
        .agg(graft.operators.GramMatrixAgg.gram(col("qv"), D).as("gr"))
        .select(col("gr.n"), col("gr.s"), col("gr.p"))
        .collect() // ≤G fixed-size partial buffers (~2 MB) — the
                   // bounded k-row pull category (VERDICT collect
                   // audit), NOT a corpus pull; everything after this
                   // line is O(d²) work on a 64×64 matrix, which r8's
                   // distributed form paid ~500 32-partition micro-
                   // stages to schedule (that, not the Gram explode,
                   // was most of the 22 s)
      // exact BigInt assembly + iteration — bit-identical to the
      // DuckDB oracle's decimal/DIV SQL form: DIV truncates toward
      // zero, so both sides divide magnitudes and re-sign
      val n = parts.map(r => BigInt(r.getLong(0))).sum
      if (n == 0) {
        import s.implicits._
        Seq.empty[(Long, Double, Double)]
          .toDF("dim", "loading", "eigenvalue")
      } else {
        val sv = Array.fill(D)(BigInt(0))
        val p = Array.fill(D * D)(BigInt(0))
        parts.foreach { r =>
          val sa = r.getSeq[Long](1); val pa = r.getSeq[Long](2)
          var i = 0
          while (i < D) { sv(i) += sa(i); i += 1 }
          var k = 0
          while (k < D * D) { p(k) += pa(k); k += 1 }
        }
        def divTrunc(a: BigInt, b: BigInt): BigInt =
          if (a < 0) -((-a) / b) else a / b // BigInt / already truncates;
                                            // spelled out to mirror the
                                            // oracle's CASE
        val den = n * n
        val c = Array.tabulate(D * D) { k =>
          divTrunc(n * p(k) - sv(k / D) * sv(k % D), den)
        }
        def step(v: Array[BigInt]): Array[BigInt] = {
          val w = Array.tabulate(D) { i =>
            var acc = BigInt(0); var j = 0
            while (j < D) { acc += c(i * D + j) * v(j); j += 1 }
            acc
          }
          val m = w.map(_.abs).max
          if (m == 0) Array.fill(D)(BigInt(0))
          else w.map(x => divTrunc(x * 1000000, m))
        }
        val v3 = Iterator
          .iterate(Array.fill(D)(BigInt(1000000)))(step).drop(5).next()
        val w3 = Array.tabulate(D) { i =>
          var acc = BigInt(0); var j = 0
          while (j < D) { acc += c(i * D + j) * v3(j); j += 1 }
          acc
        }
        val num = (0 until D).map(i => v3(i) * w3(i)).sum
        val dnm = (0 until D).map(i => v3(i) * v3(i)).sum
        val eig = num.toDouble / dnm.toDouble
        import s.implicits._
        (0 until D)
          .map(i => (i.toLong, v3(i).toDouble / 1e6, eig))
          .toDF("dim", "loading", "eigenvalue")
      }
    }),

    // MMR re-ranking: from each probe's cosine top-10, greedily select
    // 3 results maximizing 0.5·relevance − 0.5·max-similarity-to-
    // already-selected — the diversity re-rank after ANN retrieval.
    // Greedy ties break (score desc, neighbor_id asc); every stage
    // after the knn runs on O(probes·k²) rows.
    "q260_mmr_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cand = Similarity.knnBruteForce(
          corpus = emb, queries = emb.where(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("score"))
        .transform(graft.core.Caching.persist)
      val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("ev"))
      // pairwise candidate similarities within each probe's pool
      val ps = cand.select(col("query_id"), col("neighbor_id").as("ca"))
        .join(cand.select(col("query_id"), col("neighbor_id").as("cb")),
          "query_id")
        .where(col("ca") =!= col("cb"))
        .join(vecs.withColumnsRenamed(
          Map("vec_id" -> "ca", "ev" -> "va")), "ca")
        .join(vecs.withColumnsRenamed(
          Map("vec_id" -> "cb", "ev" -> "vb")), "cb")
        .select(col("query_id"), col("ca"), col("cb"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("sim"))
        .transform(graft.core.Caching.persist)
      def argmax(scored: DataFrame): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("mmr").desc, col("neighbor_id").asc)
        scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .drop("rn")
      }
      val s1 = cand
        .transform(df => argmax(df.withColumn("mmr", col("score"))))
        .select(col("query_id"), col("neighbor_id").as("sel1"),
          col("score").as("rel1"))
      val rest2 = cand.join(s1, "query_id")
        .where(col("neighbor_id") =!= col("sel1"))
        .join(ps.withColumnsRenamed(Map("ca" -> "neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .where(col("cb") === col("sel1"))
        .select(col("query_id"), col("neighbor_id"), col("score"),
          col("sel1"),
          (col("score") * 0.5 - col("sim") * 0.5).as("mmr"))
      val s2 = argmax(rest2)
        .select(col("query_id"), col("sel1"),
          col("neighbor_id").as("sel2"), col("score").as("rel2"),
          col("mmr").as("mmr2"))
      val rest3 = cand.join(s2, "query_id")
        .where(col("neighbor_id") =!= col("sel1")
          && col("neighbor_id") =!= col("sel2"))
        .join(ps.withColumnsRenamed(Map("ca" -> "neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .where(col("cb") === col("sel1") || col("cb") === col("sel2"))
        .groupBy(col("query_id"), col("neighbor_id"), col("score"))
        .agg(max(col("sim")).as("msim"))
        .select(col("query_id"), col("neighbor_id"), col("score"),
          (col("score") * 0.5 - col("msim") * 0.5).as("mmr"))
      val s3 = argmax(rest3)
      val out1 = s1.select(col("query_id"), lit(1L).as("mmr_rank"),
        col("sel1").as("neighbor_id"), col("rel1").as("relevance"),
        col("rel1").as("mmr_score"))
      val out2 = s2.select(col("query_id"), lit(2L).as("mmr_rank"),
        col("sel2").as("neighbor_id"), col("rel2").as("relevance"),
        col("mmr2").as("mmr_score"))
      val out3 = s3.select(col("query_id"), lit(3L).as("mmr_rank"),
        col("neighbor_id"), col("score").as("relevance"),
        col("mmr").as("mmr_score"))
      out1.unionByName(out2).unionByName(out3)
    }))

  private val quantCte =
    """qq AS (SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0 + 0.5) AS BIGINT))
         AS qv
       FROM embeddings),
     dim AS (SELECT unnest(range(64)) AS i)"""

  // one covariance power step: w = C·v, renormalized to max|w| = 1e6
  private def powerStepSql(vIn: String, vOut: String): String =
    s"""${vOut}w AS (SELECT cc.i, sum(cc.c * $vIn.v) AS w
         FROM cc JOIN $vIn ON $vIn.vi = cc.j GROUP BY 1),
       ${vOut}m AS (SELECT max(abs(w)) AS m FROM ${vOut}w),
       $vOut AS (SELECT i AS vi,
           CAST(CASE WHEN m = 0 THEN 0
             WHEN w < 0 THEN -((CAST(-w AS HUGEINT) * 1000000) // m)
             ELSE (CAST(w AS HUGEINT) * 1000000) // m END AS BIGINT) AS v
         FROM ${vOut}w, ${vOut}m)"""

  def oracles: Map[String, String] = Map(
    "q259_pca_power" ->
      s"""WITH $quantCte,
         st AS (SELECT dim.i, CAST(sum(qq.qv[dim.i + 1]) AS HUGEINT) AS sv,
             count(*) AS n
           FROM qq, dim GROUP BY 1),
         pp AS (SELECT da.i AS i, db.i AS j,
             sum(CAST(qq.qv[da.i + 1] AS HUGEINT) * qq.qv[db.i + 1]) AS p
           FROM qq, dim da, dim db GROUP BY 1, 2),
         cc AS (SELECT pp.i, pp.j,
             CAST(CASE WHEN (sa.n * pp.p - sa.sv * sb.sv) < 0
               THEN -((-(sa.n * pp.p - sa.sv * sb.sv)) // (sa.n * sa.n))
               ELSE (sa.n * pp.p - sa.sv * sb.sv) // (sa.n * sa.n)
               END AS BIGINT) AS c
           FROM pp JOIN st sa ON sa.i = pp.i JOIN st sb ON sb.i = pp.j),
         v0 AS (SELECT i AS vi, CAST(1000000 AS BIGINT) AS v FROM dim),
         ${powerStepSql("v0", "va")},
         ${powerStepSql("va", "vb")},
         ${powerStepSql("vb", "v1")},
         ${powerStepSql("v1", "v2")},
         ${powerStepSql("v2", "v3")},
         w3 AS (SELECT cc.i, sum(cc.c * v3.v) AS w
           FROM cc JOIN v3 ON v3.vi = cc.j GROUP BY 1),
         ray AS (SELECT sum(CAST(v3.v AS HUGEINT) * w3.w) AS num,
             sum(CAST(v3.v AS HUGEINT) * v3.v) AS dnm
           FROM w3 JOIN v3 ON v3.vi = w3.i)
         SELECT CAST(v3.vi AS BIGINT) AS dim,
           CAST(v3.v AS DOUBLE) / 1e6 AS loading,
           CAST(num AS DOUBLE) / CAST(dnm AS DOUBLE) AS eigenvalue
         FROM v3, ray""",
    "q260_mmr_rerank" ->
      s"""WITH ${EmbeddingQueries.evCte}, ${EmbeddingQueries.nvCte},
         cd AS (SELECT a.vec_id AS qid, b.vec_id AS nid FROM ev a
           JOIN ev b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
         ${EmbeddingQueries.pairDotCte("cd", "qid", "nid")},
         sc AS (SELECT qid, nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
           FROM d JOIN n nq ON nq.vec_id = qid JOIN n ne ON ne.vec_id = nid),
         cand AS (SELECT qid AS query_id, nid AS neighbor_id, score FROM
           (SELECT qid, nid, score, row_number() OVER (PARTITION BY qid
              ORDER BY score DESC, nid ASC) AS rnk FROM sc)
           WHERE rnk <= 10),
         pr AS (SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb
           FROM cand a JOIN cand b ON a.query_id = b.query_id
             AND a.neighbor_id <> b.neighbor_id),
         pd AS (SELECT pr.query_id, pr.ca, pr.cb,
             list_reduce(list_transform(range(64),
               i -> ea.v[i+1] * eb.v[i+1]), (x, y) -> x + y) AS dp
           FROM pr JOIN ev ea ON ea.vec_id = pr.ca
                   JOIN ev eb ON eb.vec_id = pr.cb),
         ps AS (SELECT query_id, ca, cb,
             round(pd.dp / (na.nrm * nb.nrm), 6) AS sim
           FROM pd JOIN n na ON na.vec_id = ca JOIN n nb ON nb.vec_id = cb),
         s1 AS (SELECT query_id, neighbor_id AS sel1, score AS rel1 FROM
           (SELECT query_id, neighbor_id, score, row_number() OVER
              (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC)
              AS rn FROM cand) WHERE rn = 1),
         t2 AS (SELECT c.query_id, c.neighbor_id, c.score, s1.sel1,
             c.score * 0.5 - ps.sim * 0.5 AS mmr
           FROM cand c JOIN s1 ON s1.query_id = c.query_id
             JOIN ps ON ps.query_id = c.query_id
               AND ps.ca = c.neighbor_id AND ps.cb = s1.sel1
           WHERE c.neighbor_id <> s1.sel1),
         s2 AS (SELECT query_id, sel1, neighbor_id AS sel2, score AS rel2,
             mmr AS mmr2 FROM
           (SELECT query_id, sel1, neighbor_id, score, mmr,
              row_number() OVER (PARTITION BY query_id
                ORDER BY mmr DESC, neighbor_id ASC) AS rn FROM t2)
           WHERE rn = 1),
         t3 AS (SELECT c.query_id, c.neighbor_id, c.score,
             c.score * 0.5 - max(ps.sim) * 0.5 AS mmr
           FROM cand c JOIN s2 ON s2.query_id = c.query_id
             JOIN ps ON ps.query_id = c.query_id
               AND ps.ca = c.neighbor_id
               AND (ps.cb = s2.sel1 OR ps.cb = s2.sel2)
           WHERE c.neighbor_id <> s2.sel1 AND c.neighbor_id <> s2.sel2
           GROUP BY 1, 2, 3),
         s3 AS (SELECT query_id, neighbor_id, score, mmr FROM
           (SELECT query_id, neighbor_id, score, mmr, row_number() OVER
              (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id ASC)
              AS rn FROM t3) WHERE rn = 1)
         SELECT query_id, CAST(1 AS BIGINT) AS mmr_rank,
           sel1 AS neighbor_id, rel1 AS relevance, rel1 AS mmr_score
         FROM s1
         UNION ALL
         SELECT query_id, CAST(2 AS BIGINT), sel2, rel2, mmr2 FROM s2
         UNION ALL
         SELECT query_id, CAST(3 AS BIGINT), neighbor_id, score, mmr
         FROM s3""")
}
