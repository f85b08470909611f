package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Similarity, TextFunctions => TF}

/** Round-8 widening, part 3: the evaluation-and-mixing layer a training
  * pipeline runs AFTER curation — temperature-scaled source mixing and
  * token-budget allocation (the sampling-weights step of every LLM data
  * recipe), retrieval-quality metrics over the embedding index (nDCG@10,
  * MRR, recall@k — the eval harness for q45/q66's ANN operators),
  * classifier calibration (reliability bins, ECE, Brier), multi-rater
  * agreement (Fleiss' kappa over a deterministic quality-screen
  * ensemble), theta-sketch set operations (mergeable KMV union/
  * intersection estimates between sources), and a Markov stationary
  * distribution over the event-transition graph. Every query carries a
  * DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *  - q251/q252 collapse the corpus in ONE per-source hash aggregate;
  *    everything downstream runs on the ≤|sources|-row weight table
  *    (broadcast 1-row totals, no second corpus pass).
  *  - q253/q254 ride `Similarity.knnBruteForce`: the probe set is
  *    broadcast, the corpus never shuffles, and ranking goes through
  *    TopKAggregator (map-side partials keep k rows — the shuffle is
  *    O(partitions·k) per probe, not corpus-sized).
  *  - q255/q256 are one codegen'd map stage plus one hash aggregate;
  *    float discipline: per-row terms quantized to integer grids
  *    (1e9), summed as longs, one division at the end.
  *  - q257's sketch IS the scale story: per-source state is bounded at
  *    k=256 hashes however large the source; the pairwise stage runs on
  *    |sources|·k rows. The exact columns (for error measurement) do
  *    one distinct-token aggregate — the thing the sketch replaces at
  *    100 TB — and stay joined here so the oracle verifies both faces.
  *  - q258's transition matrix is |types|² (tiny) after one windowed
  *    lead per user partition; the three power-iteration steps are
  *    joins on that tiny table in exact integer (1e12-grid) arithmetic.
  */
object EvalQueries {

  /** floor(1e15 / log2(r+1)) for r = 1..10 — the nDCG rank discounts on
    * a fixed integer grid, precomputed so Spark and the oracle share
    * literal-exact constants (no cross-libm log2 surface).
    */
  private val discountGrid = Seq(
    1000000000000000L, 630929753571457L, 500000000000000L, 430676558073393L,
    386852807234541L, 356207187108022L, 333333333333333L, 315464876785728L,
    301029995663981L, 289064826317887L)
  /** Prefix sums of `discountGrid`: ideal DCG for m = 1..10 relevant. */
  private val idcgGrid = discountGrid.scanLeft(0L)(_ + _).tail

  private def sqlLongList(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")

  /** Per-source (n_docs, n_tokens, wn) where wn = floor(sqrt(n_tokens)
    * * 1e6) — the alpha = 0.5 temperature weight numerator on an integer
    * grid. sqrt is IEEE-correctly-rounded in both engines, so the grid
    * value is portable (no pow()).
    */
  private def sourceWeights(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(col("text"))).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double")) * lit(1e6)).as("wn"))

  private val weightsCte =
    s"""${LlmQueries.tkCte},
       g AS (SELECT source, count(*) AS n_docs,
           CAST(sum(len(t)) AS BIGINT) AS n_tokens
         FROM tk GROUP BY source),
       w AS (SELECT source, n_docs, n_tokens,
           CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS wn
         FROM g)"""

  /** Top-10 exact-cosine neighborhoods of the probe set (vec_id < 10)
    * with same-label relevance flags — shared by q253/q254.
    */
  private def rankedNeighbors(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val labels = emb.select(col("vec_id").as("lid"), col("label"))
    val knn = Similarity.knnBruteForce(
      corpus = emb, queries = emb.where(col("vec_id") < 10),
      idCol = "vec_id", vecCol = "embedding", k = 10)
    knn
      .join(broadcast(labels.where(col("lid") < 10)
        .withColumnsRenamed(Map("lid" -> "qlid", "label" -> "qlabel"))),
        col("query_id") === col("qlid"))
      .join(labels, col("neighbor_id") === col("lid"))
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        (col("label") === col("qlabel")).cast("long").as("rel"))
  }

  /** Per-probe relevant-population size (all same-label vectors minus
    * self) — the nDCG ideal and recall denominator.
    */
  private def relCounts(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val byLabel = emb.groupBy(col("label")).agg(count(lit(1)).as("nl"))
    emb.where(col("vec_id") < 10)
      .join(broadcast(byLabel), "label")
      .select(col("vec_id").as("query_id"), (col("nl") - 1).as("n_rel"))
  }

  // probe knn + relevance, shared by the q253/q254 oracles (rank over
  // round(cosine, 6) desc, id asc — q45's exact ranking convention)
  private val probeKnnCte =
    s"""${EmbeddingQueries.evCte}, ${EmbeddingQueries.nvCte},
       cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid FROM ev a
         JOIN ev b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
       ${EmbeddingQueries.pairDotCte("cand", "qid", "nid")},
       sc AS (SELECT qid, nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
         FROM d JOIN n nq ON nq.vec_id = qid JOIN n ne ON ne.vec_id = nid),
       r AS (SELECT qid AS query_id, nid AS neighbor_id,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY score DESC, nid ASC) AS BIGINT) AS rnk FROM sc),
       lb AS (SELECT vec_id, label FROM embeddings),
       rk AS (SELECT r.query_id, r.neighbor_id, r.rnk,
           CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END AS rel
         FROM r JOIN lb lq ON lq.vec_id = r.query_id
                JOIN lb ln ON ln.vec_id = r.neighbor_id
         WHERE r.rnk <= 10),
       nr AS (SELECT e.vec_id AS query_id, count(*) - 1 AS n_rel
         FROM embeddings e JOIN embeddings o ON o.label = e.label
         WHERE e.vec_id < 10 GROUP BY 1)"""

  // q255/q256 shared per-document screen: token list, stopword ratio
  // (q38's exact form), and the three deterministic binary raters
  private val screenCte =
    s"""${LlmQueries.tkCte},
       m AS (SELECT tk.doc_id, tk.lang, d2.n_chars, len(tk.t) AS ntok,
           CASE WHEN len(tk.t) = 0 THEN 0.0
                ELSE CAST(len(list_filter(tk.t, x ->
                  list_contains(${LlmQueries.stopListSql}, x))) AS DOUBLE)
                  / len(tk.t) END AS p
         FROM tk JOIN documents d2 ON d2.doc_id = tk.doc_id)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Temperature-scaled source mixing: per-source token mass, the
    // natural share (alpha = 1) and the sqrt-temperature weight
    // (alpha = 0.5, the standard up-weighting of small sources in LLM
    // data recipes). One corpus aggregate; totals broadcast back over
    // the |sources|-row table.
    "q251_temperature_mixture" -> ((s, dir) => {
      val w = sourceWeights(s, dir)
      val tot = w.agg(sum(col("n_tokens")).as("tt"), sum(col("wn")).as("tw"))
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("tt").cast("double"))
            .as("share"),
          (col("wn").cast("double") / col("tw").cast("double"))
            .as("w_sqrt"))
    }),

    // Token-budget allocation under the sqrt-temperature weights: each
    // source's ideal draw from a 1M-token budget, capped at 4 epochs of
    // its actual mass (exact integer arithmetic: DECIMAL(38,0) product,
    // integral division — no float quota boundaries, the q203 rule).
    "q252_token_budget" -> ((s, dir) => {
      val w = sourceWeights(s, dir)
      val tot = w.agg(sum(col("wn")).as("tw"))
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * wn DIV tw")
            .as("ideal_tokens"),
          (col("n_tokens") * 4).as("cap_tokens"))
        .select(col("source"), col("n_tokens"), col("ideal_tokens"),
          least(col("ideal_tokens"), col("cap_tokens")).as("quota_tokens"),
          greatest(col("ideal_tokens") - col("cap_tokens"), lit(0L))
            .as("shortfall"),
          (least(col("ideal_tokens"), col("cap_tokens")).cast("double")
            / col("n_tokens").cast("double")).as("epochs"))
    }),

    // Retrieval quality, graded: nDCG@10 of exact cosine ranking with
    // same-label relevance, on the fixed integer discount grid (both
    // engines share the literal floor(1e15/log2(r+1)) constants — DCG
    // and ideal DCG are exact longs, one division at the end).
    "q253_ndcg_retrieval" -> ((s, dir) => {
      val disc = array(discountGrid.map(lit): _*)
      val idcg = array(idcgGrid.map(lit): _*)
      val dcg = rankedNeighbors(s, dir)
        .groupBy(col("query_id"))
        .agg(sum(col("rel") * element_at(disc, col("rnk").cast("int")))
          .as("dcg_g"))
      dcg.join(relCounts(s, dir), "query_id")
        .select(col("query_id"), col("n_rel"), col("dcg_g"),
          when(col("n_rel") === 0, lit(0L))
            .otherwise(element_at(idcg,
              least(col("n_rel"), lit(10L)).cast("int"))).as("idcg_g"))
        .select(col("query_id"), col("n_rel"), col("dcg_g"), col("idcg_g"),
          when(col("idcg_g") === 0, lit(0.0))
            .otherwise(col("dcg_g").cast("double")
              / col("idcg_g").cast("double")).as("ndcg"))
    }),

    // Retrieval quality, binary: MRR and hits@{1,5,10} per probe —
    // integer hit counts, the reciprocal rank as the single division.
    "q254_mrr_recall" -> ((s, dir) => {
      rankedNeighbors(s, dir)
        .groupBy(col("query_id"))
        .agg(
          sum(when(col("rel") === 1 && col("rnk") === 1, 1L).otherwise(0L))
            .as("hit1"),
          sum(when(col("rel") === 1 && col("rnk") <= 5, 1L).otherwise(0L))
            .as("hit5"),
          sum(col("rel")).as("hit10"),
          min(when(col("rel") === 1, col("rnk"))).as("first_rel"))
        .join(relCounts(s, dir), "query_id")
        .select(col("query_id"), col("n_rel"), col("hit1"), col("hit5"),
          col("hit10"),
          when(col("first_rel").isNull, lit(0.0))
            .otherwise(lit(1.0) / col("first_rel").cast("double")).as("rr"),
          (col("hit10").cast("double") / lit(10.0)).as("p_at_10"))
    }),

    // Classifier calibration: stopword-ratio as a [0,1] score for
    // "lang = en", 10 reliability bins, per-bin accuracy vs confidence,
    // corpus ECE and Brier score. Confidence sums ride the 1e9 integer
    // grid, so ECE = sum_b |n_pos_b*1e9 - conf_g_b| / (1e9*N) is exact
    // integer until ONE division; Brier terms ((p-y)^2, correctly
    // rounded from identical doubles) take the same grid.
    "q255_calibration" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(TF.stopwordRatio(col("text"), LlmQueries.stopwords).as("p"),
          (col("lang") === "en").cast("long").as("y"))
        .select(col("p"), col("y"),
          least(floor(col("p") * 10).cast("long"), lit(9L)).as("bin"),
          floor(col("p") * lit(1e9)).cast("long").as("pg"))
        .select(col("p"), col("y"), col("bin"), col("pg"),
          floor((col("p") - col("y").cast("double"))
            * (col("p") - col("y").cast("double")) * lit(1e9))
            .cast("long").as("bg"))
      // grid sums ride DECIMAL(38,0): a 1e9-grid long summed over 1e12
      // rows overflows int64 — the exact-decimal sum stays exact and
      // casts to the same double in both engines (DuckDB sums BIGINT
      // into HUGEINT natively)
      val bins = base.groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"),
          sum(col("pg").cast("decimal(38,0)")).as("conf_g"),
          sum(col("bg").cast("decimal(38,0)")).as("brier_g"))
      val tot = bins.agg(
        sum(col("n_docs")).as("nn"),
        sum(abs(col("n_pos").cast("decimal(38,0)") * lit(1000000000L)
          - col("conf_g"))).as("gap_g"),
        sum(col("brier_g")).as("tb_g"))
      bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_docs"), col("n_pos"),
          (col("n_pos").cast("double") / col("n_docs").cast("double"))
            .as("acc"),
          (col("conf_g").cast("double") / lit(1e9)
            / col("n_docs").cast("double")).as("conf"),
          (col("gap_g").cast("double") / lit(1e9)
            / col("nn").cast("double")).as("ece"),
          (col("tb_g").cast("double") / lit(1e9)
            / col("nn").cast("double")).as("brier"))
    }),

    // Fleiss' kappa over three deterministic quality raters (chars,
    // token count, stopword ratio): chance-corrected agreement of the
    // screen ensemble. All integer until the three closing divisions.
    "q256_fleiss_kappa" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(
          ((col("n_chars") > 500).cast("long")
            + (TF.tokenCount(col("text")) > 80).cast("long")
            + (TF.stopwordRatio(col("text"), LlmQueries.stopwords)
              >= 0.25).cast("long")).as("np"))
      base.agg(count(lit(1)).as("n_items"), sum(col("np")).as("s_pos"),
          sum(col("np") * col("np")
            + (lit(3L) - col("np")) * (lit(3L) - col("np")) - lit(3L))
            .as("a_sum"))
        .select(col("n_items"), col("s_pos"),
          (col("a_sum").cast("double")
            / (lit(6.0) * col("n_items").cast("double"))).as("p_bar"),
          (col("s_pos").cast("double")
            / (lit(3.0) * col("n_items").cast("double"))).as("p_pos"))
        .select(col("n_items"), col("s_pos"), col("p_bar"), col("p_pos"),
          (col("p_pos") * col("p_pos")
            + (lit(1.0) - col("p_pos")) * (lit(1.0) - col("p_pos")))
            .as("p_e"))
        .select(col("n_items"), col("s_pos"), col("p_bar"), col("p_pos"),
          col("p_e"),
          ((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")))
            .as("kappa"))
    }),

    // Theta-sketch set operations: per-source bottom-256 distinct token
    // hashes (KMV), pairwise union/intersection ESTIMATES from the
    // merged sketch vs EXACT counts — the mergeable-sketch path for
    // cross-source overlap at 100 TB, error-audited in one output.
    "q257_theta_sketch_setops" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 256
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(TF.tokens(col("text"))).as("tok"))
        .distinct()
        .transform(graft.core.Caching.persist)
      val hashes = toks.select(col("source"),
          TF.portableHash(col("tok"), seed = 11).as("h")).distinct()
      val w = Window.partitionBy(col("source")).orderBy(col("h"))
      val sk = hashes
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
        .groupBy(col("source"))
        .agg(collect_list(col("h")).as("hs"), count(lit(1)).as("kn"),
          max(col("h")).as("mx"))
        .select(col("source"), col("hs"), col("kn"),
          when(col("kn") < k, lit(4294967296L)).otherwise(col("mx"))
            .as("theta"))
      val pairs = sk.alias("a").crossJoin(broadcast(sk.alias("b")))
        .where(col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          least(col("a.theta"), col("b.theta")).as("th"),
          col("a.hs").as("ha"), col("b.hs").as("hb"))
        .select(col("src_a"), col("src_b"), col("th"),
          size(filter(col("ha"), x => x < col("th"))).cast("long").as("na"),
          size(filter(col("hb"), x => x < col("th"))).cast("long").as("nb"),
          size(filter(array_intersect(col("ha"), col("hb")),
            x => x < col("th"))).cast("long").as("ni"))
      val exact = toks
        .alias("x").join(toks.alias("y"),
          col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("exact_inter"))
      val sizes = toks.groupBy(col("source"))
        .agg(count(lit(1)).as("nd"))
      pairs
        .join(exact, Seq("src_a", "src_b"), "left")
        .join(sizes.withColumnsRenamed(
          Map("source" -> "src_a", "nd" -> "nda")), "src_a")
        .join(sizes.withColumnsRenamed(
          Map("source" -> "src_b", "nd" -> "ndb")), "src_b")
        .select(col("src_a"), col("src_b"),
          col("th"), col("na"), col("nb"), col("ni"),
          (col("ni").cast("double") * lit(4294967296.0)
            / col("th").cast("double")).as("est_inter"),
          ((col("na") + col("nb") - col("ni")).cast("double")
            * lit(4294967296.0) / col("th").cast("double")).as("est_union"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
          (col("nda") + col("ndb")
            - coalesce(col("exact_inter"), lit(0L))).as("exact_union"))
    }),

    // Markov stationary distribution over the event-transition graph:
    // per-user lead builds the |types|^2 count matrix; three power-
    // iteration steps from uniform run in exact 1e12-grid integer math
    // (per-term DECIMAL product, integral division, long sums — bit-
    // portable, no float accumulation). Absorbing states keep their
    // mass via the self-term.
    "q258_markov_stationary" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // the transition matrix is |types|²-BOUNDED (event types are an
      // enum, not a scaling dimension), so the power iteration runs
      // DRIVER-SIDE on the collected matrix (the q259 charter) instead
      // of ~18 tiny shuffle stages: one windowed corpus pass collects
      // the matrix, one column-pruned pass the type list. Exact BigInt
      // replays the DECIMAL(38,0) DIV arithmetic term for term —
      // truncating division of non-negative operands, per-term division
      // THEN the sum — so every value is bit-identical to the
      // distributed form the oracle mirrors.
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("c"))
        .as[(String, String, Long)].collect()
      val types = Tables.events(s, dir)
        .select(col("event_type")).distinct().as[String].collect()
      require(types.length <= 65536,
        s"event-type domain must be bounded: ${types.length}")
      val rowSums: Map[String, Long] =
        trans.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
      val nt = types.length
      var x: Map[String, BigInt] =
        types.iterator.map(t => t -> BigInt(1000000000000L) / nt).toMap
      (1 to 3).foreach { _ =>
        val xin = scala.collection.mutable.Map.empty[String, BigInt]
        trans.foreach { case (f, t, c) =>
          xin(t) = xin.getOrElse(t, BigInt(0)) + x(f) * c / rowSums(f)
        }
        x = types.iterator.map { t =>
          val xself = if (rowSums.contains(t)) BigInt(0) else x(t)
          t -> (xin.getOrElse(t, BigInt(0)) + xself)
        }.toMap
      }
      types.toSeq
        .map(t => (t, rowSums.getOrElse(t, 0L), x(t).toDouble / 1e12))
        .toDF("event_type", "n_out", "p3")
    }))

  def oracles: Map[String, String] = Map(
    "q251_temperature_mixture" ->
      s"""WITH $weightsCte,
         t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
             CAST(sum(wn) AS BIGINT) AS tw FROM w)
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
           CAST(wn AS DOUBLE) / CAST(tw AS DOUBLE) AS w_sqrt
         FROM w, t""",
    "q252_token_budget" ->
      s"""WITH $weightsCte,
         t AS (SELECT CAST(sum(wn) AS BIGINT) AS tw FROM w),
         a AS (SELECT source, n_tokens,
             CAST(CAST(1000000 AS HUGEINT) * wn // tw AS BIGINT)
               AS ideal_tokens,
             n_tokens * 4 AS cap_tokens
           FROM w, t)
         SELECT source, n_tokens, ideal_tokens,
           least(ideal_tokens, cap_tokens) AS quota_tokens,
           greatest(ideal_tokens - cap_tokens, 0) AS shortfall,
           CAST(least(ideal_tokens, cap_tokens) AS DOUBLE)
             / CAST(n_tokens AS DOUBLE) AS epochs
         FROM a""",
    "q253_ndcg_retrieval" -> {
      val d = sqlLongList(discountGrid)
      val c = sqlLongList(idcgGrid)
      s"""WITH $probeKnnCte,
         dc AS (SELECT query_id,
             CAST(sum(rel * ($d)[CAST(rnk AS INTEGER)]) AS BIGINT) AS dcg_g
           FROM rk GROUP BY 1)
         SELECT dc.query_id, CAST(nr.n_rel AS BIGINT) AS n_rel, dcg_g,
           CAST(CASE WHEN nr.n_rel = 0 THEN 0
             ELSE ($c)[CAST(least(nr.n_rel, 10) AS INTEGER)] END AS BIGINT)
             AS idcg_g,
           CASE WHEN nr.n_rel = 0 THEN 0.0
             ELSE CAST(dcg_g AS DOUBLE)
               / CAST(($c)[CAST(least(nr.n_rel, 10) AS INTEGER)] AS DOUBLE)
             END AS ndcg
         FROM dc JOIN nr ON nr.query_id = dc.query_id"""
    },
    "q254_mrr_recall" ->
      s"""WITH $probeKnnCte,
         h AS (SELECT query_id,
             CAST(sum(CASE WHEN rel = 1 AND rnk = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS hit1,
             CAST(sum(CASE WHEN rel = 1 AND rnk <= 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS hit5,
             CAST(sum(rel) AS BIGINT) AS hit10,
             min(CASE WHEN rel = 1 THEN rnk END) AS first_rel
           FROM rk GROUP BY 1)
         SELECT h.query_id, CAST(nr.n_rel AS BIGINT) AS n_rel,
           hit1, hit5, hit10,
           CASE WHEN first_rel IS NULL THEN 0.0
             ELSE 1.0 / CAST(first_rel AS DOUBLE) END AS rr,
           CAST(hit10 AS DOUBLE) / 10.0 AS p_at_10
         FROM h JOIN nr ON nr.query_id = h.query_id""",
    "q255_calibration" ->
      s"""WITH $screenCte,
         e AS (SELECT p, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
             CAST(floor(p * 1e9) AS BIGINT) AS pg
           FROM m),
         e2 AS (SELECT p, y, bin, pg,
             CAST(floor((p - y) * (p - y) * 1e9) AS BIGINT) AS bg FROM e),
         b AS (SELECT bin, count(*) AS n_docs, sum(y) AS n_pos,
             sum(pg) AS conf_g, sum(bg) AS brier_g
           FROM e2 GROUP BY bin),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
             CAST(sum(abs(n_pos * 1000000000 - conf_g)) AS BIGINT) AS gap_g,
             CAST(sum(brier_g) AS BIGINT) AS tb_g
           FROM b)
         SELECT bin, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS acc,
           CAST(conf_g AS DOUBLE) / 1e9 / CAST(n_docs AS DOUBLE) AS conf,
           CAST(gap_g AS DOUBLE) / 1e9 / CAST(nn AS DOUBLE) AS ece,
           CAST(tb_g AS DOUBLE) / 1e9 / CAST(nn AS DOUBLE) AS brier
         FROM b, t""",
    "q256_fleiss_kappa" ->
      s"""WITH $screenCte,
         r AS (SELECT (CASE WHEN n_chars > 500 THEN 1 ELSE 0 END)
             + (CASE WHEN ntok > 80 THEN 1 ELSE 0 END)
             + (CASE WHEN p >= 0.25 THEN 1 ELSE 0 END) AS np
           FROM m),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(np) AS BIGINT) AS s_pos,
             CAST(sum(np * np + (3 - np) * (3 - np) - 3) AS BIGINT) AS a_sum
           FROM r),
         p1 AS (SELECT n_items, s_pos,
             CAST(a_sum AS DOUBLE) / (6.0 * CAST(n_items AS DOUBLE))
               AS p_bar,
             CAST(s_pos AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE))
               AS p_pos
           FROM a),
         p2 AS (SELECT n_items, s_pos, p_bar, p_pos,
             p_pos * p_pos + (1.0 - p_pos) * (1.0 - p_pos) AS p_e
           FROM p1)
         SELECT n_items, s_pos, p_bar, p_pos, p_e,
           (p_bar - p_e) / (1.0 - p_e) AS kappa
         FROM p2""",
    "q257_theta_sketch_setops" ->
      s"""WITH ${LlmQueries.tkCte},
         tok AS (SELECT DISTINCT source, unnest(t) AS tok FROM tk),
         hh AS (SELECT DISTINCT source,
             CAST(concat('0x', substr(md5(concat('11|', tok)), 1, 8))
               AS BIGINT) AS h
           FROM tok),
         rn AS (SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM hh),
         sk AS (SELECT source, list(h ORDER BY h) AS hs, count(*) AS kn,
             max(h) AS mx
           FROM rn WHERE rn <= 256 GROUP BY source),
         sk2 AS (SELECT source, hs, kn,
             CASE WHEN kn < 256 THEN 4294967296 ELSE mx END AS theta
           FROM sk),
         pr AS (SELECT a.source AS src_a, b.source AS src_b,
             least(a.theta, b.theta) AS th,
             CAST(len(list_filter(a.hs, x -> x < least(a.theta, b.theta)))
               AS BIGINT) AS na,
             CAST(len(list_filter(b.hs, x -> x < least(a.theta, b.theta)))
               AS BIGINT) AS nb,
             CAST(len(list_filter(list_intersect(a.hs, b.hs),
               x -> x < least(a.theta, b.theta))) AS BIGINT) AS ni
           FROM sk2 a JOIN sk2 b ON a.source < b.source),
         ex AS (SELECT x.source AS src_a, y.source AS src_b,
             count(*) AS exact_inter
           FROM tok x JOIN tok y ON x.tok = y.tok AND x.source < y.source
           GROUP BY 1, 2),
         sz AS (SELECT source, count(*) AS nd FROM tok GROUP BY 1)
         SELECT pr.src_a, pr.src_b, CAST(pr.th AS BIGINT) AS th,
           na, nb, ni,
           CAST(ni AS DOUBLE) * 4294967296.0 / CAST(th AS DOUBLE)
             AS est_inter,
           CAST(na + nb - ni AS DOUBLE) * 4294967296.0
             / CAST(th AS DOUBLE) AS est_union,
           CAST(COALESCE(ex.exact_inter, 0) AS BIGINT) AS exact_inter,
           CAST(sa.nd + sb.nd - COALESCE(ex.exact_inter, 0) AS BIGINT)
             AS exact_union
         FROM pr
         LEFT JOIN ex ON ex.src_a = pr.src_a AND ex.src_b = pr.src_b
         JOIN sz sa ON sa.source = pr.src_a
         JOIN sz sb ON sb.source = pr.src_b""",
    "q258_markov_stationary" ->
      """WITH seq AS (SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         tr AS (SELECT from_type, to_type, count(*) AS c
           FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
         ty AS (SELECT DISTINCT event_type FROM events),
         rs AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS r
           FROM tr GROUP BY 1),
         nt AS (SELECT count(*) AS n FROM ty),
         x0 AS (SELECT event_type,
             CAST(1000000000000 // n AS BIGINT) AS x FROM ty, nt),
         s1 AS (SELECT ty.event_type,
             CAST(COALESCE(f.xin, 0) + CASE WHEN rs.from_type IS NULL
               THEN x0.x ELSE 0 END AS BIGINT) AS x
           FROM ty
           JOIN x0 ON x0.event_type = ty.event_type
           LEFT JOIN rs ON rs.from_type = ty.event_type
           LEFT JOIN (SELECT tr.to_type,
               sum(CAST(x0.x AS HUGEINT) * tr.c // rs.r) AS xin
             FROM x0 JOIN tr ON tr.from_type = x0.event_type
                     JOIN rs ON rs.from_type = tr.from_type
             GROUP BY 1) f ON f.to_type = ty.event_type),
         s2 AS (SELECT ty.event_type,
             CAST(COALESCE(f.xin, 0) + CASE WHEN rs.from_type IS NULL
               THEN s1.x ELSE 0 END AS BIGINT) AS x
           FROM ty
           JOIN s1 ON s1.event_type = ty.event_type
           LEFT JOIN rs ON rs.from_type = ty.event_type
           LEFT JOIN (SELECT tr.to_type,
               sum(CAST(s1.x AS HUGEINT) * tr.c // rs.r) AS xin
             FROM s1 JOIN tr ON tr.from_type = s1.event_type
                     JOIN rs ON rs.from_type = tr.from_type
             GROUP BY 1) f ON f.to_type = ty.event_type),
         s3 AS (SELECT ty.event_type,
             CAST(COALESCE(f.xin, 0) + CASE WHEN rs.from_type IS NULL
               THEN s2.x ELSE 0 END AS BIGINT) AS x
           FROM ty
           JOIN s2 ON s2.event_type = ty.event_type
           LEFT JOIN rs ON rs.from_type = ty.event_type
           LEFT JOIN (SELECT tr.to_type,
               sum(CAST(s2.x AS HUGEINT) * tr.c // rs.r) AS xin
             FROM s2 JOIN tr ON tr.from_type = s2.event_type
                     JOIN rs ON rs.from_type = tr.from_type
             GROUP BY 1) f ON f.to_type = ty.event_type)
         SELECT s3.event_type, CAST(COALESCE(rs.r, 0) AS BIGINT) AS n_out,
           CAST(s3.x AS DOUBLE) / 1e12 AS p3
         FROM s3 LEFT JOIN rs ON rs.from_type = s3.event_type""")
}
