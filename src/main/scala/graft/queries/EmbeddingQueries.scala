package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

/** Similarity-search queries over the `embeddings` fixture: exact cosine
  * top-k (broadcast-query brute force) and hyperplane-LSH bucketed ANN.
  * Oracles recompute every cosine/plane dot in DuckDB as an ORDERED
  * list_reduce index fold (bit-identical to Column `dot()`'s aggregate
  * fold) and derive identical LSH planes from md5 — value-level
  * verification of the whole pipeline with no unordered float summation
  * anywhere.
  */
object EmbeddingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact cosine top-5 for the first 10 vectors against the whole corpus.
    "q45_cosine_knn" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnBruteForce(
        corpus = emb,
        queries = emb.where(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5)
    }),

    // Banded ANN: 32 md5-derived hyperplanes as 4 independent 8-plane
    // tables (64 dims) — multi-table probing for recall; each band's 256
    // buckets keep per-bucket population (and with it the candidate
    // self-join) ~n/256 (plane count scales via Similarity.suggestedPlanes
    // at real corpus sizes).
    "q46_ann_lsh" -> ((s, dir) =>
      Similarity.annNearestInBands(Tables.embeddings(s, dir),
        idCol = "vec_id", vecCol = "embedding", bands = 4, planesPerBand = 8,
        dims = 64)),

    // Banded ANN top-k: the production ANN query — k nearest among banded
    // candidates, ranking bounded by candidate-set size per vector.
    "q66_ann_topk" -> ((s, dir) =>
      Similarity.annTopKInBands(Tables.embeddings(s, dir),
        idCol = "vec_id", vecCol = "embedding", bands = 4, planesPerBand = 8,
        dims = 64, k = 3)),

    // IVF-Flat ANN: deterministic coarse quantizer (the ceil(sqrt(n))
    // smallest-id vectors — the textbook IVF list-count rule, so probe
    // work stays ~nprobe*sqrt(n) per query at any corpus size), 2-probe,
    // exact rerank inside probed lists — the k-means-style scale path
    // next to LSH banding (q66). The sizing count() is one cheap job,
    // exactly the pass an index build would make.
    "q77_ivf_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      Similarity.ivfTopK(emb, idCol = "vec_id", vecCol = "embedding",
        centroids = nLists, nprobe = 2, k = 3)
    }),

    // The PREBUILT-index query path (build-once-query-many, the
    // production ANN shape q77 sizes): ivfBuild materializes the
    // centroids + inverted lists (with member vectors), then an
    // out-of-corpus query set (every 20th vector as the probe set)
    // runs ivfQuery against the index — broadcast quantizer, 2-probe,
    // exact rerank inside probed lists, corpus never re-read. Same
    // candidate math as q77 minus the self-exclusion (an index query
    // legitimately returns an exact match at score 1).
    "q305_ivf_index_query" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      val ix = Similarity.ivfBuild(emb, "vec_id", "embedding", nLists)
      Similarity.ivfQuery(ix, emb.where(col("vec_id") % 20 === 0),
        "vec_id", "embedding", nprobe = 2, k = 3)
    }),

    // The nprobe-tuning curve for the q305 index: recall@3 of the
    // index query vs exact brute force at nprobe 1..4 — the knob
    // readout behind "raise nprobe for recall", measured instead of
    // asserted. Self-matches excluded on both sides; one brute pass +
    // one assignment ranking, reused by every curve point.
    "q306_ivf_recall_curve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      val ix = Similarity.ivfBuild(emb, "vec_id", "embedding", nLists)
      Similarity.ivfRecallCurve(ix, emb,
        emb.where(col("vec_id") % 20 === 0), "vec_id", "embedding",
        k = 3, maxProbe = 4)
    }),

    // The PRICE of int8-compressing the q305 index's lists (4x
    // smaller — the 100 TB serving shape): q306's recall curve for
    // the float index NEXT TO the ivfQuantize'd index, same probe
    // set, same brute-force truth — recall_delta is the measured cost
    // of the compression at each probe budget. Same assignment on
    // both sides (quantization happens after the build); the int8
    // rerank is exact long arithmetic, so the oracle reproduces it
    // bit-for-bit with the q289 quantization formula.
    "q312_ivf_quantized_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      val ix = Similarity.ivfBuild(emb, "vec_id", "embedding", nLists)
      // ONE candidate pass scores both formulas (probe ranking runs
      // once at maxProbe; each point filters by probe rank) — half the
      // dot-product work of two separate curves, same values
      Similarity.ivfRecallCurveDual(ix, emb,
        emb.where(col("vec_id") % 20 === 0), "vec_id", "embedding",
        k = 3, maxProbe = 4)
    }),

    // IVF under a SAMPLED-K-MEANS quantizer, end-to-end (the
    // Similarity scaladoc's "e.g. sampled k-means centroids" promise,
    // gated): deterministic integer-grid Lloyd (k=8, 3 passes) over a
    // 1-in-10 sample, final-pass centroids dequantized (exact
    // power-of-two division) into ivfBuildWith's (cid, cv) quantizer,
    // then the q305 query path — broadcast quantizer, 2-probe, exact
    // rerank, self kept. The oracle unrolls the same Lloyd passes and
    // replays assignment/probe/rerank with the same tie rules.
    "q313_ivf_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val quant = graft.operators.KMeans.centroids(
        emb.where(col("vec_id") % 10 === 0), "vec_id", "embedding",
        k = 8, iters = 3)
      val ix = Similarity.ivfBuildWith(emb, "vec_id", "embedding", quant)
      Similarity.ivfQuery(ix, emb.where(col("vec_id") % 20 === 0),
        "vec_id", "embedding", nprobe = 2, k = 3)
    }),

    // IVF-PQ (the published step past q312's int8): per-subspace
    // codebooks trained with the integer-grid k-means on a 1-in-10
    // sample (m=4 x 16-dim subspaces, ksub=8 — 64 dims -> 4 codes +
    // one norm per member, the 16-32x layout a 100 TB corpus serves),
    // members encoded by integer argmin, queries scored by ASYMMETRIC
    // DISTANCE (one m x ksub exact-integer table per query, m lookups
    // per candidate), and the ADC top-6 reranked exactly — recall of
    // both rankings per probe budget against brute truth. The oracle
    // unrolls the per-subspace Lloyd pass, re-encodes, and replays
    // ADC + rerank in the same exact arithmetic.
    "q320_ivf_pq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      val ix = Similarity.ivfBuild(emb, "vec_id", "embedding", nLists)
      val cb = graft.llm.Pq.collectCodebooks(graft.llm.Pq.trainCodebooks(
        emb.where(col("vec_id") % 10 === 0), "vec_id", "embedding",
        dims = 64, m = 4, ksub = 8, iters = 2))
      // maxProbe 3 (was 4): the curve's cost is ~linear in probe
      // points and this was the suite's most expensive query — 3
      // points still show the recall knee (r15 ADVICE)
      graft.llm.Pq.pqRecallCurve(ix, cb, emb,
        emb.where(col("vec_id") % 20 === 0), "vec_id", "embedding",
        k = 3, maxProbe = 3, refine = 6)
    }),

    // SemDeDup-style semantic dedup: sqrt(n) coarse clusters, exact
    // pairwise cosine inside each cluster only, drop vectors with a
    // smaller-id ≥ threshold cluster-mate. (Fixture embeddings are
    // near-random — threshold tuned to be non-trivial; real corpora
    // use ≥0.9.)
    "q78_semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      Similarity.semanticDedup(emb, idCol = "vec_id", vecCol = "embedding",
        centroids = nLists, threshold = 0.25)
    }),

    // Embedding-cosine near-dup pairs: banded-LSH candidates (any shared
    // band) then exact cosine filter. (Fixture embeddings are near-random —
    // threshold tuned to be non-empty; real corpora use ≥0.9.)
    "q55_embedding_near_dup" -> ((s, dir) =>
      Similarity.embeddingNearDuplicatesBanded(Tables.embeddings(s, dir),
        idCol = "vec_id", vecCol = "embedding", bands = 4, planesPerBand = 8,
        dims = 64, threshold = 0.3)),

    // ANN quality evaluation — recall@5 of the banded-LSH index against
    // exact brute force for the q45 query set. THE acceptance metric any
    // production ANN deployment is gated on; composing the two existing
    // retrieval paths keeps the eval exactly as scalable as they are
    // (broadcast-query brute force over the probe set only + banded
    // candidates), and the comparison itself is id-set joins and one
    // division per query. Cap/oracle boundary: annTopKInBands' default
    // star-cap (10000) matches the oracle's uncapped banding only while
    // buckets stay below it — LshCapHeadroomSpec pins >=10x headroom at
    // both gate SFs.
    "q199_ann_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val bf = Similarity.knnBruteForce(
          emb, emb.where(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val ann = Similarity.annTopKInBands(emb,
          idCol = "vec_id", vecCol = "embedding", bands = 4,
          planesPerBand = 8, dims = 64, k = 5)
        .where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("nn_id").as("neighbor_id"))
      val annCnt = ann.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_ann"))
      bf.join(ann.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_bf"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
        .join(annCnt, Seq("query_id"), "left_outer")
        .select(col("query_id"), col("n_bf"),
          coalesce(col("n_ann"), lit(0L)).as("n_ann"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_bf")).as("recall"))
    }),

    // kNN label-agreement (mislabel/label-noise screen): for each probe
    // vector, the fraction of its 5 exact nearest neighbors sharing its
    // label — points whose neighborhoods disagree are the mislabel
    // candidates every curated classification corpus gets swept for.
    // Same broadcast-probe brute force as q45; labels arrive by two
    // co-keyed joins; the rate is one division per probe.
    "q210_knn_label_agreement" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val lab = emb.select(col("vec_id"), col("label").cast("long").as("label"))
      val nn = Similarity.knnBruteForce(
          emb, emb.where(col("vec_id") < 20),
          idCol = "vec_id", vecCol = "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      nn.join(lab.select(col("vec_id").as("query_id"), col("label")), "query_id")
        .join(lab.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label")), "neighbor_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("n_nn"),
          sum(when(col("n_label") === col("label"), 1L).otherwise(0L))
            .as("n_same"))
        .select(col("query_id"), col("label"), col("n_nn"), col("n_same"),
          (col("n_same").cast("double") / col("n_nn")).as("agree_rate"))
    }),

    // Symmetric int8 quantization — the 4x compression step before ANN
    // indexing at corpus scale. Pure narrow map; floor(x/scale + 0.5)
    // keeps the rounding rule engine-portable.
    "q71_embedding_quantize" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scale", Similarity.int8Scale(col("v")))
        // qvec serialized to a CSV string at the oracle surface: the
        // driver's pandas compare sort_values-es every cell and a raw
        // list column is unhashable there (r04: q71 scored as an error).
        .select(col("vec_id"), col("scale"),
          concat_ws(",", Similarity.quantizeInt8(col("v"), col("scale")))
            .as("qvec"))
    }),

    // Quantization-accuracy audit (q71's missing half): recall@10 of
    // the int8-quantized ranking against the exact float ranking for
    // the probe set — the number that decides whether 4x-compressed
    // vectors are good enough to serve ANN from. The int dot products
    // are EXACT (long sums of int8 products), so the quantized scores
    // are bit-portable; both rankings ride TopKAggregator.
    "q289_int8_recall" -> ((s, dir) => {
      val k = 10
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.knnBruteForce(emb,
          emb.where(col("vec_id") < 10), "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id"))
      val qemb = emb
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"),
          Similarity.quantizeInt8(col("v"), Similarity.int8Scale(col("v")))
            .as("qv"))
      val c = qemb.select(col("vec_id").as("nn_id"), col("qv").as("nv"))
      val q = qemb.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("qv").as("pv"))
      def idot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("long") * y),
          lit(0L), (acc, x) => acc + x)
      def inrm(a: org.apache.spark.sql.Column) =
        sqrt(idot(a, a).cast("double"))
      val scored = c.crossJoin(broadcast(q))
        .where(col("qid") =!= col("nn_id"))
        .select(col("qid").as("vec_id"), col("nn_id"),
          round(idot(col("pv"), col("nv")).cast("double")
            / (inrm(col("pv")) * inrm(col("nv"))), 6).as("score"))
      val quant = Similarity.topKPerQuery(scored, k)
        .select(col("vec_id").as("query_id"),
          col("nn_id").as("neighbor_id"), lit(1L).as("hit"))
      exact.join(quant, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).cast("long").as("k"),
          sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_overlap"))
        .select(col("query_id"), col("k"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("k").cast("double"))
            .as("recall"))
    }),

    // Per-label centroid outliers: the 5 vectors farthest from their
    // label's centroid — the embedded-corpus mislabel/contamination
    // screen. All-integer distance arithmetic (14-bit quantization), so
    // the oracle reproduces dist2 exactly; ranking through the bounded
    // TopKAggregator, not a sort window.
    "q86_emb_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(Tables.embeddings(s, dir),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 5)),

    // Distributed Lloyd k-means (k=4, 2 assignment passes) in bit-exact
    // integer arithmetic: assignment is a zero-shuffle broadcast-centroid
    // map, recompute one k-row hash agg per pass (operators/KMeans.scala).
    "q139_kmeans" -> ((s, dir) =>
      graft.operators.KMeans.summary(Tables.embeddings(s, dir),
        idCol = "vec_id", vecCol = "embedding", k = 4, iters = 2)),

    // Hybrid retrieval with reciprocal-rank fusion: the lexical list
    // (BM25 vs fixed terms, exact integer micro scores) and the semantic
    // list (cosine vs query vector 0, 6-decimal rounded) each keep their
    // top-50 through the bounded TopKAggregator — NO ranking window
    // anywhere, shuffles bounded at k rows per partition — then fuse
    // with RRF(d) = Σ_lists 1/(60 + rank_d). Exactly two fixed-order
    // double terms per doc, so the fused score is bit-stable. The
    // standard hybrid-search merge every retrieval stack runs; absent
    // docs carry rank 0 and contribute nothing.
    "q163_rrf_fusion" -> ((s, dir) => {
      val lex = Similarity.topKGlobal(
        graft.llm.Bm25.score(Tables.documents(s, dir), "doc_id", "text",
          queryTerms = Seq("join", "hash", "window"))
          .select(col("doc_id"), col("score_micro")),
        idCol = "doc_id", scoreCol = "score_micro", k = 50)
        .select(col("doc_id"), col("rnk").as("lrank"))
      val emb = Tables.embeddings(s, dir)
      val sem = Similarity.knnBruteForce(emb, emb.where(col("vec_id") === 0),
        idCol = "vec_id", vecCol = "embedding", k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rnk").as("srank"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("lrank"), lit(0L)).as("lex_rank"),
          coalesce(col("srank"), lit(0L)).as("sem_rank"),
          (coalesce(lit(1.0) / (lit(60L) + col("lrank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60L) + col("srank")), lit(0.0)))
            .as("rrf"))
    }),

    // Contrastive hard-negative mining: per probe, the 5 most similar
    // SAME-label rows (positives pool) and the 5 most similar
    // DIFFERENT-label rows (the hard negatives a contrastive trainer
    // pairs against) — one TopKAggregator pass keyed on (query,
    // polarity), corpus never shuffles.
    "q265_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.labeledTopK(emb, emb.where(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 5)
    }),

    // IVF index-health: the per-list membership histogram of q77's
    // coarse quantizer (hot lists = skewed probe cost; empty lists =
    // wasted probe slots — both must be visible, so zero-member
    // centroids appear). See Similarity.ivfListProfile.
    "q300_ivf_balance" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nLists = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      Similarity.ivfListProfile(emb, idCol = "vec_id",
        vecCol = "embedding", centroids = nLists)
    }),

    // Per-label centroid drift vs the global centroid — the embedded-
    // corpus mix monitor (topic drift / ingest-break detection). One
    // corpus pass to |labels|·d exact 14-bit-grid sums; cosine is a
    // single fixed-order double expression over exact decimal dot
    // products. See Similarity.centroidDrift.
    "q294_centroid_drift" -> ((s, dir) =>
      Similarity.centroidDrift(Tables.embeddings(s, dir),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label"))
  )

  private val planeHash =
    "CAST(concat('0x', substr(md5(concat('plane|', CAST(p AS VARCHAR), '|', " +
      "CAST(i AS VARCHAR))), 1, 8)) AS BIGINT)"

  // PINNED accumulation: every dot product and norm below is an ORDERED
  // index fold (DuckDB list_reduce) — ((v1·w1 + v2·w2) + v3·w3) + … —
  // exactly the fold Column `dot()` / the native cosine performs, so the
  // oracles agree with Spark bit-for-bit BY CONSTRUCTION. The previous
  // unnest + hash-join + sum() form summed in an unpinned order: a plane
  // dot within ~1e-13 of zero could bucket differently per engine
  // (~1e-8 expected failure rate at fixture scale), and a score at a
  // round-to-6-decimals boundary could flip the last digit. No unordered
  // float summation remains in any embedding oracle.
  private[queries] val evCte =
    """ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)"""
  private[queries] val nvCte =
    """n AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
           FROM ev)"""
  private val planesCte =
    s"""planes AS (SELECT p, list_transform(range(64),
               i -> ($planeHash % 2001 - 1000) / 1000.0) AS w
             FROM (SELECT unnest(generate_series(0, 31)) AS p))"""
  private val dotpCte =
    """dotp AS (SELECT ev.vec_id, pl.p,
             list_reduce(list_transform(range(64), i -> ev.v[i+1] * pl.w[i+1]),
               (a, b) -> a + b) AS dp
           FROM ev, planes pl)"""
  private val bkCte =
    """bk AS (SELECT vec_id, p // 8 AS band,
               CAST(sum(CASE WHEN dp > 0 THEN (CAST(1 AS BIGINT) << (p % 8))
                        ELSE 0 END) AS BIGINT) AS bucket
             FROM dotp GROUP BY vec_id, p // 8)"""
  private[queries] def pairDotCte(table: String, ida: String, idb: String) =
    s"""d AS (SELECT c.$ida AS $ida, c.$idb AS $idb,
             list_reduce(list_transform(range(64), i -> ea.v[i+1] * eb.v[i+1]),
               (a, b) -> a + b) AS dp
           FROM $table c JOIN ev ea ON ea.vec_id = c.$ida
                          JOIN ev eb ON eb.vec_id = c.$idb)"""
  // shared coarse-quantizer assignment (IVF + SemDeDup oracles)
  private val ivfCommon =
    s"""$evCte, $nvCte,
 nl AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS lists FROM embeddings),
 cent AS (SELECT vec_id FROM (SELECT vec_id,
       row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings)
     WHERE rn <= (SELECT lists FROM nl)),
 cc AS (SELECT ev.vec_id, ec.vec_id AS cid,
     list_reduce(list_transform(range(64), i -> ev.v[i+1] * ecv.v[i+1]),
       (a, b) -> a + b) AS dp
   FROM ev, cent ec JOIN ev ecv ON ecv.vec_id = ec.vec_id),
 sc AS (SELECT cc.vec_id, cc.cid,
       round(cc.dp / (nv2.nrm * nc.nrm), 6) AS s
     FROM cc JOIN n nv2 ON nv2.vec_id = cc.vec_id
             JOIN n nc ON nc.vec_id = cc.cid),
 pr AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
          ORDER BY s DESC, cid ASC) AS r FROM sc)"""

  val oracles: Map[String, String] = Map(
    "q163_rrf_fusion" ->
      s"""WITH $evCte, $nvCte,
         lexall AS (SELECT doc_id, score_micro FROM
           (${graft.llm.Bm25.oracleSql(Seq("join", "hash", "window"))})),
         lex AS (SELECT doc_id, lrank FROM (
             SELECT doc_id, CAST(row_number() OVER (
               ORDER BY score_micro DESC, doc_id) AS BIGINT) AS lrank
             FROM lexall)
           WHERE lrank <= 50),
         cand AS (SELECT 0 AS qid, vec_id AS nid FROM ev WHERE vec_id <> 0),
         ${pairDotCte("cand", "qid", "nid")},
         sc AS (SELECT nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
             FROM d JOIN n nq ON nq.vec_id = qid JOIN n ne ON ne.vec_id = nid),
         sem AS (SELECT doc_id, srank FROM (
             SELECT nid AS doc_id, CAST(row_number() OVER (
               ORDER BY score DESC, nid ASC) AS BIGINT) AS srank
             FROM sc)
           WHERE srank <= 50)
         SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           COALESCE(lrank, 0) AS lex_rank,
           COALESCE(srank, 0) AS sem_rank,
           COALESCE(CAST(1 AS DOUBLE) / (60 + lrank), CAST(0 AS DOUBLE))
             + COALESCE(CAST(1 AS DOUBLE) / (60 + srank), CAST(0 AS DOUBLE))
             AS rrf
         FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id""",
    "q210_knn_label_agreement" ->
      s"""WITH $evCte, $nvCte,
         cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid FROM ev a
           JOIN ev b ON a.vec_id < 20 AND b.vec_id <> a.vec_id),
         ${pairDotCte("cand", "qid", "nid")},
         s AS (SELECT qid, nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
           FROM d JOIN n nq ON nq.vec_id = qid
                  JOIN n ne ON ne.vec_id = nid),
         r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, nid ASC) AS rnk FROM s),
         nn AS (SELECT qid AS query_id, nid AS neighbor_id FROM r
           WHERE rnk <= 5),
         lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label
           FROM embeddings),
         ag AS (SELECT nn.query_id, lq.label, count(*) AS n_nn,
             sum(CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END) AS n_same
           FROM nn JOIN lb lq ON lq.vec_id = nn.query_id
                   JOIN lb ln ON ln.vec_id = nn.neighbor_id
           GROUP BY 1, 2)
         SELECT CAST(query_id AS BIGINT) AS query_id, label,
           CAST(n_nn AS BIGINT) AS n_nn, CAST(n_same AS BIGINT) AS n_same,
           CAST(n_same AS DOUBLE) / n_nn AS agree_rate
         FROM ag""",
    "q199_ann_recall" ->
      s"""WITH $evCte, $nvCte, $planesCte, $dotpCte, $bkCte,
         candb AS (SELECT a.vec_id AS qid, b.vec_id AS nid FROM ev a
           JOIN ev b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
         db AS (SELECT c.qid, c.nid,
             list_reduce(list_transform(range(64), i -> ea.v[i+1] * eb.v[i+1]),
               (a, b) -> a + b) AS dp
           FROM candb c JOIN ev ea ON ea.vec_id = c.qid
                         JOIN ev eb ON eb.vec_id = c.nid),
         sb AS (SELECT qid, nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
           FROM db JOIN n nq ON nq.vec_id = qid
                   JOIN n ne ON ne.vec_id = nid),
         rb AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, nid ASC) AS rnk FROM sb),
         bf AS (SELECT qid AS query_id, nid AS neighbor_id FROM rb
           WHERE rnk <= 5),
         canda AS (SELECT DISTINCT a.vec_id, b.vec_id AS nn_id
             FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
               AND a.vec_id <> b.vec_id),
         da AS (SELECT c.vec_id, c.nn_id,
             list_reduce(list_transform(range(64), i -> ea.v[i+1] * eb.v[i+1]),
               (a, b) -> a + b) AS dp
           FROM canda c JOIN ev ea ON ea.vec_id = c.vec_id
                         JOIN ev eb ON eb.vec_id = c.nn_id),
         sa AS (SELECT da.vec_id, da.nn_id,
             round(da.dp / (na.nrm * nb.nrm), 6) AS score
           FROM da JOIN n na ON na.vec_id = da.vec_id
                   JOIN n nb ON nb.vec_id = da.nn_id),
         ra AS (SELECT vec_id, nn_id, row_number() OVER (PARTITION BY vec_id
               ORDER BY score DESC, nn_id ASC) AS rnk FROM sa),
         ann AS (SELECT vec_id AS query_id, nn_id AS neighbor_id FROM ra
           WHERE rnk <= 5 AND vec_id < 10),
         ac AS (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1),
         fl AS (SELECT b.query_id, count(*) AS n_bf,
             sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_hit
           FROM bf b LEFT JOIN ann a ON a.query_id = b.query_id
             AND a.neighbor_id = b.neighbor_id
           GROUP BY 1)
         SELECT CAST(f.query_id AS BIGINT) AS query_id,
           CAST(n_bf AS BIGINT) AS n_bf,
           CAST(COALESCE(n_ann, 0) AS BIGINT) AS n_ann,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit AS DOUBLE) / n_bf AS recall
         FROM fl f LEFT JOIN ac ON ac.query_id = f.query_id""",
    "q45_cosine_knn" ->
      s"""WITH $evCte, $nvCte,
         cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid FROM ev a JOIN ev b
                  ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
         ${pairDotCte("cand", "qid", "nid")},
         s AS (SELECT qid, nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
               FROM d JOIN n nq ON nq.vec_id = qid JOIN n ne ON ne.vec_id = nid),
         r AS (SELECT qid AS query_id, nid AS neighbor_id, score,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY score DESC, nid ASC) AS BIGINT) AS rnk FROM s)
         SELECT query_id, neighbor_id, score, rnk FROM r WHERE rnk <= 5""",
    "q289_int8_recall" ->
      s"""WITH $evCte, $nvCte,
         sc AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
           FROM ev),
         qv AS (SELECT vec_id, CASE WHEN s = 0
             THEN list_transform(v, x -> CAST(0 AS BIGINT))
             ELSE list_transform(v, x -> CAST(floor(x / s + 0.5) AS BIGINT))
             END AS qv FROM sc),
         cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid FROM ev a
           JOIN ev b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
         ${pairDotCte("cand", "qid", "nid")},
         se AS (SELECT qid, nid, round(dp / (nq.nrm * ne.nrm), 6) AS score
           FROM d JOIN n nq ON nq.vec_id = qid
                  JOIN n ne ON ne.vec_id = nid),
         re AS (SELECT qid, nid FROM (SELECT qid, nid,
             row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, nid ASC) AS rnk FROM se)
           WHERE rnk <= 10),
         qd AS (SELECT c.qid, c.nid,
             CAST(list_reduce(list_transform(range(64),
               i -> a.qv[i+1] * b.qv[i+1]), (x, y) -> x + y) AS BIGINT)
               AS dp
           FROM cand c JOIN qv a ON a.vec_id = c.qid
                       JOIN qv b ON b.vec_id = c.nid),
         qn AS (SELECT vec_id, sqrt(CAST(list_reduce(
             list_transform(qv, x -> x * x), (a, b) -> a + b) AS DOUBLE))
             AS nrm FROM qv),
         sq AS (SELECT qid, nid,
             round(CAST(dp AS DOUBLE) / (na.nrm * nb.nrm), 6) AS score
           FROM qd JOIN qn na ON na.vec_id = qid
                   JOIN qn nb ON nb.vec_id = nid),
         rq AS (SELECT qid, nid FROM (SELECT qid, nid,
             row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, nid ASC) AS rnk FROM sq)
           WHERE rnk <= 10)
         SELECT re.qid AS query_id, CAST(count(*) AS BIGINT) AS k,
           CAST(sum(CASE WHEN rq.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_overlap,
           CAST(sum(CASE WHEN rq.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         FROM re LEFT JOIN rq ON rq.qid = re.qid AND rq.nid = re.nid
         GROUP BY re.qid""",
    "q46_ann_lsh" ->
      s"""WITH $evCte, $nvCte, $planesCte, $dotpCte, $bkCte,
         cand AS (SELECT DISTINCT a.vec_id, b.vec_id AS nn_id
             FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
               AND a.vec_id <> b.vec_id),
         ${pairDotCte("cand", "vec_id", "nn_id")},
         s AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d JOIN n na ON na.vec_id = d.vec_id
                    JOIN n nb ON nb.vec_id = d.nn_id),
         r AS (SELECT vec_id, nn_id, score,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, nn_id ASC) AS rn FROM s)
         SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(nn_id AS BIGINT) AS nn_id, score
         FROM r WHERE rn = 1""",
    "q66_ann_topk" ->
      s"""WITH $evCte, $nvCte, $planesCte, $dotpCte, $bkCte,
         cand AS (SELECT DISTINCT a.vec_id, b.vec_id AS nn_id
             FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
               AND a.vec_id <> b.vec_id),
         ${pairDotCte("cand", "vec_id", "nn_id")},
         s AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d JOIN n na ON na.vec_id = d.vec_id
                    JOIN n nb ON nb.vec_id = d.nn_id),
         r AS (SELECT vec_id, nn_id, score,
               CAST(row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, nn_id ASC) AS BIGINT) AS rnk FROM s)
         SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(nn_id AS BIGINT) AS nn_id, score, rnk
         FROM r WHERE rnk <= 3""",
    "q77_ivf_ann" ->
      s"""WITH $ivfCommon,
         asn AS (SELECT vec_id AS member, cid FROM pr WHERE r = 1),
         cand AS (SELECT pr.vec_id, a.member AS nn_id FROM pr
               JOIN asn a ON a.cid = pr.cid AND a.member <> pr.vec_id
               WHERE pr.r <= 2),
         ${pairDotCte("cand", "vec_id", "nn_id")},
         s2 AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d JOIN n na ON na.vec_id = d.vec_id
                    JOIN n nb ON nb.vec_id = d.nn_id),
         r AS (SELECT vec_id, nn_id, score,
               CAST(row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, nn_id ASC) AS BIGINT) AS rnk FROM s2)
         SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(nn_id AS BIGINT) AS nn_id, score, rnk
         FROM r WHERE rnk <= 3""",
    // q305's machinery at nprobe 1..4, each point's top-(k+1) ranking
    // self-filtered and re-ranked to k, scored against the brute top-k
    "q306_ivf_recall_curve" -> {
      val ivBlocks = (1 to 4).map { np =>
        s"""c$np AS (SELECT pr.vec_id, a.member AS nn_id FROM pr
               JOIN qs ON qs.vec_id = pr.vec_id
               JOIN asn a ON a.cid = pr.cid
               WHERE pr.r <= $np),
         d$np AS (SELECT c.vec_id, c.nn_id,
               list_reduce(list_transform(range(64),
                 i -> ea.v[i+1] * eb.v[i+1]), (a, b) -> a + b) AS dp
             FROM c$np c JOIN ev ea ON ea.vec_id = c.vec_id
                         JOIN ev eb ON eb.vec_id = c.nn_id),
         s$np AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d$np d JOIN n na ON na.vec_id = d.vec_id
                         JOIN n nb ON nb.vec_id = d.nn_id),
         r$np AS (SELECT vec_id, nn_id, row_number() OVER (
               PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
               AS rnk FROM s$np),
         iv$np AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY rnk) AS rr
               FROM r$np WHERE rnk <= 4 AND nn_id <> vec_id)
             WHERE rr <= 3)"""
      }.mkString(",\n         ")
      val points = (1 to 4).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           (SELECT CAST(count(*) AS BIGINT) FROM qs) AS n_queries,
           (SELECT CAST(count(*) AS BIGINT) FROM iv$np i
              JOIN br b ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id)
             AS hits,
           (SELECT CAST(count(*) AS BIGINT) FROM br) AS possible,
           CAST((SELECT count(*) FROM iv$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE) AS recall"""
      }.mkString("\n         UNION ALL\n         ")
      s"""WITH $ivfCommon,
         asn AS (SELECT vec_id AS member, cid FROM pr WHERE r = 1),
         qs AS (SELECT vec_id FROM embeddings WHERE vec_id % 20 = 0),
         bc AS (SELECT q.vec_id, e.vec_id AS nn_id FROM qs q, ev e
             WHERE e.vec_id <> q.vec_id),
         bd AS (SELECT c.vec_id, c.nn_id,
               list_reduce(list_transform(range(64),
                 i -> ea.v[i+1] * eb.v[i+1]), (a, b) -> a + b) AS dp
             FROM bc c JOIN ev ea ON ea.vec_id = c.vec_id
                       JOIN ev eb ON eb.vec_id = c.nn_id),
         bs AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM bd d JOIN n na ON na.vec_id = d.vec_id
                       JOIN n nb ON nb.vec_id = d.nn_id),
         br AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
                 AS rnk FROM bs)
             WHERE rnk <= 3),
         $ivBlocks
         $points"""
    },
    // q306's float curve + the SAME candidates scored with the q289
    // int8 formula (exact long dot products, norms from the quantized
    // vectors) — recall_delta per probe budget
    "q312_ivf_quantized_recall" -> {
      val ivBlocks = (1 to 4).map { np =>
        s"""c$np AS (SELECT pr.vec_id, a.member AS nn_id FROM pr
               JOIN qs ON qs.vec_id = pr.vec_id
               JOIN asn a ON a.cid = pr.cid
               WHERE pr.r <= $np),
         d$np AS (SELECT c.vec_id, c.nn_id,
               list_reduce(list_transform(range(64),
                 i -> ea.v[i+1] * eb.v[i+1]), (a, b) -> a + b) AS dp,
               CAST(list_reduce(list_transform(range(64),
                 i -> qa.qv[i+1] * qb.qv[i+1]), (a, b) -> a + b)
                 AS BIGINT) AS qdp
             FROM c$np c JOIN ev ea ON ea.vec_id = c.vec_id
                         JOIN ev eb ON eb.vec_id = c.nn_id
                         JOIN qv qa ON qa.vec_id = c.vec_id
                         JOIN qv qb ON qb.vec_id = c.nn_id),
         s$np AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score,
               round(CAST(d.qdp AS DOUBLE) / (qa.nrm * qb.nrm), 6)
                 AS score8
             FROM d$np d JOIN n na ON na.vec_id = d.vec_id
                         JOIN n nb ON nb.vec_id = d.nn_id
                         JOIN qn qa ON qa.vec_id = d.vec_id
                         JOIN qn qb ON qb.vec_id = d.nn_id),
         iv$np AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY rnk) AS rr
               FROM (SELECT vec_id, nn_id, row_number() OVER (
                   PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
                   AS rnk FROM s$np)
               WHERE rnk <= 4 AND nn_id <> vec_id)
             WHERE rr <= 3),
         iw$np AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY rnk) AS rr
               FROM (SELECT vec_id, nn_id, row_number() OVER (
                   PARTITION BY vec_id ORDER BY score8 DESC, nn_id ASC)
                   AS rnk FROM s$np)
               WHERE rnk <= 4 AND nn_id <> vec_id)
             WHERE rr <= 3)"""
      }.mkString(",\n         ")
      val points = (1 to 4).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           (SELECT CAST(count(*) AS BIGINT) FROM qs) AS n_queries,
           (SELECT CAST(count(*) AS BIGINT) FROM br) AS possible,
           CAST((SELECT count(*) FROM iv$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE) AS recall_float,
           CAST((SELECT count(*) FROM iw$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE) AS recall_int8,
           CAST((SELECT count(*) FROM iw$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE)
             - CAST((SELECT count(*) FROM iv$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE) AS recall_delta"""
      }.mkString("\n         UNION ALL\n         ")
      s"""WITH $ivfCommon,
         asn AS (SELECT vec_id AS member, cid FROM pr WHERE r = 1),
         qs AS (SELECT vec_id FROM embeddings WHERE vec_id % 20 = 0),
         sc8 AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
           FROM ev),
         qv AS (SELECT vec_id, CASE WHEN s = 0
             THEN list_transform(v, x -> CAST(0 AS BIGINT))
             ELSE list_transform(v, x -> CAST(floor(x / s + 0.5) AS BIGINT))
             END AS qv FROM sc8),
         qn AS (SELECT vec_id, sqrt(CAST(list_reduce(
             list_transform(qv, x -> x * x), (a, b) -> a + b) AS DOUBLE))
             AS nrm FROM qv),
         bc AS (SELECT q.vec_id, e.vec_id AS nn_id FROM qs q, ev e
             WHERE e.vec_id <> q.vec_id),
         bd AS (SELECT c.vec_id, c.nn_id,
               list_reduce(list_transform(range(64),
                 i -> ea.v[i+1] * eb.v[i+1]), (a, b) -> a + b) AS dp
             FROM bc c JOIN ev ea ON ea.vec_id = c.vec_id
                       JOIN ev eb ON eb.vec_id = c.nn_id),
         bs AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM bd d JOIN n na ON na.vec_id = d.vec_id
                       JOIN n nb ON nb.vec_id = d.nn_id),
         br AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
                 AS rnk FROM bs)
             WHERE rnk <= 3),
         $ivBlocks
         $points"""
    },
    // per-subspace Lloyd unroll (one keyed pass for all m subspaces),
    // integer member encode, ADC via a (query, sub, code) dot table,
    // exact rerank of the ADC top-6 — recall per probe budget
    "q320_ivf_pq_recall" -> {
      val (m, dsub, ksub, k, maxP, refine) = (4, 16, 8, 3, 3, 6)
      val train =
        s"""smp AS (SELECT vec_id, list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 16384.0 + 0.5) AS BIGINT))
               AS qv
           FROM embeddings WHERE vec_id % 10 = 0),
         sdim AS (SELECT unnest(range($dsub)) AS i),
         subs AS (SELECT unnest(range($m)) AS sub),
         kc0 AS (SELECT subs.sub, smp.vec_id AS cid, sdim.i,
             smp.qv[subs.sub * $dsub + sdim.i + 1] AS c
           FROM smp, sdim, subs
           WHERE smp.vec_id IN (SELECT vec_id FROM smp
             ORDER BY vec_id LIMIT $ksub)),
         kd1 AS (SELECT c.sub, q.vec_id, c.cid,
             sum((q.qv[c.sub * $dsub + c.i + 1] - c.c)
               * (q.qv[c.sub * $dsub + c.i + 1] - c.c)) AS dist
           FROM smp q, kc0 c GROUP BY 1, 2, 3),
         ka1 AS (SELECT sub, vec_id, cid FROM (SELECT sub, vec_id, cid,
             row_number() OVER (PARTITION BY sub, vec_id
               ORDER BY dist, cid) AS rn FROM kd1) WHERE rn = 1),
         ks1 AS (SELECT a.sub, a.cid, sdim.i,
             sum(q.qv[a.sub * $dsub + sdim.i + 1]) AS s, count(*) AS cnt
           FROM ka1 a JOIN smp q USING (vec_id), sdim GROUP BY 1, 2, 3),
         kc1 AS (SELECT sub, cid, i,
             CAST(floor((2 * s + cnt) / (2.0 * cnt)) AS BIGINT) AS c
           FROM ks1),
         cbr AS (SELECT sub, cid, list(c ORDER BY i) AS qc,
               CAST(sum(c * c) AS BIGINT) AS n2,
               row_number() OVER (PARTITION BY sub ORDER BY cid) - 1
                 AS code
           FROM kc1 GROUP BY sub, cid)"""
      val encode =
        s"""mq AS (SELECT vec_id, list_transform(v, x ->
               CAST(floor(x * 16384.0 + 0.5) AS BIGINT)) AS qv FROM ev),
         md AS (SELECT m2.vec_id AS member, c.sub, c.code, c.n2,
             CAST(list_reduce(list_transform(range($dsub),
               i -> (m2.qv[c.sub * $dsub + i + 1] - c.qc[i + 1])
                  * (m2.qv[c.sub * $dsub + i + 1] - c.qc[i + 1])),
               (a, b) -> a + b) AS BIGINT) AS d
           FROM mq m2, cbr c),
         me AS (SELECT member, sub, code, n2 FROM (SELECT member, sub,
             code, n2, row_number() OVER (PARTITION BY member, sub
               ORDER BY d, code) AS rn FROM md) WHERE rn = 1),
         pn AS (SELECT member, CAST(sum(n2) AS BIGINT) AS pn2 FROM me
           GROUP BY member),
         qn AS (SELECT q.vec_id, CAST(list_reduce(list_transform(q.qv,
               x -> x * x), (a, b) -> a + b) AS BIGINT) AS qn2
           FROM mq q JOIN qs ON qs.vec_id = q.vec_id),
         qd AS (SELECT q.vec_id, c.sub, c.code,
             CAST(list_reduce(list_transform(range($dsub),
               i -> q.qv[c.sub * $dsub + i + 1] * c.qc[i + 1]),
               (a, b) -> a + b) AS BIGINT) AS dp
           FROM mq q JOIN qs ON qs.vec_id = q.vec_id, cbr c)"""
      val blocks = (1 to maxP).map { np =>
        s"""c$np AS (SELECT pr.vec_id, a.member AS nn_id FROM pr
               JOIN qs ON qs.vec_id = pr.vec_id
               JOIN asn a ON a.cid = pr.cid
               WHERE pr.r <= $np),
         ad$np AS (SELECT c.vec_id, c.nn_id,
             CAST(sum(qd.dp) AS BIGINT) AS adot
           FROM c$np c JOIN me ON me.member = c.nn_id
                       JOIN qd ON qd.vec_id = c.vec_id
                         AND qd.sub = me.sub AND qd.code = me.code
           GROUP BY 1, 2),
         sp$np AS (SELECT a.vec_id, a.nn_id,
             CASE WHEN qn.qn2 = 0 OR pn.pn2 = 0 THEN NULL
               ELSE round(CAST(a.adot AS DOUBLE)
                 / (sqrt(CAST(qn.qn2 AS DOUBLE))
                    * sqrt(CAST(pn.pn2 AS DOUBLE))), 6) END AS score
           FROM ad$np a JOIN qn ON qn.vec_id = a.vec_id
                        JOIN pn ON pn.member = a.nn_id),
         iv$np AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY rnk) AS rr
               FROM (SELECT vec_id, nn_id, row_number() OVER (
                   PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
                   AS rnk FROM sp$np)
               WHERE rnk <= ${k + 1} AND nn_id <> vec_id)
             WHERE rr <= $k),
         pre$np AS (SELECT vec_id, nn_id FROM (SELECT vec_id, nn_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, nn_id ASC) AS rnk FROM sp$np)
             WHERE rnk <= $refine),
         xd$np AS (SELECT p.vec_id, p.nn_id,
             list_reduce(list_transform(range(64),
               i -> ea.v[i+1] * eb.v[i+1]), (a, b) -> a + b) AS dp
           FROM pre$np p JOIN ev ea ON ea.vec_id = p.vec_id
                         JOIN ev eb ON eb.vec_id = p.nn_id),
         xs$np AS (SELECT d.vec_id, d.nn_id,
             round(d.dp / (na.nrm * nb.nrm), 6) AS score
           FROM xd$np d JOIN n na ON na.vec_id = d.vec_id
                        JOIN n nb ON nb.vec_id = d.nn_id),
         iw$np AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY rnk) AS rr
               FROM (SELECT vec_id, nn_id, row_number() OVER (
                   PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
                   AS rnk FROM xs$np)
               WHERE rnk <= ${k + 1} AND nn_id <> vec_id)
             WHERE rr <= $k)"""
      }.mkString(",\n         ")
      val points = (1 to maxP).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           (SELECT CAST(count(*) AS BIGINT) FROM qs) AS n_queries,
           (SELECT CAST(count(*) AS BIGINT) FROM br) AS possible,
           CAST((SELECT count(*) FROM iv$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE) AS recall_pq,
           CAST((SELECT count(*) FROM iw$np i JOIN br b
               ON b.vec_id = i.vec_id AND b.nn_id = i.nn_id) AS DOUBLE)
             / CAST((SELECT count(*) FROM br) AS DOUBLE)
             AS recall_rerank"""
      }.mkString("\n         UNION ALL\n         ")
      s"""WITH $ivfCommon,
         asn AS (SELECT vec_id AS member, cid FROM pr WHERE r = 1),
         qs AS (SELECT vec_id FROM embeddings WHERE vec_id % 20 = 0),
         bc AS (SELECT q.vec_id, e.vec_id AS nn_id FROM qs q, ev e
             WHERE e.vec_id <> q.vec_id),
         bd AS (SELECT c.vec_id, c.nn_id,
               list_reduce(list_transform(range(64),
                 i -> ea.v[i+1] * eb.v[i+1]), (a, b) -> a + b) AS dp
             FROM bc c JOIN ev ea ON ea.vec_id = c.vec_id
                       JOIN ev eb ON eb.vec_id = c.nn_id),
         bs AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM bd d JOIN n na ON na.vec_id = d.vec_id
                       JOIN n nb ON nb.vec_id = d.nn_id),
         br AS (SELECT vec_id, nn_id FROM (
               SELECT vec_id, nn_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY score DESC, nn_id ASC)
                 AS rnk FROM bs)
             WHERE rnk <= $k),
         $train,
         $encode,
         $blocks
         $points"""
    },
    // sampled-k-means quantizer (Lloyd passes unrolled on the 1-in-10
    // sample, q139's integer grid), centroids dequantized by exact
    // power-of-two division, then q305's assignment/probe/rerank
    "q313_ivf_kmeans" -> {
      val k = 8; val iters = 3; val dims = 64
      val passes = (1 to (iters - 1)).map { p =>
        s""",
         kd$p AS (SELECT q.vec_id, c.cid,
             sum((q.qv[c.i + 1] - c.c) * (q.qv[c.i + 1] - c.c)) AS dist
           FROM q, kc${p - 1} c GROUP BY 1, 2),
         ka$p AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cid) AS rn
               FROM kd$p) WHERE rn = 1),
         ks$p AS (SELECT ka$p.cid, dim.i, sum(q.qv[dim.i + 1]) AS s,
               count(*) AS n
             FROM ka$p JOIN q USING (vec_id), dim GROUP BY 1, 2),
         kc$p AS (SELECT cid, i,
               CAST(floor((2 * s + n) / (2.0 * n)) AS BIGINT) AS c
             FROM ks$p)"""
      }.mkString
      s"""WITH q AS (SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 16384.0 + 0.5) AS BIGINT))
               AS qv
           FROM embeddings WHERE vec_id % 10 = 0),
         dim AS (SELECT unnest(range($dims)) AS i),
         kc0 AS (SELECT q.vec_id AS cid, dim.i, q.qv[dim.i + 1] AS c
             FROM q, dim
             WHERE q.vec_id IN (SELECT vec_id FROM q ORDER BY vec_id
               LIMIT $k))$passes,
         km AS (SELECT cid, list_transform(list(c ORDER BY i),
             x -> x / 16384.0) AS cv
           FROM kc${iters - 1} GROUP BY cid),
         $evCte, $nvCte,
         kn AS (SELECT cid, sqrt(list_reduce(
             list_transform(cv, x -> x * x), (a, b) -> a + b)) AS nrm
           FROM km),
         cc AS (SELECT ev.vec_id, km.cid, list_reduce(
             list_transform(range($dims), i -> ev.v[i+1] * km.cv[i+1]),
             (a, b) -> a + b) AS dp
           FROM ev, km),
         sc2 AS (SELECT cc.vec_id, cc.cid,
             round(cc.dp / (nv2.nrm * kn.nrm), 6) AS s
           FROM cc JOIN n nv2 ON nv2.vec_id = cc.vec_id
                   JOIN kn ON kn.cid = cc.cid),
         rr AS (SELECT vec_id, cid, row_number() OVER (
               PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS r
             FROM sc2),
         asn AS (SELECT vec_id AS member, cid FROM rr WHERE r = 1),
         qs AS (SELECT vec_id FROM embeddings WHERE vec_id % 20 = 0),
         cand AS (SELECT rr.vec_id, a.member AS nn_id FROM rr
               JOIN qs ON qs.vec_id = rr.vec_id
               JOIN asn a ON a.cid = rr.cid
               WHERE rr.r <= 2),
         ${pairDotCte("cand", "vec_id", "nn_id")},
         s2 AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d JOIN n na ON na.vec_id = d.vec_id
                    JOIN n nb ON nb.vec_id = d.nn_id),
         r AS (SELECT vec_id, nn_id, score,
               CAST(row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, nn_id ASC) AS BIGINT) AS rnk
             FROM s2)
         SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(nn_id AS BIGINT) AS nn_id, score, rnk
         FROM r WHERE rnk <= 3"""
    },
    // q77's candidate math for an EXTERNAL probe set, self kept
    "q305_ivf_index_query" ->
      s"""WITH $ivfCommon,
         asn AS (SELECT vec_id AS member, cid FROM pr WHERE r = 1),
         qs AS (SELECT vec_id FROM embeddings WHERE vec_id % 20 = 0),
         cand AS (SELECT pr.vec_id, a.member AS nn_id FROM pr
               JOIN qs ON qs.vec_id = pr.vec_id
               JOIN asn a ON a.cid = pr.cid
               WHERE pr.r <= 2),
         ${pairDotCte("cand", "vec_id", "nn_id")},
         s2 AS (SELECT d.vec_id, d.nn_id,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d JOIN n na ON na.vec_id = d.vec_id
                    JOIN n nb ON nb.vec_id = d.nn_id),
         r AS (SELECT vec_id, nn_id, score,
               CAST(row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, nn_id ASC) AS BIGINT) AS rnk FROM s2)
         SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(nn_id AS BIGINT) AS nn_id, score, rnk
         FROM r WHERE rnk <= 3""",
    "q78_semantic_dedup" ->
      s"""WITH $ivfCommon,
         asn AS (SELECT vec_id, cid FROM pr WHERE r = 1),
         p2 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM asn a
               JOIN asn b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         ${pairDotCte("p2", "id_a", "id_b")},
         s2 AS (SELECT d.id_a, d.id_b,
               round(d.dp / (na.nrm * nb.nrm), 6) AS score
             FROM d JOIN n na ON na.vec_id = d.id_a
                    JOIN n nb ON nb.vec_id = d.id_b),
         dr AS (SELECT DISTINCT id_b FROM s2 WHERE score >= 0.25)
         SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
           CAST(a.cid AS BIGINT) AS cid,
           (dr.id_b IS NULL) AS kept
         FROM asn a LEFT JOIN dr ON dr.id_b = a.vec_id""",
    "q55_embedding_near_dup" ->
      s"""WITH $evCte, $nvCte, $planesCte, $dotpCte, $bkCte,
         cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id),
         ${pairDotCte("cand", "id_a", "id_b")}
         SELECT d.id_a, d.id_b, round(d.dp / (na.nrm * nb.nrm), 6) AS cos
         FROM d JOIN n na ON na.vec_id = d.id_a
                JOIN n nb ON nb.vec_id = d.id_b
         WHERE round(d.dp / (na.nrm * nb.nrm), 6) >= 0.3""",
    "q71_embedding_quantize" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM e)
         SELECT vec_id, scale,
           array_to_string(list_transform(v, x -> CASE WHEN scale = 0 THEN 0
             ELSE CAST(floor(x / scale + 0.5) AS INTEGER) END), ',') AS qvec
         FROM s""",
    "q86_emb_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, i,
             CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 16384.0 + 0.5)
               AS BIGINT) AS q
           FROM embeddings, (SELECT unnest(range(64)) AS i) t),
         c AS (SELECT label, i, sum(q) AS sum_q, count(*) AS cnt
             FROM e GROUP BY 1, 2),
         d AS (SELECT e.label, e.vec_id,
               sum((e.q * c.cnt - c.sum_q) * (e.q * c.cnt - c.sum_q)) AS dist2
             FROM e JOIN c ON e.label = c.label AND e.i = c.i
             GROUP BY 1, 2),
         r AS (SELECT label, vec_id, CAST(dist2 AS BIGINT) AS dist2,
               CAST(row_number() OVER (PARTITION BY label
                 ORDER BY dist2 DESC, vec_id ASC) AS BIGINT) AS rnk
             FROM d)
         SELECT label, vec_id, dist2, rnk FROM r WHERE rnk <= 5""",
    "q139_kmeans" -> graft.operators.KMeans.oracleSql(k = 4, iters = 2, dims = 64),
    // r=1 assignments counted per centroid; empty lists kept via the
    // centroid-set left join
    "q300_ivf_balance" ->
      s"""WITH $ivfCommon,
         asn AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members
             FROM pr WHERE r = 1 GROUP BY cid),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
         SELECT CAST(c.vec_id AS BIGINT) AS cid,
           coalesce(a.n_members, 0) AS n_members,
           CAST(coalesce(a.n_members, 0) AS DOUBLE)
             / CAST(tot.n AS DOUBLE) AS share
         FROM cent c LEFT JOIN asn a ON a.cid = c.vec_id, tot""",
    // cosine of SUM vectors on the 14-bit grid: HUGEINT dots mirror
    // Spark's decimal(38,0) sums exactly; one fixed-order double tail
    "q294_centroid_drift" ->
      s"""WITH e AS (SELECT label, i,
             CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 16384.0 + 0.5)
               AS BIGINT) AS q
           FROM embeddings, (SELECT unnest(range(64)) AS i) t),
         c AS (SELECT label, i, sum(q) AS s FROM e GROUP BY 1, 2),
         g AS (SELECT i, sum(s) AS g FROM c GROUP BY 1),
         n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
             FROM embeddings GROUP BY 1),
         d AS (SELECT c.label, sum(c.s * g.g) AS dot_sg,
               sum(c.s * c.s) AS dot_ss
             FROM c JOIN g ON g.i = c.i GROUP BY 1),
         gg AS (SELECT sum(g * g) AS dot_gg FROM g)
         SELECT CAST(d.label AS BIGINT) AS label, n.n_vecs,
           CAST(dot_sg AS DOUBLE) / (sqrt(CAST(dot_ss AS DOUBLE))
             * sqrt(CAST(dot_gg AS DOUBLE))) AS cos_to_global,
           sqrt(CAST(dot_ss AS DOUBLE))
             / (CAST(n.n_vecs AS DOUBLE) * 16384.0) AS centroid_norm
         FROM d JOIN n ON n.label = d.label, gg""",
    "q265_hard_negatives" ->
      s"""WITH $evCte, $nvCte,
         lb AS (SELECT vec_id, label FROM embeddings),
         cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
             CASE WHEN la.label <> lbb.label THEN 1 ELSE 0 END AS neg
           FROM ev a JOIN ev b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
           JOIN lb la ON la.vec_id = a.vec_id
           JOIN lb lbb ON lbb.vec_id = b.vec_id),
         ${pairDotCte("cand", "qid", "nid")},
         s AS (SELECT d.qid, d.nid, c.neg,
             round(dp / (nq.nrm * ne.nrm), 6) AS score
           FROM d JOIN cand c ON c.qid = d.qid AND c.nid = d.nid
                  JOIN n nq ON nq.vec_id = d.qid
                  JOIN n ne ON ne.vec_id = d.nid),
         r AS (SELECT qid AS query_id, neg = 1 AS is_negative,
             nid AS neighbor_id, score,
             CAST(row_number() OVER (PARTITION BY qid, neg
               ORDER BY score DESC, nid ASC) AS BIGINT) AS rnk
           FROM s)
         SELECT query_id, is_negative, neighbor_id, score, rnk
         FROM r WHERE rnk <= 5"""
  )
}
