package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.llm.{Dedup, TextFunctions => TF}

/** LLM training-data pipeline operators over `documents` (SURVEY baseline
  * extension): text analysis, exact dedup, MinHash-LSH near-dup, SimHash,
  * n-gram Jaccard. Every operator is a Column expression whose value is
  * recomputed independently by the DuckDB oracle from the same md5-derived
  * hash primitive — the compare validates VALUES, not just shapes.
  */
object LlmQueries {

  private[graft] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private[queries] val stopListSql = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  // shared DuckDB fragments (tk = token list per doc)
  private[queries] val tkCte =
    """tk AS (SELECT doc_id, lang, source, text,
        list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        FROM documents)"""
  private[queries] def shingleCte(n: Int) =
    s"""sh AS (SELECT doc_id, list_distinct(list_transform(
         generate_series(1, len(t) - ${n - 1}),
         j -> ${(0 until n).map(o => s"t[j + $o]").mkString("concat(", ", ' ', ", ")")})) AS s
       FROM tk WHERE len(t) >= $n)"""
  private def duckHash(seedExpr: String, valExpr: String) =
    s"CAST(concat('0x', substr(md5(concat($seedExpr, '|', $valExpr)), 1, 8)) AS BIGINT)"
  // minhash as 8-hex-char string minima, four 32-bit slices per md5 digest
  // (mirrors Dedup.minhashSignature's hot-path formulation)
  private[queries] val sigCte =
    """sig AS (SELECT doc_id, s, list_transform(generate_series(0, 7), i ->
         list_min(list_transform(s, x ->
           substr(md5(concat(CAST(i // 4 AS VARCHAR), '|', x)),
                  CAST(i % 4 AS INTEGER) * 8 + 1, 8)))) AS mh
       FROM sh WHERE len(s) > 0)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-document text statistics (token counting, char classes,
    // fingerprinting) — one codegen'd map stage, no shuffle.
    "q37_text_stats" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.charClassCount(col("text"), "[a-z]").as("alpha_chars"),
        TF.fingerprint(col("text")).as("fp"))
    }),

    // Quality scoring: stopword ratio, mean token length, composite score.
    "q38_text_quality" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TF.stopwordRatio(col("text"), stopwords).as("stop_ratio"),
        TF.meanTokenLength(col("text")).as("mean_tok_len"),
        TF.qualityScore(col("text"), stopwords).as("quality"))
    }),

    // Marker-word language ID vs the labeled lang column (confusion matrix).
    "q39_lang_id" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), TF.langId(col("text")).as("lang_guess"))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
    }),

    // Exact dedup by normalized-text fingerprint (hash-groupBy; at scale a
    // single shuffle on the 128-bit fingerprint).
    "q40_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")),

    // MinHash signature values themselves (k=8 over 3-gram shingles):
    // validates the hash pipeline value-for-value.
    "q41_minhash_signature" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.shinglesText(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
        .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 8).as("mh"))
        .select(col("doc_id"),
          Dedup.minhashValue(col("mh").getItem(0)).as("m0"),
          Dedup.minhashValue(col("mh").getItem(1)).as("m1"),
          Dedup.minhashValue(col("mh").getItem(2)).as("m2"),
          Dedup.minhashValue(col("mh").getItem(3)).as("m3"))
    }),

    // Near-duplicate pairs via MinHash-LSH bucket join + exact-Jaccard
    // confirmation — the O(Σ bucket²) scale path, not O(n²).
    "q42_lsh_near_dup" -> ((s, dir) =>
      Dedup.nearDuplicatePairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)),

    // Near-dup CLUSTER resolution: LSH pairs → connected components, one
    // cluster id (the component minimum) per document. The piece between
    // pair detection and "keep one per duplicate group".
    "q67_dedup_clusters" -> ((s, dir) =>
      Dedup.nearDuplicateClusters(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)),

    // Per-source corpus card — the one-row-per-source summary a dataset
    // release ships: volume, length profile, language mix, and label
    // agreement between the stored lang column and the marker lang-ID
    // (q39's predictor). ONE scan, one hash aggregate; every rate is an
    // exact-integer ratio divided once.
    "q211_corpus_card" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"), col("n_chars"), col("lang"),
          TF.langId(col("text")).as("guess"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(col("guess") === col("lang"), 1L).otherwise(0L))
            .as("n_lang_match"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          (col("total_chars").cast("double") / col("n_docs"))
            .as("mean_chars"),
          col("n_langs"),
          (col("n_en").cast("double") / col("n_docs")).as("pct_en"),
          (col("n_lang_match").cast("double") / col("n_docs"))
            .as("langid_match_rate"))
    }),

    // Sketch calibration — MinHash-estimated vs exact Jaccard over the
    // banded candidate pairs: for each possible signature-agreement
    // count (0..8 of 8 slots), how many candidate pairs land there and
    // what their exact Jaccard averages. THE operational check before
    // trusting an LSH threshold at a new corpus (est ≈ k·J by the
    // MinHash unbiasedness argument; a drift flags shingle pathology).
    // Same shingle-once/persist-signatures shape as q41; per-pair exact
    // Jaccard is quantized to the 1e-9 grid (q133 discipline) before the
    // mean's sum, so the group means are partition-order-free.
    // Cap/oracle boundary: the star-cap (maxBucket 10000) equals the
    // oracle's uncapped pair enumeration only while every (band, bucket)
    // stays below the cap — LshCapHeadroomSpec pins >=10x headroom at
    // both gate SFs, so divergence fails a spec before it fails the gate.
    "q204_sketch_calibration" -> ((s, dir) => {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.shinglesText(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
        .persist(lvl)
      val sig = sh.select(col("doc_id"),
        Dedup.minhashSignature(col("sh"), 8).as("mh")).persist(lvl)
      val cand = graft.llm.LshGuard.guardedCandidates(
        Dedup.bandsFromShingles(sh, 8, 4), Seq("band", "bucket"),
        "doc_id", maxBucket = 10000, ordered = true)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val withSig = cand
        .join(sig.select(col("doc_id").as("doc_a"), col("mh").as("mh_a")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("mh").as("mh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(filter(zip_with(col("mh_a"), col("mh_b"),
            (x, y) => x === y), v => v)).cast("long").as("est8"))
      val withJac = withSig
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("est8"),
          floor(Dedup.jaccard(col("sh_a"), col("sh_b")) * lit(1e9))
            .cast("long").as("jg"))
      withJac.groupBy(col("est8"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("jg")).as("sjg"))
        .select(col("est8"),
          (col("est8").cast("double") / lit(8.0)).as("est_jaccard"),
          col("n_pairs"),
          (col("sjg").cast("double") / lit(1e9) /
            col("n_pairs").cast("double")).as("mean_exact_jaccard"))
    }),

    // Character-4-gram distinctness — the compression-ratio proxy
    // quality filter (gzip-style filters are standard corpus curation;
    // distinct-gram share is its deterministic, engine-portable stand-
    // in): low ratios flag repetitive/templated/low-entropy text that
    // q65's word-level repetition can miss. One native scan
    // (CharNgramStatsExpr — BMP grams long-pack bijectively, so the
    // distinct count is exact with zero per-gram allocation; the HOF
    // substr form this replaces was the slowest query in the bench),
    // exact integer counts divided once.
    "q215_char_ngram_compressibility" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), length(lower(col("text"))).cast("long")
            .as("n_chars"),
          graft.llm.CharNgramStatsExpr(col("text"), 4).as("st"))
        .select(col("doc_id"), col("n_chars"),
          col("st.n_grams").as("n_grams"),
          col("st.n_distinct").as("n_distinct"))
        .where(col("n_grams") > 0)
        .select(col("doc_id"), col("n_chars"), col("n_grams"),
          col("n_distinct"),
          (col("n_distinct").cast("double") / col("n_grams"))
            .as("distinct_ratio"))
    }),

    // Cross-source contamination matrix: confirmed near-duplicate pairs
    // (q42's banded LSH + exact-Jaccard ≥ 0.5) attributed to their
    // source pair — the audit that tells you WHICH feeds are copying
    // each other (or themselves) before you weight a training mix. One
    // keyed join per side onto the pair set; sources ordered so each
    // unordered pair lands on one row.
    "q216_cross_source_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val src = docs.select(col("doc_id"), col("source"))
      Dedup.nearDuplicatePairs(docs, "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.5)
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Dedup threshold sweep — how many near-dup pairs each candidate
    // Jaccard threshold would keep, from ONE materialization of the
    // banded candidate set (q204's machinery): the calibration curve a
    // team reads before pinning the dedup threshold on a new corpus.
    // Exact per-pair Jaccard computes once; each threshold is a
    // conditional aggregate over the same pair table.
    "q214_dedup_threshold_sweep" -> ((s, dir) => {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.shinglesText(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
        .persist(lvl)
      val cand = graft.llm.LshGuard.guardedCandidates(
        Dedup.bandsFromShingles(sh, 8, 4), Seq("band", "bucket"),
        "doc_id", maxBucket = 10000, ordered = true)
      val jac = cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(Dedup.jaccard(col("sh_a"), col("sh_b")).as("jac"))
      val thresholds = array((3 to 9).map(i => lit(i / 10.0)): _*)
      jac.select(col("jac"), explode(thresholds).as("threshold"))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("jac") >= col("threshold"), 1L).otherwise(0L))
            .as("n_kept"))
    }),

    // Duplicate-cluster size distribution: how big the near-dup
    // families actually are (pairwise counts hide whether 1000 links
    // mean 500 couples or one 50-member blob — the blob is what blows
    // up curation cost). Two hash aggregates over q67's cluster table.
    "q219_cluster_size_distribution" -> ((s, dir) => {
      Dedup.nearDuplicateClusters(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.5)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    }),

    // Per-source duplication-rate report — the corpus-card rollup ON TOP
    // of near-dup clustering (q67): every document left-joins its
    // cluster (unclustered docs are their own trivial cluster), a
    // source's duplicates are its non-canonical members (cluster_id ≠
    // doc_id), dup_rate = duplicates / docs. One keyed join + one hash
    // aggregate beyond the banded clustering it reuses, so the rollup
    // inherits the LSH family's Σ bucket² bound.
    "q200_dedup_rate_by_source" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cl = Dedup.nearDuplicateClusters(docs, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      docs.select(col("doc_id"), col("source"))
        .join(cl, Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cluster_id").isNotNull &&
              col("cluster_id") =!= col("doc_id"), 1L).otherwise(0L))
            .as("n_dup"))
        .select(col("source"), col("n_docs"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_docs")).as("dup_rate"))
    }),

    // Per-document token entropy: H = ln n − (Σ c·ln c)/n over exact
    // integer token counts — the vocabulary-diversity quality feature
    // (low entropy ⇒ repetitive/templated text; complements q65's
    // repetition and q82's cross-corpus surprisal, which measure
    // different things). Both ln calls run on identical integer operands
    // in both engines; round-6 collapses the last-ulp libm divergence
    // (q61 discipline). One (doc, token) count shuffle + one per-doc agg.
    "q133_token_entropy" -> ((s, dir) => {
      val cnt = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      // Σ c·ln c quantized per TERM to an exact 1e-9 Long grid before the
      // sum (each term is computed on identical integer operands in both
      // engines, so the floored grid values agree bit-for-bit; a raw
      // double sum would be partition-order-dependent — q58 discipline)
      cnt.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"),
          sum(floor(col("c").cast("double") * log(col("c").cast("double"))
            * lit(1e9)).cast("long")).as("clnc_grid"))
        .select(col("doc_id"), col("n"),
          round(log(col("n").cast("double"))
            - (col("clnc_grid").cast("double") / lit(1e9))
              / col("n").cast("double"), 6).as("entropy"))
    }),

    // Cross-source duplication matrix: which sources near-duplicate each
    // other, and how much — the inter-dump forensics a corpus build runs
    // before deciding which snapshots to keep (e.g. consecutive crawl
    // dumps overlap heavily; a high off-diagonal cell means one source is
    // largely redundant given another). Rides the existing LSH pair
    // machinery (Σ bucket², hot-bucket guarded); the per-pair source
    // labels join against an id→source dim that broadcasts, and the
    // unordered (least, greatest) pair key folds A→B with B→A.
    "q132_source_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
        .groupBy(least(col("src_a"), col("src_b")).as("source_x"),
          greatest(col("src_a"), col("src_b")).as("source_y"))
        .agg(count(lit(1)).as("n_dup_pairs"))
    }),

    // Keep-BEST curation policy: per near-duplicate cluster keep the
    // highest-quality member (not the min-id) — the policy a real corpus
    // build wants, since duplicates routinely differ in boilerplate and
    // truncation. Winner selection is a hash aggregate over
    // min(struct(-quality_grid, doc_id)) — the q61 discipline: exact
    // integer grid (doubles tie bit-identically on both engines),
    // deterministic min-id tiebreak, no ranking window, and max_by is
    // deliberately avoided (its tie choice is arrival-order-dependent).
    // Does keep-best MATTER? The per-cluster quality dispersion prices
    // q130's policy: a cluster with zero spread could keep any member,
    // while a wide spread means the choice moves real quality mass.
    // Same cluster + quality-grid composition as q130, reduced to the
    // exact integer (min, max, spread) per cluster — no ranking window.
    "q301_cluster_quality_spread" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cl = Dedup.nearDuplicateClusters(docs, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      val q = docs.select(col("doc_id"),
        TF.qualityScore(col("text"), stopwords).as("quality"))
      cl.join(q, Seq("doc_id"))
        .select(col("cluster_id").as("cid"),
          floor(col("quality") * lit(1e9)).cast("long").as("qg"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).cast("long").as("n_members"),
          min(col("qg")).cast("long").as("q_min_grid"),
          max(col("qg")).cast("long").as("q_max_grid"),
          (max(col("qg")) - min(col("qg"))).cast("long")
            .as("spread_grid"))
    }),

    "q130_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cl = Dedup.nearDuplicateClusters(docs, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      val q = docs.select(col("doc_id"),
        TF.qualityScore(col("text"), stopwords).as("quality"))
      cl.join(q, Seq("doc_id"))
        .select(col("cluster_id").as("cid"), col("doc_id"),
          floor(col("quality") * lit(1e9)).cast("long").as("qg"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          min(struct(negate(col("qg")).as("nq"), col("doc_id").as("d"))).as("best"),
          max(col("qg")).as("best_q_grid"))
        .select(col("cid"), col("best.d").as("kept_doc"),
          col("n_members"), col("best_q_grid"))
    }),

    // Exact pairwise n-gram Jaccard within a partition key (source),
    // inverted-index formulation: hash joins + group counts, never a
    // per-pair array intersection, and non-overlapping pairs never exist.
    "q43_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairsWithin(Tables.documents(s, dir), "doc_id", "text",
        partitionCol = "source", shingleN = 3, threshold = 0.1)),

    // Prefix-filtered all-pairs join (AllPairs/PPJoin): same result set as
    // q43 but candidates come from rare-token PREFIXES under a global
    // df-ascending order instead of the full inverted index — the scale
    // rung for corpora whose frequent-shingle buckets dominate Σ bucket².
    // Shares q43's brute-force oracle verbatim (same semantics).
    // Crossover note: at fixture scale the full index is CHEAPER (q43
    // 0.7 s vs 1.5 s at sf0.1) because the df-count and per-doc ordering
    // passes cost more than the candidate reduction saves on benign
    // bucket distributions; the prefix path's advantage is asymptotic in
    // bucket skew (boilerplate/stopword shingles at corpus scale), which
    // is why BOTH rungs ship.
    "q140_prefix_jaccard" -> ((s, dir) =>
      Dedup.prefixJaccardPairsWithin(Tables.documents(s, dir), "doc_id",
        "text", partitionCol = "source", shingleN = 3, threshold = 0.1)),

    // Asymmetric containment (partial-copy detection): |A∩B| / min(|A|,|B|)
    // catches a small doc quoted inside a large one that Jaccard misses.
    "q75_containment" -> ((s, dir) =>
      Dedup.containmentPairsWithin(Tables.documents(s, dir), "doc_id", "text",
        partitionCol = "source", shingleN = 3, threshold = 0.2)),

    // Substring-level exact dedup (the suffix-array shape): per doc, the
    // maximal token spans whose every 5-gram occurs in another document.
    "q76_substring_dedup" -> ((s, dir) =>
      graft.llm.SubstringDedup.duplicatedSpans(
        Tables.documents(s, dir), "doc_id", "text", k = 5)),

    // 16-bit SimHash per document (frequency-weighted majority per bit).
    "q44_simhash" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.simhash16(TF.tokens(col("text"))).as("sh16"))
    }),

    // SimHash near-dup pairs: 64-bit hash, 16-bit pigeonhole bands
    // (4×65,536 buckets) for candidates, exact Hamming filter ≤ 3.
    "q57_simhash_near_dup" -> ((s, dir) =>
      Dedup.simhashNearDuplicates(Tables.documents(s, dir), "doc_id", "text", 3)),

    // Rabin–Karp rolling-hash fingerprint per document (the cheap
    // non-cryptographic dedup key) + collision-group sizes.
    "q56_rolling_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TF.rollingFingerprint(col("text")).as("rh"))
    }),

    // PII scrub pass: redact emails/phones/long digit runs + per-category
    // audit counts. One codegen'd map stage, no shuffle.
    "q63_pii_redaction" -> ((s, dir) => {
      val (ne, np, nd) = TF.piiCounts(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), TF.redactPii(col("text")).as("red_text"),
          ne.as("n_email"), np.as("n_phone"), nd.as("n_id"))
    }),

    // Within-document repetition scores (token- and trigram-level): the
    // boilerplate/loop-detection quality signal. Narrow map stage.
    "q65_repetition_score" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TF.repetitionScore(col("text"), 1).as("rep1"),
          TF.repetitionScore(col("text"), 3).as("rep3"))
    }),

    // Deterministic hash-based stratified sampling (per-language rates):
    // membership is a pure function of doc_id — reproducible across
    // engines/runs and pushed down as an ordinary filter, unlike RNG
    // sampling. The standard corpus-rebalancing op.
    "q64_stratified_sample" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(TF.stratifiedKeep(col("doc_id"), col("lang"),
          Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "es" -> 0.1),
          defaultRate = 0.0))
        .select(col("doc_id"), col("lang"))
    }),

    // Sequence packing: assign documents to fixed token-budget training
    // chunks, sharded (lang, doc_id % 8) so each shard packs
    // independently — the window runs per shard, never a global sort.
    "q69_pack_chunks" -> ((s, dir) =>
      graft.llm.Packing.packChunks(Tables.documents(s, dir),
        "doc_id", "text", "lang", tokenBudget = 512, shards = 8)),

    // Mixture balancing: downsample to a target language mixture without
    // upsampling — T = min(count_l / p_l), per-lang keep rate p_l·T /
    // count_l, membership by the deterministic portable hash. en binds
    // (rate 1.0) at the fixture distribution; the rest downsample.
    "q79_mixture_balance" -> ((s, dir) =>
      graft.llm.Mixture.balanceToTargets(Tables.documents(s, dir),
          "doc_id", "lang",
          Map("en" -> 0.5, "zh" -> 0.15, "es" -> 0.15,
              "de" -> 0.1, "fr" -> 0.1))
        .select(col("doc_id"), col("lang"))),

    // Overlapping chunking (RAG / context-window prep): 120-token chunks
    // every 80 tokens; last chunk reaches the tail, empty docs yield one
    // empty chunk. Narrow generator — no shuffle.
    "q80_chunk_overlap" -> ((s, dir) =>
      graft.llm.Packing.chunkWithOverlap(Tables.documents(s, dir),
        "doc_id", "text", window = 120, stride = 80)),

    // Deterministic epoch shuffle: hash-sharded, hash-ordered training
    // layout — a pure function of (doc_id, seed), re-seedable per epoch.
    "q81_epoch_shuffle" -> ((s, dir) =>
      graft.llm.Packing.epochShuffle(Tables.documents(s, dir),
        "doc_id", shards = 8, seed = 11)),

    // Unigram LM surprisal (the CCNet perplexity-filter shape): mean
    // bits/token under a per-lang corpus LM; integer-microbit summation
    // keeps the score exact and order-independent across engines.
    "q82_lm_surprisal" -> ((s, dir) =>
      graft.llm.LmScore.unigramSurprisal(Tables.documents(s, dir),
        "doc_id", "text", "lang")),

    // Winnowing (MOSS) fingerprint selection: min 4-gram hash per window
    // of 5 (rightmost tie), the sub-linear sketch for partial-copy
    // detection — any >= 8-token match shares a fingerprint.
    "q83_winnowing" -> ((s, dir) =>
      graft.llm.Winnowing.fingerprints(Tables.documents(s, dir),
        "doc_id", "text", k = 4, w = 5)),

    // Gopher-style quality rule bundle: per-document rule values + the
    // conjunction verdict (published heuristic thresholds; fixture docs
    // split on the 50-word floor). Pure map stage — no shuffle at any SF.
    "q84_gopher" -> ((s, dir) => {
      val (wc, meanLen, alphaR, symR, stopHits, passes) =
        TF.gopherRules(col("text"), stopwords)
      Tables.documents(s, dir).select(col("doc_id"),
        wc.as("word_count"), meanLen.as("mean_word_len"),
        alphaR.as("alpha_ratio"), symR.as("symbol_ratio"),
        stopHits.as("stop_hits"), passes.as("passes"))
    }),

    // BM25 retrieval scoring against a fixed query — the targeted-search
    // half of corpus curation (see Bm25 for the micro-quantized
    // determinism + broadcast-stats scale shape).
    "q98_bm25" -> ((s, dir) =>
      graft.llm.Bm25.score(Tables.documents(s, dir), "doc_id", "text",
        queryTerms = Seq("join", "hash", "window"))),

    // Deterministic train/val/test split: membership is a pure hash of
    // doc_id (90/5/5), so the split survives re-partitioning, reruns and
    // engine changes — row-identical oracle, not a statistical check.
    "q85_split" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TF.splitAssign(col("doc_id")).as("split"))),

    // Bigram corpus-frequency scoring: per-lang bigram counts joined back
    // to each document's bigram stream — mean corpus frequency of a doc's
    // bigrams is a cheap fluency/common-phrase signal (all-integer
    // arithmetic: engine-portable, no float summation order). At 100 TB
    // the count table gets a frequency floor (drop hapax bigrams) before
    // the join; the join itself shuffles on (lang, bigram) — the classic
    // bounded-key shape.
    "q72_bigram_score" -> ((s, dir) => {
      // MATERIALIZED like the LSH signature tables: consumed twice (count
      // build + probe) and an unpersisted explode re-derives the bigram
      // array per output row — the generator re-evaluation trap.
      val bg = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(TF.bigrams(col("text"))).as("bg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bc = bg.groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c"))
      bg.join(bc, Seq("lang", "bg"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("c")).as("sum_freq"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
          (col("sum_freq").cast("double") / col("n_bigrams").cast("double"))
            .as("mean_freq"))
    }),

    // Benchmark-contamination gate: trigram overlap of every document
    // against an "eval set" (here: the shingles of docs 0–4, so planted
    // self-contamination scores 1.0). Broadcast semi-join — the corpus
    // never shuffles.
    "q73_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.where(col("doc_id") < 5)
        .select(explode(Dedup.shinglesText(col("text"), 3)).as("g"))
      graft.llm.Contamination.contaminationScore(docs, evalSet,
        "doc_id", "text", n = 3)
    }),

    // Heavy hitters: top-5 tokens per language through the bounded
    // space-saving summary (state O(capacity) per group however long the
    // stream — the vocab-mining shape). capacity ≥ the fixture vocabulary
    // so the sketch is provably exact here and the oracle is hard.
    "q74_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
        .as[(String, String)]
      val ss = new graft.operators.SpaceSavingAggregator(5, 1024).toColumn
      toks.groupByKey(_._1)
        .mapValues(_._2)
        .agg(ss.name("top"))
        .flatMap { case (lang, top) =>
          top.iterator.zipWithIndex.map { case ((t, c), i) =>
            (lang, t, c, (i + 1).toLong)
          }
        }
        .toDF("lang", "token", "cnt", "rnk")
    }),

    // Count-min sketch point-frequency estimates: per-lang depth×width
    // grid (bounded state, elementwise-add merge ⇒ partition-independent),
    // probed for a fixed token set against exact counts. The never-
    // undercount invariant is deterministic; the oracle rebuilds every
    // probed CELL from the same md5 hash — the sketch itself is checked,
    // not just its outputs.
    "q87_cms" -> ((s, dir) => {
      import s.implicits._
      val depth = 4; val width = 16
      val probes = Seq("table", "value", "spark", "query", "xyzzy")
      val toks = Tables.documents(s, dir)
        .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cms = new graft.operators.CountMinAggregator(depth, width).toColumn
      val est = toks.as[(String, String)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(cms.name("cells"))
        .flatMap { case (lang, cells) => probes.map(p =>
          (lang, p, graft.operators.CountMin.estimate(cells, p, depth, width)))
        }
        .toDF("lang", "token", "est")
      val exact = toks.where(col("tok").isin(probes: _*))
        .groupBy(col("lang"), col("tok").as("token"))
        .agg(count(lit(1)).as("exact"))
      est.join(exact, Seq("lang", "token"), "left")
        .select(col("lang"), col("token"),
          coalesce(col("exact"), lit(0L)).as("exact"), col("est"),
          (col("est") >= coalesce(col("exact"), lit(0L))).as("no_undercount"))
    }),

    // Bloom filter membership: per-lang 256-bit filter over the token
    // vocabulary (bitwise-OR merge ⇒ partition- AND duplication-
    // independent), probed for the fixed token set against exact
    // membership. The oracle rebuilds every WORD of the bit array in
    // DuckDB — the filter itself is value-checked — and the no-false-
    // negative invariant is asserted per probe.
    "q88_bloom" -> ((s, dir) => {
      import s.implicits._
      val kH = 4; val mBits = 256
      val probes = Seq("table", "value", "spark", "query", "xyzzy")
      val toks = Tables.documents(s, dir)
        .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bloom = new graft.operators.BloomAggregator(kH, mBits).toColumn
      val filt = toks.as[(String, String)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(bloom.name("w")).toDF("lang", "w")
      val pr = filt.select(col("lang"), col("w"),
        explode(array(probes.map(lit): _*)).as("token"))
      // mirror of Bloom.bitPos as Column arithmetic (same md5 prefix)
      def bloomPos(i: Int) = pmod(
        conv(substring(md5(concat(lit(s"bloom$i|"), col("token"))), 1, 8),
          16, 10).cast("long"), lit(mBits.toLong))
      val inFilter = (0 until kH).map { i =>
        val p = bloomPos(i)
        call_function("shiftleft", lit(1L), (p % 64).cast("int"))
          .bitwiseAND(element_at(col("w"), (p / 64).cast("int") + 1)) =!= lit(0L)
      }.reduce(_ && _)
      val present = toks.where(col("tok").isin(probes: _*))
        .select(col("lang"), col("tok").as("token")).distinct()
        .withColumn("present", lit(true))
      pr.join(present, Seq("lang", "token"), "left")
        .select(col("lang"), col("token"),
          coalesce(col("present"), lit(false)).as("present"),
          inFilter.as("in_filter"),
          (!coalesce(col("present"), lit(false)) || inFilter).as("no_false_neg"),
          element_at(col("w"), 1).as("w0"), element_at(col("w"), 2).as("w1"),
          element_at(col("w"), 3).as("w2"), element_at(col("w"), 4).as("w3"))
    }),

    // Capstone: full curation pipeline (quality gate → LSH near-dup
    // removal → per-language corpus stats), all stages previously
    // verified individually, composed declaratively.
    "q58_curation_pipeline" -> ((s, dir) => {
      graft.llm.Curation.curate(Tables.documents(s, dir), stopwords,
          minQuality = 0.4, jaccardThreshold = 0.5)
        .groupBy(col("lang"))
        // Order-independent mean: double avg() sums in partition order and
        // drifts in the last ulp run-to-run. Floor each (bit-identical)
        // per-doc quality to an exact 1e-9 grid, sum as Long, divide in
        // double — both engines then do the identical operation sequence.
        .agg(count(lit(1)).as("n_docs"),
          (sum(floor(col("quality") * lit(1e9)).cast("long")).cast("double")
            / lit(1e9) / count(lit(1)).cast("double")).as("avg_quality"))
    }),

    // TF-IDF: inverted-index term scoring (tf per doc-token, df across
    // docs, ln(N/df) weighting) and the top-scoring term per document.
    "q61_tfidf" -> ((s, dir) => {
      val ex = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      val tf = ex.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, dir).agg(countDistinct(col("doc_id")).as("n"))
      val scored = tf.join(df, "tok").crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("tok"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
      // top term per doc as a hash aggregate, NOT a ranking window:
      // min(struct(-tfidf, tok)) picks (max tfidf, ties → min tok) — same
      // winner as the oracle's row_number ordering — with a map-side
      // partial combine instead of a full per-doc sort. At 100 TB the
      // window form re-sorts every (doc, term) pair; this shuffles one
      // struct per doc.
      scored.groupBy(col("doc_id"))
        .agg(min(struct(negate(col("tfidf")).as("neg"), col("tok"))).as("top"))
        .select(col("doc_id"), col("top.tok").as("top_term"),
          // + 0.0 folds IEEE -0.0 (a negated zero score) back to 0.0
          (negate(col("top.neg")) + lit(0.0)).as("tfidf"))
    }),

    // Binary payload columns (multimodal plumbing): byte lengths and
    // digests survive the string→binary→digest path identically.
    "q54_binary_columns" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("payload_bytes"),
          md5(col("payload")).as("payload_md5"))
    }),

    // REAL image decode through javax.imageio: every 10th document gets a
    // deterministic synthetic PNG (gray fill (31·id + 7x + 13y) mod 256,
    // dims 8+id%9 × 8+id%7 — see Multimodal.syntheticPng), which the
    // per-partition ImageIoDecoder then decodes back to dimensions, band
    // count and the exact pixel-intensity sum. PNG is lossless, so the
    // oracle can recompute the identical stats ARITHMETICALLY over an
    // unnested pixel grid — a hash match proves the encode→decode codec
    // path, not just plumbing. Scale shape: encode+decode are one narrow
    // mapPartitions pass each (no shuffle until the final row emit);
    // payload bytes never leave the partition that synthesized them.
    // SymSpell-style string-similarity join: candidate pairs are names
    // whose 1-token-DELETION neighborhoods intersect (covers word-level
    // insert/delete distance ≤ 1 and same-position substitution), scored
    // with exact character Levenshtein. The deletion-neighborhood join is
    // the scale face of edit-distance matching: each distinct name emits
    // t+1 keys (t = tokens), the join is a plain equi-join on the variant
    // key, and candidate volume is Σ bucket² over variant buckets — the
    // same boundedness argument as the LSH band joins (add the LshGuard
    // star-cap if a variant goes degenerate-hot). Names dedupe to their
    // distinct table FIRST (64 names / 2000 parts here), so the quadratic
    // term never sees row counts, only vocabulary.
    "q146_symspell_join" -> ((s, dir) => {
      val names = Tables.part(s, dir)
        .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      val toks = names.withColumn("toks", split(col("p_name"), " "))
      val variants = toks.select(col("p_name"), col("n"),
        explode(array_distinct(concat(
          array(col("p_name")),
          transform(sequence(lit(0), size(col("toks")) - 1), i =>
            array_join(concat(
              slice(col("toks"), lit(1), i),
              slice(col("toks"), i + lit(2), size(col("toks")))), " ")))))
          .as("variant"))
      variants.as("a")
        .join(variants.as("b"),
          col("a.variant") === col("b.variant") &&
            col("a.p_name") < col("b.p_name"))
        .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .distinct()
        .withColumn("lev",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
    }),

    // REAL audio decode through javax.sound.sampled — the audio twin of
    // q144: every 10th document gets a deterministic synthetic mono
    // 16-bit PCM WAV (sample i = (31·id + 7·i) mod 4096 − 2048, length
    // 64 + id%97, rate 8000 + 100·(id%5)), decoded back to format header
    // + exact amplitude sum. PCM is lossless → the DuckDB oracle
    // recomputes the identical stats arithmetically; a hash match
    // certifies the RIFF/PCM codec path. Same narrow two-mapPartitions
    // shape as q144; payloads never leave their partition.
    "q150_audio_decode" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val ids = Tables.documents(s, dir)
        .select(col("doc_id"))
        .where(pmod(col("doc_id"), lit(10)) === 0)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType, nullable = true)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val withWav = ids.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id, Multimodal.syntheticWav(id))
        }
      }(enc)
      Multimodal.decodeAudioStats(withWav)
        .where(col("decoded")) // all synthetic WAVs must decode
        .select(col("media_id").as("doc_id"), col("sample_rate"),
          col("channels"), col("n_samples"), col("amp_sum"),
          (col("amp_sum").cast("double") / col("n_samples").cast("double"))
            .as("amp_mean"))
    }),

    "q144_image_decode" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val ids = Tables.documents(s, dir)
        .select(col("doc_id"))
        .where(pmod(col("doc_id"), lit(10)) === 0)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType, nullable = true)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val withPng = ids.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id, Multimodal.syntheticPng(id))
        }
      }(enc)
      Multimodal.decodeImageStats(withPng)
        .where(col("decoded")) // all synthetic PNGs must decode
        .select(col("media_id").as("doc_id"), col("width"), col("height"),
          col("channels"), col("px_sum"),
          (col("px_sum").cast("double")
            / (col("width") * col("height")).cast("double")).as("px_mean"))
    }),

    // SQL-surface jaccard threshold join: the same probe-vs-corpus
    // near-dup screen a thrift-server/notebook user would type — the
    // injected `jaccard_sim` function through spark.sql, with the
    // predicate landing in the join condition where the injected
    // JaccardSizeRatioRule attaches its size-ratio prefilter (the gate
    // thus verifies the guarded plan is value-identical to the
    // unguarded oracle). Probe side is 20 docs broadcast, so candidate
    // volume is 20·n — linear in the corpus; the similarity is floored
    // onto the 1e-9 grid (q133 discipline: both engines divide the
    // same exact ints, so the double is bit-identical).
    "q222_jaccard_sql_screen" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          array_distinct(expr(
            "filter(split(lower(text), '\\\\s+'), x -> x != '')")).as("toks"))
        .where(size(col("toks")) > 0)
        .createOrReplaceTempView("g_doc_toks")
      s.sql("""
        SELECT a.doc_id AS probe_id, b.doc_id AS doc_id,
               CAST(floor(jaccard_sim(a.toks, b.toks) * 1e9) AS BIGINT) AS jac_g
        FROM g_doc_toks a
        JOIN g_doc_toks b
          ON a.lang = b.lang AND a.doc_id < 20 AND b.doc_id > a.doc_id
        WHERE jaccard_sim(a.toks, b.toks) >= CAST(0.2 AS DOUBLE)""")
    }),

    // Incremental ingestion dedup — the production shape dedup actually
    // runs in: the existing corpus (doc_id % 5 != 4 here) is banded
    // once like an index build, the arriving batch (doc_id % 5 = 4)
    // joins band-for-band against it, and only new×ref candidates pay
    // the exact verify. Never re-screens ref×ref; per-batch cost tracks
    // the batch, not the corpus (Dedup.incrementalNearDuplicates —
    // StreamingNearDup is the same contract on a stream).
    "q224_incremental_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalNearDuplicates(
        docs.where(col("doc_id") % 5 =!= 4),
        docs.where(col("doc_id") % 5 === 4),
        "doc_id", "text", shingleN = 3, k = 8, bands = 4, threshold = 0.5)
    }),

    // Language-ID evaluation table — per-class precision/recall/F1 of
    // the marker predictor (q39) against the stored label: the corpus
    // collapses into the ≤(k+1)² confusion table in ONE hash agg
    // (persisted — support/predicted/diagonal all derive from it),
    // marginals ride broadcast joins, and every rate is one double
    // division in identical order on both engines.
    "q229_langid_eval" -> ((s, dir) => {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val conf = Tables.documents(s, dir)
        .select(col("lang"), TF.langId(col("text")).as("guess"))
        .groupBy(col("lang"), col("guess")).agg(count(lit(1)).as("c"))
        .persist(lvl)
      val support = conf.groupBy(col("lang")).agg(sum(col("c")).as("support"))
      val predicted = conf.groupBy(col("guess")).agg(sum(col("c")).as("predicted"))
      val correct = conf.where(col("lang") === col("guess"))
        .select(col("lang"), col("c").as("correct"))
      val p = col("correct").cast("double") / col("predicted").cast("double")
      val r = col("correct").cast("double") / col("support").cast("double")
      // FULL outer over the two margins: a class that is predicted but
      // never a true label (the 'und' fallback) must still appear, or
      // the table under-reports the misclassification mass
      support
        .join(broadcast(predicted), col("lang") === col("guess"), "full_outer")
        .select(coalesce(col("lang"), col("guess")).as("lang"),
          coalesce(col("support"), lit(0L)).as("support"),
          coalesce(col("predicted"), lit(0L)).as("predicted"))
        .join(broadcast(correct), Seq("lang"), "left")
        .select(col("lang"), col("support"), col("predicted"),
          coalesce(col("correct"), lit(0L)).as("correct"))
        .select(col("lang"), col("support"), col("predicted"), col("correct"),
          when(col("predicted") > 0, p).otherwise(lit(0.0)).as("precision"),
          when(col("support") > 0, r).otherwise(lit(0.0)).as("recall"))
        .withColumn("f1",
          when(col("precision") + col("recall") > 0,
            lit(2.0) * col("precision") * col("recall")
              / (col("precision") + col("recall"))).otherwise(lit(0.0)))
    }),

    // Effective corpus size — the headline curation stat every training
    // run starts from: per source, raw volume vs what survives near-dup
    // cluster collapse (the min-id member represents its cluster;
    // singletons represent themselves). Rides q67's cluster table; one
    // left join + one hash agg; keep_ratio is a single double division
    // of exact integer sums.
    "q228_effective_corpus" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val clusters = Dedup.nearDuplicateClusters(d, "doc_id", "text",
        shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      d.select(col("doc_id"), col("source"), col("n_chars"))
        .join(clusters, Seq("doc_id"), "left")
        .select(col("source"), col("n_chars"),
          (col("doc_id") === coalesce(col("cluster_id"), col("doc_id")))
            .as("kept"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_raw"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("docs_kept"),
          sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("chars_kept"))
        .select(col("source"), col("n_docs"), col("chars_raw"),
          col("docs_kept"), col("chars_kept"),
          (col("chars_kept").cast("double") / col("chars_raw").cast("double"))
            .as("keep_ratio"))
    }),

    // First BPE merge iteration — the adjacent-symbol-pair census every
    // tokenizer build starts from: count each word ONCE into a (word,
    // weight) vocab (corpus collapses in the first hash agg), expand
    // each distinct word's adjacent 2-char windows, weight by word
    // frequency, keep the top 20 merge candidates. Candidate work is
    // Σ|word| over the VOCAB, not the corpus; the final cut is a
    // TakeOrdered over the pair table with a total (n DESC, pair)
    // order, so the boundary is deterministic on both engines.
    "q223_bpe_pair_census" -> ((s, dir) => {
      val vocab = Tables.documents(s, dir)
        .select(explode(expr(
          "filter(split(lower(text), '\\\\s+'), x -> x != '')")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("weight"))
        .where(length(col("w")) >= 2)
      vocab
        .select(col("weight"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("weight")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    })
  )

  private def simhashTermsN(bits: Int) = (0 until bits).map { b =>
    s"CASE WHEN 2 * len(list_filter(h, x -> (x >> $b) & 1 = 1)) > len(h) THEN ${1L << b} ELSE 0 END"
  }.mkString(" + ")
  private val simhashTerms = simhashTermsN(16)
  // 64-bit variant in DuckDB's UBIGINT domain (BIGINT can't hold bit 63
  // unsigned); bit values emitted as unsigned decimal literals because
  // DuckDB's `1 << 63` overflows even for UBIGINT operands.
  private val simhashTerms64 = (0 until 64).map { b =>
    s"""CASE WHEN 2 * len(list_filter(h, x -> (x >> $b) & 1 = 1)) > len(h)
       THEN CAST('${java.lang.Long.toUnsignedString(1L << b)}' AS UBIGINT)
       ELSE CAST(0 AS UBIGINT) END"""
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q79_mixture_balance" ->
      s"""WITH c AS (SELECT lang AS stratum, count(*) AS n
             FROM documents GROUP BY 1),
         t AS (SELECT * FROM (VALUES ('en', 0.5), ('zh', 0.15),
             ('es', 0.15), ('de', 0.1), ('fr', 0.1)) v(stratum, p)),
         r0 AS (SELECT c.stratum, c.n, t.p, c.n / t.p AS ratio
             FROM c JOIN t USING (stratum)),
         r AS (SELECT stratum,
             (p * (SELECT min(ratio) FROM r0)) / n AS rate FROM r0)
         SELECT d.doc_id, d.lang FROM documents d
         JOIN r ON r.stratum = d.lang
         WHERE (${duckHash("'13'", "CAST(doc_id AS VARCHAR)")} % 1000000)
           < rate * 1000000""",
    "q80_chunk_overlap" ->
      s"""WITH $tkCte,
         g AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
             1 + CASE WHEN len(t) > 120
               THEN CAST(floor((len(t) - 120 + 79) / 80.0) AS BIGINT)
               ELSE 0 END AS nch FROM tk),
         ex AS (SELECT doc_id, t, n, unnest(range(nch)) AS i FROM g)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           least(120, n - i * 80) AS chunk_tokens,
           array_to_string(t[(i * 80 + 1):(i * 80 + 120)], ' ')
             AS chunk_text
         FROM ex""",
    "q83_winnowing" ->
      s"""WITH $tkCte,
         g0 AS (SELECT doc_id, t, len(t) - 3 AS L FROM tk
             WHERE len(t) >= 4),
         g AS (SELECT doc_id, L, jj - 1 AS pos,
             ${duckHash("'17'",
               "concat(t[jj], ' ', t[jj+1], ' ', t[jj+2], ' ', t[jj+3])")} AS h
           FROM (SELECT doc_id, L, t,
               unnest(generate_series(1, L)) AS jj FROM g0)),
         wn AS (SELECT doc_id, pos, h,
             unnest(generate_series(greatest(0, pos - 4),
               least(pos, greatest(L - 5, 0)))) AS wi
           FROM g),
         sel AS (SELECT doc_id, wi, h, pos,
             row_number() OVER (PARTITION BY doc_id, wi
               ORDER BY h ASC, pos DESC) AS rn
           FROM wn)
         SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST(h AS BIGINT) AS fp
         FROM sel WHERE rn = 1""",
    "q88_bloom" ->
      s"""WITH $tkCte,
         tc AS (SELECT lang, unnest(t) AS tok FROM tk),
         langs AS (SELECT DISTINCT lang FROM tc),
         toksd AS (SELECT DISTINCT lang, tok FROM tc),
         probes AS (SELECT unnest(['table', 'value', 'spark', 'query',
             'xyzzy']) AS token),
         hs AS (SELECT unnest(range(4)) AS i),
         bits AS (SELECT DISTINCT lang,
             ${duckHash("concat('bloom', CAST(i AS VARCHAR))", "tok")}
               % 256 AS pos
           FROM toksd, hs),
         words AS (SELECT lang, pos // 64 AS wi,
             bit_or(CASE WHEN pos % 64 = 63
                         THEN CAST(-9223372036854775808 AS BIGINT)
                         ELSE 1::BIGINT << CAST(pos % 64 AS INTEGER) END) AS w
           FROM bits GROUP BY 1, 2),
         wfull AS (SELECT g.lang, g.wi, COALESCE(words.w, 0) AS w
           FROM (SELECT l.lang, r.wi FROM langs l
                 CROSS JOIN (SELECT unnest(range(4)) AS wi) r) g
           LEFT JOIN words ON words.lang = g.lang AND words.wi = g.wi),
         wp AS (SELECT lang,
             max(CASE WHEN wi = 0 THEN w END) AS w0,
             max(CASE WHEN wi = 1 THEN w END) AS w1,
             max(CASE WHEN wi = 2 THEN w END) AS w2,
             max(CASE WHEN wi = 3 THEN w END) AS w3
           FROM wfull GROUP BY lang),
         pb AS (SELECT l.lang, p.token, h.i,
             ${duckHash("concat('bloom', CAST(h.i AS VARCHAR))", "p.token")}
               % 256 AS pos
           FROM langs l, probes p, hs h),
         hit AS (SELECT pb.lang, pb.token,
             bool_and((wf.w & CASE WHEN pb.pos % 64 = 63
                 THEN CAST(-9223372036854775808 AS BIGINT)
                 ELSE 1::BIGINT << CAST(pb.pos % 64 AS INTEGER) END) <> 0)
               AS in_filter
           FROM pb JOIN wfull wf
             ON wf.lang = pb.lang AND wf.wi = pb.pos // 64
           GROUP BY 1, 2),
         pres AS (SELECT lang, tok AS token, TRUE AS present FROM toksd
           WHERE tok IN ('table', 'value', 'spark', 'query', 'xyzzy'))
         SELECT hit.lang, hit.token,
           COALESCE(pres.present, FALSE) AS present, hit.in_filter,
           (NOT COALESCE(pres.present, FALSE) OR hit.in_filter)
             AS no_false_neg,
           wp.w0, wp.w1, wp.w2, wp.w3
         FROM hit
         LEFT JOIN pres ON pres.lang = hit.lang AND pres.token = hit.token
         JOIN wp ON wp.lang = hit.lang""",
    "q87_cms" ->
      s"""WITH $tkCte,
         tc AS (SELECT lang, unnest(t) AS tok FROM tk),
         probes AS (SELECT unnest(['table', 'value', 'spark', 'query',
             'xyzzy']) AS token),
         rws AS (SELECT unnest(range(4)) AS i),
         cells AS (SELECT lang, i,
             ${duckHash("concat('cms', CAST(i AS VARCHAR))", "tok")} % 16 AS j,
             CAST(count(*) AS BIGINT) AS c
           FROM tc, rws GROUP BY 1, 2, 3),
         pj AS (SELECT l.lang, p.token, r.i,
             ${duckHash("concat('cms', CAST(r.i AS VARCHAR))", "p.token")}
               % 16 AS j
           FROM (SELECT DISTINCT lang FROM tc) l, probes p, rws r),
         est AS (SELECT pj.lang, pj.token,
             min(COALESCE(c.c, 0)) AS est
           FROM pj LEFT JOIN cells c
             ON c.lang = pj.lang AND c.i = pj.i AND c.j = pj.j
           GROUP BY 1, 2),
         ex AS (SELECT lang, tok AS token, CAST(count(*) AS BIGINT) AS exact
           FROM tc
           WHERE tok IN ('table', 'value', 'spark', 'query', 'xyzzy')
           GROUP BY 1, 2)
         SELECT est.lang, est.token,
           COALESCE(ex.exact, CAST(0 AS BIGINT)) AS exact,
           CAST(est.est AS BIGINT) AS est,
           est.est >= COALESCE(ex.exact, 0) AS no_undercount
         FROM est LEFT JOIN ex
           ON ex.lang = est.lang AND ex.token = est.token""",
    "q98_bm25" ->
      graft.llm.Bm25.oracleSql(Seq("join", "hash", "window")),
    "q84_gopher" ->
      s"""WITH $tkCte,
         v AS (SELECT doc_id,
             CAST(len(t) AS BIGINT) AS word_count,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x)))
                    AS DOUBLE) / len(t) END AS mean_word_len,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t,
                    x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(t)
                  END AS alpha_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t,
                    x -> NOT regexp_matches(x, '[a-z0-9]'))) AS DOUBLE) / len(t)
                  END AS symbol_ratio,
             CAST(len(list_filter(t, x -> list_contains($stopListSql, x)))
               AS BIGINT) AS stop_hits
           FROM tk)
         SELECT doc_id, word_count, mean_word_len, alpha_ratio,
           symbol_ratio, stop_hits,
           (word_count BETWEEN 50 AND 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND alpha_ratio > 0.8 AND symbol_ratio < 0.1
             AND stop_hits >= 2) AS passes
         FROM v""",
    "q85_split" ->
      s"""SELECT doc_id, lang,
         CASE WHEN ${duckHash("'21'", "CAST(doc_id AS VARCHAR)")} % 100 < 90
                THEN 'train'
              WHEN ${duckHash("'21'", "CAST(doc_id AS VARCHAR)")} % 100 < 95
                THEN 'val'
              ELSE 'test' END AS split
         FROM documents""",
    "q82_lm_surprisal" ->
      s"""WITH $tkCte,
         ex AS (SELECT doc_id, lang, unnest(t) AS tok FROM tk),
         lm AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
             FROM ex GROUP BY 1, 2),
         tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_lang,
               CAST(count(*) AS BIGINT) AS v_lang
             FROM lm GROUP BY lang),
         bits AS (SELECT lm.lang, lm.tok,
               CAST(round(-log2(CAST(lm.c + 1 AS DOUBLE)
                 / CAST(tot.n_lang + tot.v_lang AS DOUBLE)) * 1e6)
                 AS BIGINT) AS microbits
             FROM lm JOIN tot USING (lang))
         SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(b.microbits) AS BIGINT) AS total_microbits,
           round(CAST(sum(b.microbits) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 1e6, 6) AS mean_bits
         FROM ex JOIN bits b ON b.lang = ex.lang AND b.tok = ex.tok
         GROUP BY ex.doc_id""",
    "q81_epoch_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
             ${duckHash("'11'", "CAST(doc_id AS VARCHAR)")} % 8 AS shard,
             ${duckHash("'12'", "CAST(doc_id AS VARCHAR)")} AS sort_key
           FROM documents)
         SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
             ORDER BY sort_key, doc_id) AS BIGINT) AS pos
         FROM h""",
    "q69_pack_chunks" ->
      s"""WITH $tkCte,
         p AS (SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS tok_count,
             doc_id % 8 AS shard FROM tk)
         SELECT doc_id, lang, tok_count, shard,
           CAST(floor((sum(tok_count) OVER (PARTITION BY lang, shard
             ORDER BY doc_id) - tok_count) / 512.0) AS BIGINT) AS chunk_id
         FROM p""",
    "q72_bigram_score" ->
      s"""WITH $tkCte,
         bg AS (SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(t) - 1),
               i -> concat(t[i], ' ', t[i + 1]))) AS bg
           FROM tk WHERE len(t) >= 2),
         bc AS (SELECT lang, bg, count(*) AS c FROM bg GROUP BY 1, 2)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(c) AS BIGINT) AS sum_freq,
           CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_freq
         FROM bg JOIN bc USING (lang, bg) GROUP BY doc_id""",
    "q73_contamination" ->
      s"""WITH $tkCte, ${shingleCte(3)},
         ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 5),
         ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         m AS (SELECT doc_id, count(*) AS nm FROM ex
               WHERE g IN (SELECT g FROM ev) GROUP BY doc_id)
         SELECT sh.doc_id, CAST(len(s) AS BIGINT) AS n_shingles,
           CAST(coalesce(m.nm, 0) AS BIGINT) AS n_matched,
           CAST(coalesce(m.nm, 0) AS DOUBLE) / CAST(len(s) AS DOUBLE)
             AS contamination
         FROM sh LEFT JOIN m ON sh.doc_id = m.doc_id""",
    "q74_heavy_hitters" ->
      s"""WITH $tkCte,
         tc AS (SELECT lang, unnest(t) AS token FROM tk),
         cnt AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
                 FROM tc GROUP BY 1, 2),
         r AS (SELECT lang, token, cnt,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY cnt DESC, token ASC) AS BIGINT) AS rnk
               FROM cnt)
         SELECT lang, token, cnt, rnk FROM r WHERE rnk <= 5""",
    "q37_text_stats" ->
      s"""WITH $tkCte
         SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS alpha_chars,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         FROM tk""",
    "q38_text_quality" ->
      s"""WITH $tkCte,
         m AS (SELECT doc_id, text, t,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(t) END AS stop_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) END AS mean_tok_len
           FROM tk)
         SELECT doc_id, stop_ratio, mean_tok_len,
           least(length(text) / 500.0, 1.0) * 0.4
           + least(stop_ratio * 5.0, 1.0) * 0.3
           + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
         FROM m""",
    "q39_lang_id" ->
      s"""WITH $tkCte,
         sc AS (SELECT lang,
             len(list_filter(t, x -> list_contains(['the','and','of','is','a'], x))) AS s_en,
             len(list_filter(t, x -> list_contains(['der','die','das','und','ist'], x))) AS s_de,
             len(list_filter(t, x -> list_contains(['le','la','et','est','les'], x))) AS s_fr,
             len(list_filter(t, x -> list_contains(['el','los','las','es','y'], x))) AS s_es
           FROM tk)
         SELECT lang,
           CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
                ELSE 'und' END AS lang_guess,
           CAST(count(*) AS BIGINT) AS n
         FROM sc GROUP BY 1, 2""",
    "q40_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1""",
    "q41_minhash_signature" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte
         SELECT doc_id,
           CAST(concat('0x', mh[1]) AS BIGINT) AS m0,
           CAST(concat('0x', mh[2]) AS BIGINT) AS m1,
           CAST(concat('0x', mh[3]) AS BIGINT) AS m2,
           CAST(concat('0x', mh[4]) AS BIGINT) AS m3
         FROM sig""",
    "q42_lsh_near_dup" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END AS jac
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, jac FROM pairs WHERE jac >= 0.5""",
    "q133_token_entropy" ->
      s"""WITH $tkCte,
         ex AS (SELECT doc_id, unnest(t) AS tok FROM tk),
         cnt AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
         g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
               * 1000000000.0) AS BIGINT)) AS BIGINT) AS clnc_grid
           FROM cnt GROUP BY 1)
         SELECT doc_id, n,
           round(ln(CAST(n AS DOUBLE))
             - (CAST(clnc_grid AS DOUBLE) / 1000000000.0)
               / CAST(n AS DOUBLE), 6) AS entropy
         FROM g""",
    "q132_source_overlap" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5)
         SELECT least(da.source, db.source) AS source_x,
           greatest(da.source, db.source) AS source_y,
           CAST(count(*) AS BIGINT) AS n_dup_pairs
         FROM pairs
         JOIN documents da ON pairs.doc_a = da.doc_id
         JOIN documents db ON pairs.doc_b = db.doc_id
         GROUP BY 1, 2""",
    "q215_char_ngram_compressibility" ->
      """WITH g AS (SELECT doc_id, length(lower(text)) AS n_chars,
             CASE WHEN length(lower(text)) >= 4
               THEN list_transform(
                 generate_series(1, length(lower(text)) - 3),
                 i -> substr(lower(text), i, 4))
               ELSE [] END AS grams
           FROM documents),
         a AS (SELECT doc_id, n_chars, len(grams) AS n_grams,
             len(list_distinct(grams)) AS n_distinct
           FROM g WHERE len(grams) > 0)
         SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n_distinct AS DOUBLE) / n_grams AS distinct_ratio
         FROM a""",
    "q216_cross_source_pairs" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sp AS (SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
           FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
                        JOIN documents db ON db.doc_id = p.doc_b)
         SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         FROM sp GROUP BY 1, 2""",
    "q214_dedup_threshold_sweep" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id),
         j AS (SELECT (CASE
               WHEN len(list_distinct(list_concat(sa.s, sb.s))) = 0 THEN 0.0
               ELSE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(sa.s, sb.s))) END) AS jac
           FROM pairs p JOIN sig sa ON sa.doc_id = p.doc_a
                        JOIN sig sb ON sb.doc_id = p.doc_b),
         th AS (SELECT CAST(unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
             AS DOUBLE) AS threshold),
         ag AS (SELECT threshold, count(*) AS n_candidates,
             sum(CASE WHEN jac >= threshold THEN 1 ELSE 0 END) AS n_kept
           FROM j, th GROUP BY threshold)
         SELECT threshold, CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_kept AS BIGINT) AS n_kept
         FROM ag""",
    "q211_corpus_card" ->
      s"""WITH $tkCte,
         sc AS (SELECT doc_id, source, lang,
             len(list_filter(t, x -> list_contains(['the','and','of','is','a'], x))) AS s_en,
             len(list_filter(t, x -> list_contains(['der','die','das','und','ist'], x))) AS s_de,
             len(list_filter(t, x -> list_contains(['le','la','et','est','les'], x))) AS s_fr,
             len(list_filter(t, x -> list_contains(['el','los','las','es','y'], x))) AS s_es
           FROM tk),
         g AS (SELECT doc_id, source, lang,
             CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
                  ELSE 'und' END AS guess
           FROM sc),
         ag AS (SELECT d.source, count(*) AS n_docs,
             sum(d.n_chars) AS total_chars,
             count(DISTINCT d.lang) AS n_langs,
             sum(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS n_en,
             sum(CASE WHEN g.guess = d.lang THEN 1 ELSE 0 END)
               AS n_lang_match
           FROM documents d JOIN g ON g.doc_id = d.doc_id GROUP BY 1)
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(total_chars AS DOUBLE) / n_docs AS mean_chars,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(n_en AS DOUBLE) / n_docs AS pct_en,
           CAST(n_lang_match AS DOUBLE) / n_docs AS langid_match_rate
         FROM ag""",
    "q204_sketch_calibration" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id),
         est AS (SELECT p.doc_a, p.doc_b,
             len(list_filter(range(8), i -> sa.mh[i+1] = sb.mh[i+1])) AS est8,
             CAST(floor((CASE
                 WHEN len(list_distinct(list_concat(sa.s, sb.s))) = 0 THEN 0.0
                 ELSE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                      / len(list_distinct(list_concat(sa.s, sb.s))) END)
               * 1e9) AS BIGINT) AS jg
           FROM pairs p JOIN sig sa ON sa.doc_id = p.doc_a
                        JOIN sig sb ON sb.doc_id = p.doc_b)
         SELECT CAST(est8 AS BIGINT) AS est8,
           CAST(est8 AS DOUBLE) / 8.0 AS est_jaccard,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(jg) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE)
             AS mean_exact_jaccard
         FROM est GROUP BY est8""",
    "q219_cluster_size_distribution" ->
      s"""WITH RECURSIVE $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         ),
         cl AS (SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node),
         cs AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
         SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
         FROM cs GROUP BY 1""",
    "q200_dedup_rate_by_source" ->
      s"""WITH RECURSIVE $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         ),
         cl AS (SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cl.cluster_id IS NOT NULL
                          AND cl.cluster_id <> d.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(sum(CASE WHEN cl.cluster_id IS NOT NULL
                          AND cl.cluster_id <> d.doc_id
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_rate
         FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
         GROUP BY 1""",
    "q67_dedup_clusters" ->
      s"""WITH RECURSIVE $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         )
         SELECT node AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY node""",
    // q130's chain up to the quality-grid join, reduced per cluster
    "q301_cluster_quality_spread" ->
      s"""WITH RECURSIVE $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
         cnodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM cnodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         ),
         cl AS (SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node),
         m AS (SELECT doc_id, text, t,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(t) END AS stop_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) END AS mean_tok_len
           FROM tk),
         qy AS (SELECT doc_id,
             least(length(text) / 500.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.3
             + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
           FROM m),
         j AS (SELECT cl.cluster_id AS cid, cl.node,
             CAST(floor(qy.quality * 1000000000.0) AS BIGINT) AS qg
           FROM cl JOIN qy ON cl.node = qy.doc_id)
         SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(qg) AS BIGINT) AS q_min_grid,
           CAST(max(qg) AS BIGINT) AS q_max_grid,
           CAST(max(qg) - min(qg) AS BIGINT) AS spread_grid
         FROM j GROUP BY cid""",
    "q130_keep_best" ->
      s"""WITH RECURSIVE $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
         cnodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM cnodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         ),
         cl AS (SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node),
         m AS (SELECT doc_id, text, t,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(t) END AS stop_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) END AS mean_tok_len
           FROM tk),
         qy AS (SELECT doc_id,
             least(length(text) / 500.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.3
             + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
           FROM m),
         j AS (SELECT cl.cluster_id AS cid, cl.node,
             CAST(floor(qy.quality * 1000000000.0) AS BIGINT) AS qg
           FROM cl JOIN qy ON cl.node = qy.doc_id),
         r AS (SELECT cid, node, qg,
             row_number() OVER (PARTITION BY cid ORDER BY qg DESC, node ASC) AS rn,
             count(*) OVER (PARTITION BY cid) AS nm,
             max(qg) OVER (PARTITION BY cid) AS bq
           FROM j)
         SELECT cid, node AS kept_doc, CAST(nm AS BIGINT) AS n_members,
           CAST(bq AS BIGINT) AS best_q_grid
         FROM r WHERE rn = 1""",
    "q43_ngram_jaccard" ->
      s"""WITH $tkCte, ${shingleCte(3)},
         d AS (SELECT sh.doc_id, tk.source, sh.s FROM sh JOIN tk ON sh.doc_id = tk.doc_id
               WHERE len(sh.s) > 0)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))) END AS jac
         FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         WHERE CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))) END >= 0.1""",
    "q140_prefix_jaccard" ->
      s"""WITH $tkCte, ${shingleCte(3)},
         d AS (SELECT sh.doc_id, tk.source, sh.s FROM sh JOIN tk ON sh.doc_id = tk.doc_id
               WHERE len(sh.s) > 0)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))) END AS jac
         FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         WHERE CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))) END >= 0.1""",
    "q75_containment" ->
      s"""WITH $tkCte, ${shingleCte(3)},
         d AS (SELECT sh.doc_id, tk.source, sh.s FROM sh JOIN tk ON sh.doc_id = tk.doc_id
               WHERE len(sh.s) > 0)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / CAST(least(len(a.s), len(b.s)) AS DOUBLE) AS containment
         FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / CAST(least(len(a.s), len(b.s)) AS DOUBLE) >= 0.2""",
    "q76_substring_dedup" ->
      s"""WITH $tkCte,
         gr AS (SELECT doc_id,
             unnest(generate_series(1, len(t) - 4)) AS pos,
             unnest(list_transform(generate_series(1, len(t) - 4),
               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]))) AS gram
           FROM tk WHERE len(t) >= 5),
         cd AS (SELECT gram FROM gr GROUP BY gram
                HAVING min(doc_id) <> max(doc_id)),
         dp AS (SELECT doc_id, pos FROM gr
                WHERE gram IN (SELECT gram FROM cd)),
         sp AS (SELECT doc_id, grp, count(*) AS run FROM
                  (SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                   FROM dp)
                GROUP BY doc_id, grp),
         pd AS (SELECT doc_id, sum(run) AS n_dup_grams, count(*) AS n_spans,
                  max(run) + 4 AS longest_span
                FROM sp GROUP BY doc_id)
         SELECT d.doc_id, CAST(coalesce(pd.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(pd.longest_span, 0) AS BIGINT) AS longest_span
         FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""",
    "q44_simhash" ->
      s"""WITH $tkCte,
         hh AS (SELECT doc_id, list_transform(t, x -> ${duckHash("'0'", "x")}) AS h FROM tk)
         SELECT doc_id, CAST($simhashTerms AS BIGINT) AS sh16 FROM hh""",
    "q58_curation_pipeline" ->
      s"""WITH RECURSIVE $tkCte,
         m AS (SELECT doc_id, lang, text, t,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(t) END AS stop_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) END AS mean_tok_len
           FROM tk),
         qy AS (SELECT doc_id, lang, t,
             least(length(text) / 500.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.3
             + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
           FROM m),
         kept AS (SELECT * FROM qy WHERE quality >= 0.4),
         sh AS (SELECT doc_id, list_distinct(list_transform(
             generate_series(1, len(t) - 2),
             j -> concat(t[j + 0], ' ', t[j + 1], ' ', t[j + 2]))) AS s
           FROM kept WHERE len(t) >= 3),
         $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END AS jac
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE jac >= 0.5
                 UNION ALL SELECT doc_b, doc_a FROM pairs WHERE jac >= 0.5),
         cnodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM cnodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         ),
         cl AS (SELECT node, min(anc) AS cluster_id FROM reach GROUP BY node),
         drp AS (SELECT node AS doc_id FROM cl WHERE cluster_id <> node)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(floor(quality * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 / CAST(count(*) AS DOUBLE) AS avg_quality
         FROM kept LEFT JOIN drp ON kept.doc_id = drp.doc_id
         WHERE drp.doc_id IS NULL
         GROUP BY lang""",
    "q57_simhash_near_dup" ->
      s"""WITH $tkCte,
         hh AS (SELECT doc_id, list_transform(t, x ->
             CAST(concat('0x', substr(md5(concat('0', '|', x)), 1, 16)) AS UBIGINT)) AS h
           FROM tk),
         sh AS (SELECT doc_id, $simhashTerms64 AS sh64 FROM hh),
         band AS (SELECT doc_id, sh64, band, (sh64 >> (band * 16)) & 65535 AS bandval
             FROM sh, (SELECT unnest(generate_series(0, 3)) AS band) t2),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sh64 AS sa, b.sh64 AS sb
             FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
               AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 3""",
    "q56_rolling_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS rh
         FROM documents""",
    "q63_pii_redaction" ->
      s"""SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
           '${TF.piiEmail}', '<EMAIL>', 'g'),
           '${TF.piiPhone}', '<PHONE>', 'g'),
           '${TF.piiLongDigits}', '<ID>', 'g') AS red_text,
         CAST(len(regexp_extract_all(text, '${TF.piiEmail}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(text, '${TF.piiPhone}')) AS BIGINT) AS n_phone,
         CAST(len(regexp_extract_all(text, '${TF.piiLongDigits}')) AS BIGINT) AS n_id
         FROM documents""",
    "q65_repetition_score" ->
      s"""WITH $tkCte
         SELECT doc_id,
           CASE WHEN len(t) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) END AS rep1,
           CASE WHEN len(t) - 2 <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(list_transform(
                    generate_series(1, len(t) - 2),
                    j -> concat(t[j], ' ', t[j+1], ' ', t[j+2])))) AS DOUBLE)
                  / (len(t) - 2) END AS rep3
         FROM tk""",
    "q64_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         WHERE (${duckHash("'7'", "CAST(doc_id AS VARCHAR)")} % 1000000) <
           CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
                     WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1
                     ELSE 0.0 END * 1000000""",
    "q61_tfidf" ->
      s"""WITH $tkCte,
         ex AS (SELECT doc_id, unnest(t) AS tok FROM tk),
         tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM ex GROUP BY 1, 2),
         dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
         scored AS (SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(nd.n / dfr.df), 6) AS tfidf
           FROM tf JOIN dfr ON tf.tok = dfr.tok, nd),
         r AS (SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, tok ASC) AS rn
           FROM scored)
         SELECT doc_id, tok AS top_term, tfidf FROM r WHERE rn = 1""",
    // md5(VARCHAR) hashes the UTF-8 bytes = Spark's md5(CAST(text AS BINARY))
    "q54_binary_columns" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
         md5(text) AS payload_md5 FROM documents""",
    // arithmetic twin of the Spark side's PNG encode→decode round trip:
    // the fill formula evaluated over an unnested x,y grid (w ≤ 16,
    // h ≤ 14, so the constant 16×14 grid cross join filtered per-doc is
    // exact and tiny)
    // deletion-neighborhood twin: DuckDB 1-based inclusive list slices
    // toks[:i-1] || toks[i+1:] delete token i; UNION folds the self key in
    "q146_symspell_join" ->
      """WITH names AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n
           FROM part GROUP BY 1),
         t AS (SELECT p_name, n, string_split(p_name, ' ') AS toks FROM names),
         v AS (
           SELECT p_name, n, p_name AS variant FROM t
           UNION
           SELECT p_name, n,
             array_to_string(toks[:g.i-1] || toks[g.i+1:], ' ') AS variant
           FROM t, (SELECT unnest(range(1, 11)) AS i) g
           WHERE g.i <= len(toks)),
         pairs AS (
           SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
             a.n AS n_a, b.n AS n_b
           FROM v a JOIN v b
             ON a.variant = b.variant AND a.p_name < b.p_name)
         SELECT name_a, name_b, n_a, n_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
         FROM pairs""",
    // arithmetic twin of the WAV encode→decode round trip (q144 pattern)
    "q150_audio_decode" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 97 AS n,
             8000 + 100 * (doc_id % 5) AS rate
           FROM documents WHERE doc_id % 10 = 0),
         idx AS (SELECT unnest(range(160)) AS i),
         smp AS (SELECT d.doc_id, d.n, d.rate,
             ((31 * d.doc_id + 7 * idx.i) % 4096) - 2048 AS v
           FROM d, idx WHERE idx.i < d.n)
         SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS channels, CAST(n AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS amp_sum,
           CAST(sum(v) AS DOUBLE) / n AS amp_mean
         FROM smp GROUP BY doc_id, n, rate""",
    "q144_image_decode" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           FROM documents WHERE doc_id % 10 = 0),
         xs AS (SELECT unnest(range(16)) AS x),
         ys AS (SELECT unnest(range(14)) AS y),
         px AS (SELECT d.doc_id, d.w, d.h,
             (31 * d.doc_id + 7 * xs.x + 13 * ys.y) % 256 AS v
           FROM d, xs, ys WHERE xs.x < d.w AND ys.y < d.h)
         SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS channels,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(sum(v) AS DOUBLE) / (w * h) AS px_mean
         FROM px GROUP BY doc_id, w, h""",
    "q222_jaccard_sql_screen" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> '')) AS toks
           FROM documents
           WHERE len(list_distinct(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> ''))) > 0),
         pairs AS (
           SELECT a.doc_id AS probe_id, b.doc_id AS doc_id,
             CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
               (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
               AS jac
           FROM t a JOIN t b
             ON a.lang = b.lang AND a.doc_id < 20 AND b.doc_id > a.doc_id)
         SELECT probe_id, doc_id,
           CAST(floor(jac * 1e9) AS BIGINT) AS jac_g
         FROM pairs WHERE jac >= CAST(0.2 AS DOUBLE)""",
    "q229_langid_eval" ->
      s"""WITH $tkCte,
         sc AS (SELECT lang,
             len(list_filter(t, x -> list_contains(['the','and','of','is','a'], x))) AS s_en,
             len(list_filter(t, x -> list_contains(['der','die','das','und','ist'], x))) AS s_de,
             len(list_filter(t, x -> list_contains(['le','la','et','est','les'], x))) AS s_fr,
             len(list_filter(t, x -> list_contains(['el','los','las','es','y'], x))) AS s_es
           FROM tk),
         g AS (SELECT lang,
           CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
                ELSE 'und' END AS guess
           FROM sc),
         conf AS (SELECT lang, guess, count(*) AS c FROM g GROUP BY 1, 2),
         sup AS (SELECT lang, sum(c) AS support FROM conf GROUP BY 1),
         pred AS (SELECT guess, sum(c) AS predicted FROM conf GROUP BY 1),
         corr AS (SELECT lang, c AS correct FROM conf WHERE lang = guess),
         m0 AS (SELECT COALESCE(s.lang, p.guess) AS lang,
             CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
             CAST(COALESCE(p.predicted, 0) AS BIGINT) AS predicted
           FROM sup s FULL OUTER JOIN pred p ON s.lang = p.guess),
         m AS (SELECT m0.lang, m0.support, m0.predicted,
             CAST(COALESCE(c.correct, 0) AS BIGINT) AS correct
           FROM m0 LEFT JOIN corr c ON m0.lang = c.lang),
         pr AS (SELECT lang, support, predicted, correct,
             CASE WHEN predicted > 0
               THEN CAST(correct AS DOUBLE) / CAST(predicted AS DOUBLE)
               ELSE 0.0 END AS precision,
             CASE WHEN support > 0
               THEN CAST(correct AS DOUBLE) / CAST(support AS DOUBLE)
               ELSE 0.0 END AS recall
           FROM m)
         SELECT lang, support, predicted, correct, precision, recall,
           CASE WHEN precision + recall > 0
             THEN 2.0 * precision * recall / (precision + recall)
             ELSE 0.0 END AS f1
         FROM pr""",
    "q228_effective_corpus" ->
      s"""WITH RECURSIVE $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))) END) >= 0.5),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM sym),
         reach(node, anc) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT sym.dst, reach.anc FROM reach JOIN sym ON reach.node = sym.src
         ),
         cl AS (SELECT node AS doc_id, min(anc) AS cluster_id
           FROM reach GROUP BY node),
         j AS (SELECT d.source, d.n_chars,
             d.doc_id = COALESCE(cl.cluster_id, d.doc_id) AS kept
           FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_raw,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_kept,
           CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS DOUBLE)
             / CAST(sum(n_chars) AS DOUBLE) AS keep_ratio
         FROM j GROUP BY source""",
    "q224_incremental_neardup" ->
      s"""WITH $tkCte, ${shingleCte(3)}, $sigCte,
         band AS (SELECT doc_id, s, b,
             md5(array_to_string(list_transform(mh[b*2+1 : b*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
         pairs AS (SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id,
             CASE WHEN len(list_distinct(list_concat(n.s, r.s))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(n.s, r.s))) END AS jac
           FROM band n JOIN band r ON n.b = r.b AND n.bucket = r.bucket
             AND n.doc_id % 5 = 4 AND r.doc_id % 5 <> 4)
         SELECT new_id, ref_id, jac FROM pairs WHERE jac >= 0.5""",
    "q223_bpe_pair_census" ->
      """WITH vocab AS (
           SELECT w, CAST(count(*) AS BIGINT) AS weight FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
             FROM documents)
           GROUP BY w HAVING length(w) >= 2),
         pairs AS (
           SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, weight
           FROM vocab, unnest(range(1, length(w))) AS r(i))
         SELECT pair, CAST(sum(weight) AS BIGINT) AS n
         FROM pairs GROUP BY pair
         ORDER BY n DESC, pair LIMIT 20"""
  )
}
