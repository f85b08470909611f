package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-corpus build as ONE composable call — the workload
  * every individual operator in this package exists to serve:
  *
  *   quality gate → near-dup removal (keep the BEST-quality member of
  *   each cluster) → benchmark decontamination → mixture balancing →
  *   deterministic train/val/test split → sequence packing of the train
  *   split — plus a per-stage manifest for the survivorship report.
  *
  * Every stage is an already-oracle-verified operator (q38/q58/q130
  * quality+dedup, q73 contamination, q79 mixture, q85 split, q69
  * packing); this object contributes the composition, which stays fully
  * declarative end to end — Catalyst fuses the quality filter into the
  * scan, AQE decides the anti-join build sides, and nothing collects to
  * the driver.
  *
  * Scale posture: the corpus shuffles once for the LSH signature pass
  * and once per keyed aggregation; the eval-set n-grams and the mixture
  * rate table broadcast; every sampling decision is a deterministic pure
  * function of ids (reruns and stragglers cannot change membership).
  */
object TrainingDataPipeline {

  /** @param mixtureTargets per-source target proportions (empty = skip
    *                       the balancing stage)
    * @param contaminationMax drop docs whose eval-shingle overlap share
    *                         exceeds this (docs too short to shingle
    *                         cannot match and are kept)
    * @param chunkC chunk size (tokens) for the OPTIONAL chunk-granular
    *               stages; 0 disables both. Doc-level near-dup and
    *               shingle decontamination miss sub-document copies —
    *               a leaked eval passage inside an otherwise-novel doc
    *               (q268's finding), or a doc assembled mostly from
    *               chunks that already occur elsewhere (q232's) — so
    *               with chunkC > 0 the pipeline re-screens survivors at
    *               chunk granularity.
    * @param chunkNovelMin with chunkC > 0: drop docs whose
    *               first-occurrence (novel) token share is below this
    *               (0.0 keeps the stage off). Chunk-less docs (empty
    *               text) have no duplicated chunks and are kept.
    * @param evalChunkLeakMax with chunkC > 0 AND evalDocs passed to
    *               [[run]]: drop docs whose share of chunks appearing
    *               verbatim in the eval set exceeds this (0.0 = one
    *               leaked chunk drops the doc).
    */
  /** @param boilerC line size (tokens) for the OPTIONAL boilerplate
    *               strip that runs BEFORE everything else (the CCNet
    *               ordering — repeated headers otherwise glue
    *               unrelated docs into near-dup clusters and inflate
    *               every downstream dup/perplexity stat); 0 disables.
    *               Docs whose text empties out drop at this stage.
    */
  /** @param normalize when true, run [[Normalize.forDedup]] (mojibake
    *               repair → NFC → punctuation cleanup → whitespace
    *               collapse) over the text FIRST, so every downstream
    *               hash — shingles, chunk hashes, contamination
    *               n-grams — keys on the normalized bytes. Without it,
    *               NFD/NFC/mojibake spellings of equal content never
    *               collide in any dedup stage.
    */
  /** @param stripHtml when true, run [[Normalize.stripHtml]] over the
    *               text BEFORE normalization — the raw-crawl entry
    *               point (markup-wrapped copies of the same prose
    *               never collide in any dedup stage otherwise: the
    *               tags land inside the shingles). Docs that are pure
    *               markup strip to empty and fall to the quality gate.
    */
  /** @param urlCol when non-empty, URL-level dedup runs FIRST (the
    *               FineWeb ordering — a re-crawled spelling of one URL
    *               never pays for stripping, scoring, or any dedup
    *               signature): keep the min-doc_id doc per CANONICAL
    *               URL ([[Domains.canonicalUrl]]); unparseable URLs
    *               (canonical null) pass through to the content
    *               stages. "" disables.
    */
  /** @param tokenizerRounds when > 0, the pipeline ENDS IN TRAINING
    *               ARTIFACTS: a byte-level BPE tokenizer trains on the
    *               curated train split (q316's segment census, this
    *               many merge rounds), the trained tokenizer encodes
    *               that split under the GPT-2 vocab.json id formula
    *               (special-token-faithful — a doc mentioning the
    *               literal <|endoftext|> gets the special id), and the
    *               id streams pack into loader-complete blocks
    *               (EOS separators + attention-reset boundaries,
    *               [[Packing.packTokenBlocksLoader]]). 0 disables.
    * @param blockTokens loader block size for the terminal stage
    * @param artifactDir when non-empty (and tokenizerRounds > 0), the
    *               trained tokenizer also SHIPS as the standard
    *               artifacts — `merges.txt` + `vocab.json` — under
    *               this directory ([[Bpe.rulesToFile]] /
    *               [[Bpe.vocabToFile]]), reloadable by any
    *               GPT-2/HF-lineage loader (and by [[Bpe.rulesFromFile]]
    *               / [[Bpe.vocabFromFile]] — the integration spec
    *               proves write→reload→re-encode identity).
    */
  /** @param tokenizerFamily which of the three tokenizer families the
    *               terminal stage trains and ships (tokenizerRounds >
    *               0 only): "bpe" (byte-level merges; artifacts
    *               merges.txt + vocab.json, EOS `<|endoftext|>`),
    *               "wordpiece" (published-score merges over the
    *               lowercase word census; artifact the BERT-shape
    *               vocab.txt with `[UNK]`/`[SEP]` leading, separator
    *               `[SEP]`), or "unigram" (hard-EM over the segment
    *               census, EM rounds capped at the family's 8;
    *               artifact the spm-shape piece/score dump with
    *               `</s>` leading, separator `</s>`). Every family
    *               ships a line-order = id-order artifact that the
    *               integration spec reloads and re-encodes to
    *               identical loader blocks.
    */
  final case class Config(
      urlCol: String = "",
      normalize: Boolean = false,
      stripHtml: Boolean = false,
      minQuality: Double = 0.4,
      jaccardThreshold: Double = 0.5,
      contamN: Int = 3,
      contaminationMax: Double = 0.2,
      mixtureTargets: Map[String, Double] = Map.empty,
      tokenBudget: Int = 512,
      shards: Int = 4,
      chunkC: Int = 0,
      chunkNovelMin: Double = 0.0,
      evalChunkLeakMax: Double = 0.0,
      boilerC: Int = 0,
      boilerMinDf: Int = 2,
      boilerPct: Int = 5,
      tokenizerRounds: Int = 0,
      blockTokens: Int = 64,
      artifactDir: String = "",
      tokenizerFamily: String = "bpe")

  /** The trained-tokenizer handoff: the merge rules in rank order
    * (empty for unigram — it learns scores, not merges), the
    * line-order id map of the shipped artifact, the separator id the
    * loader blocks use, plus the family-specific apply state — the
    * WordPiece piece set, the unigram Viterbi score map.
    */
  final case class Tokenizer(rules: Seq[(String, String)],
                             vocab: Map[String, Long], eosId: Long,
                             family: String = "bpe",
                             pieces: Set[String] = Set.empty,
                             scores: Map[String, Long] = Map.empty)

  /** @param corpus  surviving docs with `quality` and `split` columns
    * @param packed  (doc_id, lang, shard, tok_count, chunk_id) of the
    *                train split
    * @param manifest (stage, n_docs) survivorship ledger, stage-ordered
    * @param blocks  loader-complete (shard, block_id, …, boundaries)
    *                blocks of the encoded train split (tokenizerRounds
    *                > 0 only)
    * @param tokenizer the trained tokenizer (tokenizerRounds > 0 only)
    */
  final case class Result(corpus: DataFrame, packed: DataFrame,
                          manifest: DataFrame,
                          blocks: Option[DataFrame] = None,
                          tokenizer: Option[Tokenizer] = None)

  val EosToken = "<|endoftext|>"
  val WpUnk = "[UNK]"
  val WpSep = "[SEP]"
  val UniEos = "</s>"
  /** Unigram-family fixed parameters: piece length for the substring
    * seed, and a generous census segment cap (the trainer's own
    * coverage set must span every char the encode will meet).
    */
  val UniMaxPiece = 8
  val UniMaxSeg = 64

  /** @param evalDocs eval/benchmark DOCUMENTS (doc_id, text) for the
    *                  chunk-level decontamination stage — distinct from
    *                  `evalNgrams` (the shingle table stage 3 uses)
    *                  because chunk screening needs the eval text
    *                  re-chunked with the corpus's own chunking. Stage
    *                  runs only when chunkC > 0 and this is non-empty.
    */
  def run(docs: DataFrame, evalNgrams: DataFrame, stopwords: Seq[String],
          cfg: Config = Config(),
          evalDocs: Option[DataFrame] = None): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 0b. OPTIONAL boilerplate strip, FIRST (CCNet order): replace
    // each doc's text with its boilerplate-stripped form so the
    // quality gate, dedup, and decontamination all see clean prose —
    // without this, two unrelated docs sharing a big header read as
    // near-dups and the cluster keeps only one of them.
    // 0a. OPTIONAL unicode normalization, before EVERYTHING that
    // hashes text: a narrow projection (no shuffle), so it fuses into
    // the first scan.
    // 0-pre. OPTIONAL crawl-grade HTML strip, before even the unicode
    // pass: markup must go before anything hashes or scores the text.
    // 0u. OPTIONAL URL-level dedup before EVERYTHING (the FineWeb
    // first pass): one narrow canonicalization + one hash agg + one
    // semi-join on ids — the cheapest stage goes first so duplicate
    // crawls never reach a single content pass.
    val urlDeduped =
      if (cfg.urlCol.isEmpty) docs
      else docs.withColumn("doc_id", col("doc_id").cast("long"))
        .join(Domains.urlDedupMark(docs, "doc_id", cfg.urlCol)
          .where(col("kept")).select(col("doc_id")),
          Seq("doc_id"), "left_semi")

    val texted =
      if (!cfg.stripHtml) urlDeduped
      else urlDeduped.withColumn("text", Normalize.stripHtml(col("text")))

    val normed =
      if (!cfg.normalize) texted
      else texted.withColumn("text", Normalize.forDedup(col("text")))

    val prepped =
      if (cfg.boilerC <= 0) normed
      else {
        val stripped = Boilerplate.strip(normed, "doc_id", "text", "source",
            cfg.boilerC, seed = 11, cfg.boilerMinDf, cfg.boilerPct)
          .where(col("kept_tokens") > 0L)
          .select(col("doc_id"), col("retained_text"))
        normed.withColumn("doc_id", col("doc_id").cast("long"))
          .join(stripped, "doc_id")
          .withColumn("text", col("retained_text"))
          .drop("retained_text")
      }

    // 1. quality gate — one token pass, fused into the scan
    val scored = prepped.withColumn("quality",
      TextFunctions.qualityScore(col("text"), stopwords))
    val kept = scored.where(col("quality") >= cfg.minQuality)
      .transform(graft.core.Caching.persist)

    // 2. near-dup clusters over the kept set; keep the best-quality
    // member per cluster (q130 policy: exact 1e-9 quality grid,
    // min(struct(-grid, id)) — deterministic under ties, no window)
    val clusters = Dedup.nearDuplicateClusters(kept, "doc_id", "text",
      shingleN = 3, k = 8, bands = 4, threshold = cfg.jaccardThreshold)
    val winners = clusters
      .join(kept.select(col("doc_id"),
        floor(col("quality") * lit(1e9)).cast("long").as("qg")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(min(struct(negate(col("qg")).as("nq"), col("doc_id").as("d"))).as("best"))
      .select(col("best.d").as("doc_id"))
    val dupDrop = clusters.select(col("doc_id"))
      .exceptAll(winners.select(col("doc_id")))
    // unhinted anti-join: the drop set is O(dup-fraction x corpus) — AQE
    // may broadcast it when small, a forced hint would OOM at 100 TB
    val deduped = kept.join(dupDrop, Seq("doc_id"), "left_anti")

    // 2b. OPTIONAL chunk-level dedup: drop docs that are mostly
    // assembled from chunks already seen elsewhere (novel-token share
    // below the floor) — whole-doc near-dup can't see these. Same
    // firstOccurrence contract as q232; shuffles carry only the 64-bit
    // chunk hash. Docs without chunks never enter the drop set.
    val chunkDeduped =
      if (cfg.chunkC <= 0 || cfg.chunkNovelMin <= 0.0) deduped
      else {
        val stale = ChunkDedup.firstOccurrence(
            ChunkDedup.chunkMembership(deduped, "doc_id", "text",
              cfg.chunkC, 7))
          .groupBy(col("doc_id"))
          .agg(sum(col("ctoks")).as("tt"),
            sum(when(col("kept"), col("ctoks")).otherwise(0L)).as("kt"))
          .where(col("kt").cast("double") / col("tt").cast("double")
            < cfg.chunkNovelMin)
          .select(col("doc_id"))
        deduped.join(stale, Seq("doc_id"), "left_anti")
      }

    // 3. decontamination: drop docs overlapping the benchmark above the
    // threshold; shingle-less (short) docs cannot match and stay
    val contaminated = Contamination
      .contaminationScore(chunkDeduped, evalNgrams, "doc_id", "text",
        cfg.contamN)
      .where(col("contamination") > cfg.contaminationMax)
      .select(col("doc_id"))
    val docClean = chunkDeduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 3b. OPTIONAL chunk-level decontamination: a leaked eval passage
    // inside an otherwise-novel doc dilutes below any whole-doc shingle
    // share, so survivors are re-screened chunk for chunk against the
    // re-chunked eval set (broadcast — benchmarks are small by nature).
    val clean = (cfg.chunkC > 0, evalDocs) match {
      case (true, Some(ed)) =>
        val evalH = ChunkDedup
          .chunkMembership(ed, "doc_id", "text", cfg.chunkC, 7)
          .select(col("chash")).distinct().withColumn("hit", lit(1L))
        val leaky = ChunkDedup
          .chunkMembership(docClean, "doc_id", "text", cfg.chunkC, 7)
          .join(broadcast(evalH), Seq("chash"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("nc"),
            sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("nl"))
          .where(col("nl") > 0L &&
            col("nl").cast("double") / col("nc").cast("double")
              > cfg.evalChunkLeakMax)
          .select(col("doc_id"))
        docClean.join(leaky, Seq("doc_id"), "left_anti")
      case _ => docClean
    }

    // 4. mixture balancing by source (deterministic hash membership)
    val balanced =
      if (cfg.mixtureTargets.isEmpty) clean
      else Mixture.balanceToTargets(clean, "doc_id", "source", cfg.mixtureTargets)

    // 5. deterministic split — a pure function of the id
    val corpus = balanced.withColumn("split",
      TextFunctions.splitAssign(col("doc_id")))

    // 6. pack the train split into token-budget chunks
    val trainSplit = corpus.where(col("split") === "train")
      .transform(graft.core.Caching.persist)
    val packed = Packing.packChunks(trainSplit, "doc_id", "text", "lang",
      cfg.tokenBudget, cfg.shards)

    // 7. OPTIONAL terminal stages: train the tokenizer on the curated
    // train split, ship the standard artifacts, encode that split
    // special-token-faithfully under the vocab.json id formula, and
    // pack the loader blocks — corpus-in → loader-artifact-out in one
    // call. The rule collect is bounded by tokenizerRounds (the q272
    // trainer charter); everything else is the proven q316/q319/q318
    // machinery.
    require(Seq("bpe", "wordpiece", "unigram")
      .contains(cfg.tokenizerFamily),
      s"unknown tokenizerFamily: '${cfg.tokenizerFamily}'")
    val (blocksOpt, tokOpt) =
      if (cfg.tokenizerRounds <= 0) (None, None)
      else {
        // materialize the curated split and CUT THE LINEAGE before the
        // iterative trainer (a production run writes the curated
        // corpus to storage here anyway): the trainer layers one
        // rewrite plan per round, and stacking those on the full
        // pipeline plan makes Catalyst's plan strings alone blow the
        // driver heap
        val tokBase = trainSplit.select(col("doc_id"), col("text"))
          .localCheckpoint()
        def mkDir(): Unit =
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(cfg.artifactDir))
        val (enc, tok) = cfg.tokenizerFamily match {
          case "bpe" =>
            // the fast driver-side trainer (rule-for-rule == the
            // oracle-gated distributed loop, FastTrainerSpec) — so
            // tokenizerRounds can be production-scale (30k+) here,
            // like the other two families
            val rules = Bpe.trainFastFromVocab(
              Bpe.segmentVocabBytes(tokBase, "text"),
              cfg.tokenizerRounds)
            val eosId = 256L + rules.size
            val vocab: Map[String, Long] =
              (0 until 256).map(b =>
                ByteLevel.byteToChar(b) -> b.toLong).toMap ++
                rules.zipWithIndex.map { case ((x, y), i) =>
                  (x + y) -> (256L + i)
                } + (EosToken -> eosId)
            if (cfg.artifactDir.nonEmpty) {
              mkDir()
              Bpe.rulesToFile(rules, s"${cfg.artifactDir}/merges.txt")
              Bpe.vocabToFile(vocab, s"${cfg.artifactDir}/vocab.json")
            }
            (Bpe.encodeIdsWith(tokBase, "doc_id", "text", rules,
              cfg.blockTokens, byteLevel = true, preTokenize = true,
              vocab = Some(vocab), specialTokens = Seq(EosToken)),
              Tokenizer(rules, vocab, eosId))
          case "wordpiece" =>
            // the fast driver-side trainer (census collected once) —
            // tokenizerRounds can be production-scale here
            val (rules5, pieces) = WordPiece.trainFastWithVocab(
              Bpe.charVocab(tokBase, "text"), cfg.tokenizerRounds)
            val rules = rules5.map(r => (r._2, r._3))
            // vocab.txt line order = id order: the BERT convention
            // leads with the specials, then the pieces in UTF-8 byte
            // order (the engine-portable sort — q332's contract)
            val ordered = Seq(WpUnk, WpSep) ++
              (pieces -- Set(WpUnk, WpSep)).toSeq
                .sorted(TextFunctions.utf8Ordering)
            val vocab = ordered.zipWithIndex
              .map { case (p, i) => p -> i.toLong }.toMap
            if (cfg.artifactDir.nonEmpty) {
              mkDir()
              WordPiece.vocabToFile(ordered,
                s"${cfg.artifactDir}/vocab.txt")
            }
            (WordPiece.encodeIds(tokBase, "doc_id", "text", pieces,
              vocab, cfg.blockTokens),
              Tokenizer(rules, vocab, vocab(WpSep),
                family = "wordpiece", pieces = pieces))
          case "unigram" =>
            // EM rounds are naturally few — the family caps at 8
            val rounds = math.min(math.max(cfg.tokenizerRounds, 1), 8)
            val voc = Unigram.train(tokBase, "text", UniMaxPiece,
                minCount = 2L, rounds, UniMaxSeg)
              .select(col("piece"), col("score"))
              .as[(String, Long)].collect().toSeq
              .sortBy(_._1)(TextFunctions.utf8Ordering)
            // spm dump line order = id order: the separator control
            // symbol leads (score 0 — never emitted by Viterbi: it is
            // not in the score map), then the pieces, sorted
            val model = (UniEos, 0L) +: voc
            val vocab = model.zipWithIndex
              .map { case ((p, _), i) => p -> i.toLong }.toMap
            if (cfg.artifactDir.nonEmpty) {
              mkDir()
              Unigram.modelToFile(model,
                s"${cfg.artifactDir}/unigram.vocab")
            }
            (Unigram.encodeIds(tokBase, "doc_id", "text", voc.toMap,
              UniMaxPiece, vocab, UniMaxSeg, cfg.blockTokens),
              Tokenizer(Nil, vocab, vocab(UniEos),
                family = "unigram", scores = voc.toMap))
        }
        val blocks = Packing.packTokenBlocksLoader(enc, "doc_id", "ids",
            cfg.blockTokens, cfg.shards, tok.eosId)
          .transform(graft.core.Caching.persist)
        (Some(blocks), Some(tok))
      }

    val chunkStage =
      if (cfg.chunkC > 0 && cfg.chunkNovelMin > 0.0)
        Seq(("2b_chunk_novel", chunkDeduped.count()))
      else Seq.empty
    val chunkDecon =
      if (cfg.chunkC > 0 && evalDocs.nonEmpty)
        Seq(("3b_chunk_decontaminated", clean.count()))
      else Seq.empty
    val boilerStage =
      if (cfg.boilerC > 0) Seq(("0b_boilerplate", prepped.count()))
      else Seq.empty
    val urlStage =
      if (cfg.urlCol.nonEmpty) Seq(("0u_url_dedup", urlDeduped.count()))
      else Seq.empty
    val manifest = (Seq(
      ("0_input", docs.count())) ++
      urlStage ++
      boilerStage ++
      Seq(("1_quality_gate", kept.count()),
      ("2_near_dup", deduped.count())) ++
      chunkStage ++
      Seq(("3_decontaminated", docClean.count())) ++
      chunkDecon ++
      Seq(("4_mixture", balanced.count()),
        ("5_train_packed", packed.count())) ++
      tokOpt.map(t => ("6_tokenizer_rules",
        if (t.family == "unigram") t.scores.size.toLong
        else t.rules.size.toLong)).toSeq ++
      blocksOpt.map(b => ("7_loader_blocks", b.count())).toSeq
    ).toDF("stage", "n_docs")

    Result(corpus, packed, manifest, blocksOpt, tokOpt)
  }
}
