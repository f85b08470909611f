package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json scope extension beyond the reference surface).
  *
  * Everything here is a pure `Column` expression — no UDFs, no
  * object-deserialization boundary — so scans stay columnar with pruning
  * and the operators run as a single narrow map stage with zero shuffles at
  * any scale. (Higher-order array functions evaluate as Tungsten
  * expressions outside whole-stage codegen; that costs far less than a
  * UDF's serialization round-trip.)
  *
  * The hash primitive is md5-derived (`portableHash`) so every operator has
  * an engine-independent definition — the DuckDB oracles recompute identical
  * values from the same bytes.
  */
object TextFunctions {

  /** Deterministic 32-bit hash from the first 8 hex chars of md5, seeded.
    * Engine-portable: DuckDB spells it
    * `CAST(concat('0x', substr(md5(concat(seed,'|',s)),1,8)) AS BIGINT)`.
    */
  def portableHash(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed|"), c)), 1, 8), 16, 10).cast("long")

  /** The Spark/DuckDB string sort order — UNSIGNED UTF-8 BYTE order —
    * for DRIVER-SIDE ordering decisions that must agree with an
    * `ORDER BY` on either engine (vocab id assignment, argmax tie
    * breaks, prune ranks). Java's `String.compareTo` is UTF-16
    * code-unit order, which disagrees for astral codepoints vs
    * U+E000..U+FFFF (surrogates sort below them) — a one-emoji piece
    * would silently shift every id after it. One comparator,
    * single-sourced.
    */
  val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
  }

  /** Whitespace normalization: lowercase, collapse runs, trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Non-empty lowercase tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy: count of alternating alpha/digit/punct runs —
    * a cheap upper bound on subword token count used for budget estimates.
    */
  def roughSubwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[a-z])(?=[^a-z])|(?<=[^a-z])(?=[a-z])|\\s+"),
      t => trim(t) =!= lit(""))).cast("long")

  /** Characters matching a class, e.g. "[a-z]" — the building block for
    * alpha/digit/punct ratios.
    */
  def charClassCount(text: Column, charClassRegex: String): Column =
    (length(text) - length(regexp_replace(text, charClassRegex, ""))).cast("long")

  /** Share of tokens found in `stopwords` (language-quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(stops, t)))
        .cast("double") / size(toks))
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: favors documents with a healthy
    * length, some stopwords (natural language), and mid-length tokens.
    * Deterministic arithmetic — oracle-reproducible.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * lit(5.0), lit(1.0))
    val tokScore = when(meanTokenLength(text).between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    // raw double, not rounded: identical IEEE arithmetic on both engines
    // beats reconciling HALF_UP vs HALF_EVEN rounding at a digit boundary
    lenScore * lit(0.4) + stopScore * lit(0.3) + tokScore * lit(0.3)
  }

  /** Marker-word language ID: score each language by marker hits over the
    * token array, pick the best with a fixed priority order (deterministic
    * tie-break). An n-gram-free heuristic that stays in codegen.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "las", "es", "y"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    val ms = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(ms, t))).cast("long")
  }

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declaration order) achieving the max, if any hit
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Document fingerprint for exact dedup: md5 over normalized text. */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Polynomial rolling-hash fingerprint (Rabin–Karp flavor):
    * h = fold(chars)(h*31 + code mod 1e9+7). Cheaper than md5 when only a
    * 63-bit fingerprint is needed; engine-portable (DuckDB list_reduce).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % lit(1000000007L))

  /** Within-document repetition: the fraction of n-gram OCCURRENCES that
    * are repeats of an earlier one (0 = all distinct, → 1 = the document
    * loops) — the standard corpus-quality signal for boilerplate and
    * generation loops. Pure Column arithmetic over the token array; pair
    * with `qualityScore` in curation gates.
    */
  def repetitionScore(text: Column, n: Int): Column = {
    // One-scan native shingling (ShinglesExpr) instead of the
    // slice/concat_ws HOF pyramid: the HOF form re-derives the token array
    // per n-gram and was the single most expensive expression in the whole
    // bench. ShinglesExpr returns the DISTINCT n-gram set directly; for
    // n=1 it degenerates to array_distinct(tokens) at the same cost.
    val total = greatest(size(tokens(text)) - lit(n - 1), lit(0))
    val distinctCnt = size(ShinglesExpr(text, n))
    when(total === 0, lit(0.0))
      .otherwise(lit(1.0) - distinctCnt.cast("double") / total.cast("double"))
  }

  /** Bigram OCCURRENCES (order-preserving, not distinct — frequency
    * analysis needs multiplicity, unlike shingling for dedup which wants
    * the set). Native one-scan path: the HOF formulation
    * (transform(sequence, i -> element_at(tokens(text), i) ...)) embeds
    * the full tokenizer in the lambda body and re-runs it PER ELEMENT —
    * O(tokens²) per document, measured 8 s vs 1 s at sf0.1.
    */
  def bigrams(text: Column): Column = ShinglesExpr.occurrences(text, 2)

  /** PII patterns, restricted to the RE2∩Java syntax subset (no
    * backreferences/lookaround) so the DuckDB oracle applies the literal
    * same regexes. Order matters: emails before bare digit runs.
    */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhone = "\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"
  val piiLongDigits = "[0-9]{9,16}"

  /** Redact common PII shapes (emails, phone numbers, long digit runs)
    * from free text — the standard pre-training scrub pass. Pure Column
    * regexp_replace chain: one codegen'd map stage, no shuffle, applies
    * identically at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmail, "<EMAIL>"),
        piiPhone, "<PHONE>"),
      piiLongDigits, "<ID>")

  /** Count of redactable spans per category (audit/reporting side of the
    * scrub pass).
    */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(piiEmail), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(piiPhone), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(piiLongDigits), lit(0))).cast("long"))

  /** Fraction of tokens containing at least one alphabetic character —
    * the Gopher "80 % of words must contain an alphabetic character" rule's
    * left-hand side (Rae et al. 2021, appendix A quality heuristics).
    */
  def alphaWordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.rlike("[a-z]")))
        .cast("double") / size(toks))
  }

  /** Fraction of tokens that are pure symbol runs (no alphanumerics) —
    * the symbol-to-word side of the Gopher rule family.
    */
  def symbolWordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => !t.rlike("[a-z0-9]")))
        .cast("double") / size(toks))
  }

  /** Gopher-style quality rule bundle (the published repetition-free
    * subset): per-document rule values plus the conjunction verdict.
    * Every term is integer-count arithmetic or a single double division —
    * engine-exact, so the oracle reproduces the booleans bit-for-bit.
    * One codegen'd map stage; applies unchanged at any corpus size.
    *
    * Returns (word_count, mean_word_len, alpha_ratio, symbol_ratio,
    * stop_hits, passes).
    */
  def gopherRules(text: Column, stopwords: Seq[String],
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaRatio: Double = 0.8, maxSymbolRatio: Double = 0.1,
                  minStopHits: Int = 2): (Column, Column, Column, Column, Column, Column) = {
    val toks = tokens(text)
    val wc = size(toks).cast("long")
    val meanLen = when(wc === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / wc)
    val alphaR = alphaWordRatio(text)
    val symR = symbolWordRatio(text)
    val stops = array(stopwords.map(lit): _*)
    val stopHits = size(filter(toks, t => array_contains(stops, t))).cast("long")
    val passes = wc.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      alphaR > lit(minAlphaRatio) && symR < lit(maxSymbolRatio) &&
      stopHits >= lit(minStopHits.toLong)
    (wc, meanLen, alphaR, symR, stopHits, passes)
  }

  /** Deterministic hash-based stratified sampling: keep a row iff
    * portableHash(idCol) mod 1e6 falls under its stratum's rate. Unlike
    * `df.sample`, membership is a pure function of the id — reproducible
    * across runs, engines and cluster layouts, joinable against other
    * samples, and it pushes down as an ordinary filter (no RNG state, no
    * per-partition seeds). Rates are per stratum value; absent strata
    * default to `defaultRate`.
    */
  def stratifiedKeep(id: Column, stratum: Column, rates: Map[String, Double],
                     defaultRate: Double = 0.0): Column = {
    val bucket = pmod(portableHash(id.cast("string"), seed = 7), lit(1000000L))
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === lit(k), lit(r)).otherwise(acc)
    }
    bucket < rateCol * lit(1000000L)
  }

  /** Deterministic train/val/test assignment: a pure function of the id
    * (hash bucket in [0,100)), so the split is reproducible across runs
    * and engines, survives re-partitioning, and new rows never move
    * existing rows between splits — the property RNG-based splitters
    * lack. Evaluates as a plain projection (no shuffle, no state).
    */
  def splitAssign(id: Column, trainPct: Int = 90, valPct: Int = 5,
                  seed: Int = 21): Column = {
    val bucket = pmod(portableHash(id.cast("string"), seed), lit(100L))
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }
}
