package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model surprisal scoring — the CCNet-style "perplexity
  * filter" shape: score each document by the mean information content of
  * its tokens under a per-language unigram LM built from the corpus
  * itself. Low bits/token ⇒ common, fluent text; high ⇒ rare-token noise,
  * gibberish, wrong-language contamination. (CCNet uses a KenLM 5-gram;
  * the unigram form keeps the identical pipeline shape — model build =
  * one bounded-key aggregation, scoring = one broadcast-or-shuffle join —
  * with no external model artifact.)
  *
  * p(t | lang) = (c(t) + 1) / (N_lang + V_lang)  (add-one smoothing),
  * surprisal(t) = −log2 p(t).
  *
  * Engine-portable determinism: per-token surprisal is quantized to
  * integer MICROBITS (round(x·1e6)) and summed as BIGINT, so the per-doc
  * total is exact and order-independent — no floating summation-order
  * drift between engines or cluster layouts; the only doubles are one
  * division and one log per DISTINCT (lang, token), then one final mean.
  *
  * Scale shape: the LM is a count aggregation on the bounded (lang,
  * token) vocabulary key (map-side combined); per-lang totals are a
  * |langs|-row broadcast; scoring joins the token stream to the LM on the
  * same bounded key. At 100 TB the LM table gets a frequency floor and
  * the join stays the classic bounded-key shuffle, exactly like bigram
  * scoring (`q72`).
  */
object LmScore {

  /** (doc_id, n_tok, total_microbits, mean_bits) per document with ≥ 1
    * token; `mean_bits` rounded to 6 decimals.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                       langCol: String): DataFrame = {
    // persisted: the exploded token stream feeds BOTH the LM build and
    // the scoring join — unpersisted, the optimizer collapses the
    // projection and re-derives the token array per output row (the
    // generator re-evaluation trap q72 documents and measures)
    val ex = docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .transform(graft.core.Caching.persist)
    val lm = ex.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = lm.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_lang"),
        count(lit(1)).as("v_lang"))
    val bits = lm.join(broadcast(totals), "lang")
      .select(col("lang"), col("tok"),
        round(negate(log2((col("c") + lit(1L)).cast("double")
            / (col("n_lang") + col("v_lang")).cast("double"))) * lit(1e6))
          .cast("long").as("microbits"))
    ex.join(bits, Seq("lang", "tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("microbits")).cast("long").as("total_microbits"))
      .select(col("doc_id"), col("n_tok"), col("total_microbits"),
        round(col("total_microbits").cast("double")
          / col("n_tok").cast("double") / lit(1e6), 6).as("mean_bits"))
  }

  /** CCNet head/middle/tail tercile partition per language over the
    * [[unigramSurprisal]] score (CCNet keeps the low-perplexity head,
    * samples the middle, drops the tail). Thresholds come from a BOUNDED
    * deci-bit histogram of the micro-bit grid (≤ ~300 rows per lang at
    * any corpus size): the only window is the cumulative count over that
    * bounded aggregate, and per-doc bucketing is a broadcast-threshold
    * compare — two corpus passes, zero corpus-scale sorts. Boundary math
    * is integer-exact (t = min deci-bit with cum·3 ≥ k·n; the whole
    * threshold bucket joins the lower tier), so membership is
    * bit-portable across engines and cluster layouts.
    *
    * Output: (lang, bucket, n_docs, tokens, sum_microbits, mean_bits).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String): DataFrame =
    bucketReport(unigramSurprisal(docs, idCol, textCol, langCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id"))

  /** The tercile-report half of [[perplexityBuckets]], over any
    * (lang, n_tok, total_microbits) per-doc score frame — shared with
    * the streaming assembly, which derives the same frame from its
    * counter table instead of a batch corpus pass.
    */
  def bucketReport(scored0: DataFrame): DataFrame = {
    val scored = scored0
      .select(col("lang"), col("n_tok"), col("total_microbits"),
        expr("(total_microbits * 10) div (n_tok * 1000000)")
          .as("decibits"))
      .transform(graft.core.Caching.persist)
    val hist = scored.groupBy(col("lang"), col("decibits"))
      .agg(count(lit(1)).as("h"))
    val nl = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val cum = hist.select(col("lang"), col("decibits"),
      sum(col("h")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("decibits"))).as("ch"))
    val th = cum.join(broadcast(nl), "lang")
      .groupBy(col("lang"))
      .agg(min(when(col("ch") * 3 >= col("n_lang"), col("decibits")))
          .as("t1"),
        min(when(col("ch") * 3 >= col("n_lang") * 2, col("decibits")))
          .as("t2"))
    scored.join(broadcast(th), "lang")
      .select(col("lang"),
        when(col("decibits") <= col("t1"), lit("head"))
          .when(col("decibits") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"),
        col("n_tok"), col("total_microbits"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("tokens"),
        sum(col("total_microbits")).cast("long").as("sum_microbits"))
      .select(col("lang"), col("bucket"), col("n_docs"), col("tokens"),
        col("sum_microbits"),
        round(col("sum_microbits").cast("double")
          / col("tokens").cast("double") / lit(1e6), 6).as("mean_bits"))
  }

  /** Perplexity-threshold calibration to a TOKEN budget: per language,
    * the loosest deci-bit surprisal cut whose kept docs (lowest
    * perplexity first) still fit `budgetNum/budgetDen` of the
    * language's token mass — the knob-tuning pass behind "keep the
    * best X% of tokens" recipes. Same bounded-histogram machinery as
    * [[perplexityBuckets]] (the cumulative scan runs over the ≤ ~300-
    * row deci-bit table, never the corpus) with integer-exact budget
    * math (ctok·den ≤ ntok·num). A first bucket already over budget
    * yields the honest empty cut (−1, zero kept), never an overshoot.
    */
  def budgetCalibration(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, budgetNum: Long = 6L,
                        budgetDen: Long = 10L): DataFrame = {
    val scored = unigramSurprisal(docs, idCol, textCol, langCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id")
      .select(col("lang"), col("n_tok"),
        expr("(total_microbits * 10) div (n_tok * 1000000)")
          .as("decibits"))
      .transform(graft.core.Caching.persist)
    val hist = scored.groupBy(col("lang"), col("decibits"))
      .agg(sum(col("n_tok")).cast("long").as("btok"),
        count(lit(1)).as("bdocs"))
    val tot = scored.groupBy(col("lang"))
      .agg(sum(col("n_tok")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("decibits"))
    val cum = hist.select(col("lang"), col("decibits"),
      sum(col("btok")).over(w).as("ctok"),
      sum(col("bdocs")).over(w).as("cdocs"))
    val cut = cum.join(broadcast(tot.select(col("lang"), col("n_tokens"))),
        "lang")
      .where(col("ctok") * lit(budgetDen) <= col("n_tokens") * lit(budgetNum))
      .groupBy(col("lang"))
      .agg(max(col("decibits")).as("cut"),
        max(col("ctok")).cast("long").as("kept_tokens"),
        max(col("cdocs")).cast("long").as("kept_docs"))
    tot.join(cut, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens * $budgetNum) div $budgetDen")
          .as("budget_tokens"),
        coalesce(col("cut"), lit(-1L)).as("cut_decibits"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (coalesce(col("kept_tokens"), lit(0L)).cast("double")
          / col("n_tokens").cast("double")).as("kept_share"))
  }

  /** Vocabulary frequency-floor sensitivity audit — PRICES the
    * documented 100 TB mitigation ("the LM table gets a frequency
    * floor") instead of asserting it: every doc is scored under the
    * full vocab AND the df ≥ `minDf` vocab (floored tokens take the
    * add-one unseen path, q278's OOV rule), and the per-language
    * report carries the exact microbit mass under each model, the
    * signed mean drift (raw IEEE division of exact longs — never
    * rounded), and how many docs change deci-bit bucket — whether
    * [[perplexityBuckets]]' terciles survive the floor. Both models
    * come from ONE token census; scoring is the bounded-vocab join
    * twice.
    */
  def vocabFloorAudit(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, minDf: Long = 2L): DataFrame = {
    val ex = docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .transform(graft.core.Caching.persist)
    val lm = ex.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .transform(graft.core.Caching.persist)
    def mbExpr(cc: org.apache.spark.sql.Column,
               n: org.apache.spark.sql.Column,
               v: org.apache.spark.sql.Column) =
      round(negate(log2(cc.cast("double")
        / (n + v).cast("double"))) * lit(1e6)).cast("long")
    val totFull = lm.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_full"),
        count(lit(1)).as("v_full"))
    val bitsFull = lm.join(broadcast(totFull), "lang")
      .select(col("lang"), col("tok"),
        mbExpr(col("c") + lit(1L), col("n_full"), col("v_full"))
          .as("mb_full"))
    val keptLm = lm.where(col("c") >= minDf)
    val totFl = keptLm.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_fl"),
        count(lit(1)).as("v_fl"))
    val bitsFl = keptLm.join(broadcast(totFl), "lang")
      .select(col("lang"), col("tok"),
        mbExpr(col("c") + lit(1L), col("n_fl"), col("v_fl")).as("mb_fl"))
    // left-join totFl so a language whose ENTIRE vocab falls under the
    // floor still appears (vocab_floored = 0) — the audit must stay
    // visible exactly where the floor bites hardest. Its degenerate
    // all-unseen cost: add-one uniform over the FULL vocab,
    // -log2(1/v_full) — the natural limit of the unseen path when the
    // floored model retains nothing.
    val unseen = totFull.join(totFl, Seq("lang"), "left_outer")
      .select(col("lang"),
        coalesce(mbExpr(lit(1L), col("n_fl"), col("v_fl")),
          mbExpr(lit(1L), lit(0L), col("v_full"))).as("mb_unseen"),
        coalesce(col("v_fl"), lit(0L)).as("v_fl"))
    val scored = ex.join(bitsFull, Seq("lang", "tok"))
      .join(bitsFl, Seq("lang", "tok"), "left_outer")
      .join(broadcast(unseen.select(col("lang"), col("mb_unseen"))),
        "lang")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("mb_full")).cast("long").as("tm_full"),
        sum(coalesce(col("mb_fl"), col("mb_unseen"))).cast("long")
          .as("tm_fl"))
    scored
      .select(col("lang"), col("n_tok"), col("tm_full"), col("tm_fl"),
        expr("(tm_full * 10) div (n_tok * 1000000)").as("db_full"),
        expr("(tm_fl * 10) div (n_tok * 1000000)").as("db_fl"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("tokens"),
        sum(col("tm_full")).cast("long").as("sum_mb_full"),
        sum(col("tm_fl")).cast("long").as("sum_mb_floored"),
        sum(when(col("db_full") =!= col("db_fl"), 1L).otherwise(0L))
          .cast("long").as("n_bucket_moved"))
      .join(broadcast(totFull.select(col("lang"),
        col("v_full").cast("long").as("vocab_full"))), "lang")
      .join(broadcast(unseen.select(col("lang"),
        col("v_fl").cast("long").as("vocab_floored"))), "lang")
      .select(col("lang"), col("n_docs"), col("tokens"),
        col("vocab_full"), col("vocab_floored"),
        col("sum_mb_full"), col("sum_mb_floored"),
        ((col("sum_mb_floored") - col("sum_mb_full")).cast("double")
          / col("tokens").cast("double") / lit(1e6))
          .as("mean_delta_bits"),
        col("n_bucket_moved"))
  }

  /** Interpolated bigram LM perplexity filter — one rung up the CCNet
    * ladder from [[unigramSurprisal]]: score each document's mean
    * bits/bigram under p(w|u) = λ·c(u,w)/c(u·) + (1−λ)·(c(w)+1)/(N+V),
    * the classic Jelinek–Mercer blend of the per-language bigram MLE
    * with the add-one unigram floor (λ = 3/4, exactly representable).
    * Emits the keep/cut verdict at `keepBits` mean bits/bigram — the
    * low-perplexity-head selection real curation recipes apply.
    *
    * Determinism contract (the q82 discipline): one −log2 per DISTINCT
    * (lang, u, w) key quantized to integer microbits, per-doc totals
    * are exact long sums, and the verdict compares ON THE GRID
    * (total ≤ thresholdMicrobits·n — integer × integer, no float
    * boundary), so kept/cut is bit-portable across engines and
    * cluster layouts.
    *
    * Scale shape: everything is keyed on the bounded (lang, bigram)
    * vocabulary — the LM build is two map-side-combined aggregations,
    * context totals reduce the bigram table, and scoring is the same
    * bounded-key join as unigram scoring. At 100 TB the bigram table
    * gets a frequency floor exactly like the unigram LM; nothing here
    * is corpus-quadratic.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, keepBits: Double = 12.0): DataFrame = {
    val lambdaNum = 3L // λ = lambdaNum / lambdaDen = 0.75
    val lambdaDen = 4L
    val toks = docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= 2)
      .transform(graft.core.Caching.persist)
    // (doc_id, lang, u, w) bigram stream — persisted for the same
    // generator-re-evaluation reason as unigram's token stream, and
    // EAGERLY (materialize): its two consumers (the bc aggregation and
    // the final scoring join) are submitted concurrently by AQE and
    // each re-ran the cold explode otherwise (r17 JobProfile on the KN
    // twin: two concurrent 1.9 s fills → one fill + cache reads).
    // (A per-(doc, bigram) count restructure was tried and reverted:
    // natural-text bigrams rarely repeat within a doc, so the extra
    // grouping was a full-volume shuffle with no reduction — q261
    // 1.55 → 2.45 s.)
    val big = toks
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(2), size(col("t"))), i =>
          struct(element_at(col("t"), i - lit(1)).as("u"),
            element_at(col("t"), i).as("w")))).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.u"), col("bg.w"))
      .transform(graft.core.Caching.materialize)
    val uni = toks
      .select(col("lang"), explode(col("t")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cu"))
      .transform(graft.core.Caching.persist)
    val utot = uni.groupBy(col("lang"))
      .agg(sum(col("cu")).cast("long").as("n_lang"),
        count(lit(1)).as("v_lang"))
    val bc = big.groupBy(col("lang"), col("u"), col("w"))
      .agg(count(lit(1)).as("cb"))
    val ctx = bc.groupBy(col("lang"), col("u"))
      .agg(sum(col("cb")).cast("long").as("cc"))
    // λ·MLE + (1−λ)·floor in one fixed operand order (both engines run
    // the identical IEEE op sequence on exact integer inputs), one
    // libm log2 per distinct key, rounded onto the microbit grid
    val pb = bc
      .join(ctx, Seq("lang", "u"))
      .join(uni.select(col("lang"), col("tok").as("w"), col("cu")),
        Seq("lang", "w"))
      .join(broadcast(utot), "lang")
      .select(col("lang"), col("u"), col("w"),
        round(negate(log2(
          lit(lambdaNum.toDouble / lambdaDen)
            * (col("cb").cast("double") / col("cc").cast("double"))
          + lit(1.0 - lambdaNum.toDouble / lambdaDen)
            * ((col("cu") + lit(1L)).cast("double")
              / (col("n_lang") + col("v_lang")).cast("double"))))
          * lit(1e6)).cast("long").as("microbits"))
    val thresholdMicrobits = Math.round(keepBits * 1e6)
    big.join(pb, Seq("lang", "u", "w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("microbits")).cast("long").as("total_microbits"))
      .select(col("doc_id"), col("n_bigrams"), col("total_microbits"),
        round(col("total_microbits").cast("double")
          / col("n_bigrams").cast("double") / lit(1e6), 6).as("mean_bits"),
        (col("total_microbits")
          <= lit(thresholdMicrobits) * col("n_bigrams")).as("kept"))
  }

  /** Interpolated Kneser–Ney bigram surprisal — THE standard n-gram
    * smoothing (what KenLM ships), one rung above [[bigramSurprisal]]'s
    * Jelinek–Mercer blend:
    *
    *   p(w|u) = (max(c(u,w) − D, 0) + D·N₁₊(u·)·p_cont(w)) / c(u·)
    *   p_cont(w) = N₁₊(·w) / N₁₊(··),  D = 3/4 (exactly representable)
    *
    * where N₁₊(u·) = distinct continuations of u, N₁₊(·w) = distinct
    * contexts preceding w, N₁₊(··) = distinct bigram types — the
    * "how many contexts has this word appeared in" signal that makes
    * KN the right smoother for curation scoring (a word frequent in
    * ONE boilerplate context scores unlikely everywhere else, where
    * add-one/JM would credit its raw frequency).
    *
    * Same determinism contract as [[bigramSurprisal]]: every model
    * quantity is an exact integer count; p is ONE fixed-operand-order
    * float expression per distinct (lang, u, w); −log2 is a single
    * positive libm output rounded to integer microbits; per-doc totals
    * are exact long sums; the keep verdict compares on the grid. Same
    * scale shape: all aggregations and the scoring join are keyed on
    * the bounded (lang, bigram) vocabulary.
    */
  def knBigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, keepBits: Double = 12.0)
      : DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= 2)
    // eager fills (materialize), not lazy persists: `big` is consumed
    // by the bc aggregation AND the final scoring join, `bc` by FOUR
    // census/scoring subtrees — AQE submits those consumers
    // concurrently and each re-ran the cold fill (r17 JobProfile: two
    // concurrent 1.9 s `big` fills; see bigramSurprisal for the
    // reverted per-(doc, bigram) count restructure)
    val big = toks
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(2), size(col("t"))), i =>
          struct(element_at(col("t"), i - lit(1)).as("u"),
            element_at(col("t"), i).as("w")))).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.u"), col("bg.w"))
      .transform(graft.core.Caching.materialize)
    val bc = big.groupBy(col("lang"), col("u"), col("w"))
      .agg(count(lit(1)).as("cb"))
      .transform(graft.core.Caching.materialize)
    val ctx = bc.groupBy(col("lang"), col("u"))
      .agg(sum(col("cb")).cast("long").as("cc"),
        count(lit(1)).as("nfu")) // N₁₊(u·): distinct continuations
    val cw = bc.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("npw")) // N₁₊(·w): distinct contexts
    val tot = bc.groupBy(col("lang"))
      .agg(count(lit(1)).as("nbb")) // N₁₊(··): distinct bigram types
    val pb = bc
      .join(ctx, Seq("lang", "u"))
      .join(cw, Seq("lang", "w"))
      .join(broadcast(tot), "lang")
      .select(col("lang"), col("u"), col("w"),
        round(negate(log2(
          (greatest(col("cb").cast("double") - lit(0.75), lit(0.0))
            + lit(0.75) * col("nfu").cast("double")
              * (col("npw").cast("double") / col("nbb").cast("double")))
          / col("cc").cast("double")))
          * lit(1e6)).cast("long").as("microbits"))
    val thresholdMicrobits = Math.round(keepBits * 1e6)
    big.join(pb, Seq("lang", "u", "w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("microbits")).cast("long").as("total_microbits"))
      .select(col("doc_id"), col("n_bigrams"), col("total_microbits"),
        round(col("total_microbits").cast("double")
          / col("n_bigrams").cast("double") / lit(1e6), 6).as("mean_bits"),
        (col("total_microbits")
          <= lit(thresholdMicrobits) * col("n_bigrams")).as("kept"))
  }
}
