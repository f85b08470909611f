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
}
