package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming face of q261's interpolated bigram LM (the 22nd twin):
  * a continuously maintained per-language language model over an
  * unbounded document stream — the online form of the CCNet-style
  * perplexity filter, where the LM drifts as the corpus grows and
  * each snapshot scores exactly like the batch build over the prefix.
  *
  * Same decomposition as [[StreamingAuc]]: the STATEFUL half is
  * trivially mergeable — one long counter per distinct count event,
  * keyed by the event string (`u|lang|tok` for unigrams,
  * `b|lang|u w` for bigrams; context totals are Σ over the bigram
  * counters, so they carry no state of their own) — and the LM
  * assembly ([[assembleWeights]]) is a PURE function of the counter
  * table, running q261's exact math (λ = 3/4 Jelinek–Mercer blend,
  * one −log2 per distinct key, integer microbits). State is bounded
  * by the (lang, vocabulary) domain, never by stream length.
  *
  * Exactness contract (spec-verified): after any prefix of batches,
  * `assembleWeights` over the emitted counters equals the weight
  * table batch `LmScore.bigramSurprisal` derives from the same
  * prefix, key for key — counter merging is addition and the
  * assembly is deterministic, so scoring any document against the
  * snapshot matches the batch score bit for bit.
  */
object StreamingLm {

  /** Tag a document frame into count events: one `u|lang|tok` row per
    * token and one `b|lang|u w` row per adjacent pair, only for docs
    * with ≥ 2 tokens (q261's eligibility rule — the LM and the scored
    * stream see the same filter).
    */
  def countEvents(docs: DataFrame, textCol: String, langCol: String)
      : DataFrame = {
    val t = graft.llm.TextFunctions.tokens(col(textCol))
    val eligible = docs
      .select(col(langCol).as("lang"), t.as("t"))
      .where(size(col("t")) >= 2)
    val uni = eligible.select(
      explode(transform(col("t"), x =>
        concat(lit("u|"), col("lang"), lit("|"), x))).as("k"))
    val big = eligible.select(
      explode(transform(sequence(lit(2), size(col("t"))), i =>
        concat(lit("b|"), col("lang"), lit("|"),
          element_at(col("t"), i - lit(1)), lit(" "),
          element_at(col("t"), i)))).as("k"))
    uni.unionAll(big)
  }

  /** Keyed counter processor: per event key, one long of state; emits
    * the key's updated total whenever a batch touches it.
    */
  def counters(grouped: KeyValueGroupedDataset[String, String])(
      implicit stEnc: Encoder[Long],
      outEnc: Encoder[(String, Long)]): org.apache.spark.sql.Dataset[(String, Long)] = {
    val processor = new StatefulProcessor[String, String, (String, Long)] {
      @transient private var st: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[Long]("n", stEnc, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[String],
          timers: TimerValues): Iterator[(String, Long)] = {
        var n = if (st.exists()) st.get() else 0L
        rows.foreach(_ => n += 1)
        st.update(n)
        Iterator.single((key, n))
      }
    }
    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** q261's LM assembly over any (key, count) counter table — the
    * consumer-side half. Bounded by the vocabulary; exact microbit
    * output per (lang, u, w), identical to the batch weight table.
    *
    * The processor above emits one CUMULATIVE row per key per touching
    * batch (append mode), so a raw appended sink holds every historical
    * total, not just the latest. Counters are monotone, so the latest
    * total per key is exactly `max(n)` — deduped here internally, which
    * makes the function total over both a latest-row-per-key map AND
    * the raw appended table (feeding the latter used to silently
    * inflate cu/cb/n_lang/v_lang).
    */
  /** Kneser–Ney assembly over the SAME counter table (twin #25 —
    * q277's smoother): every KN quantity is a pure function of the
    * bigram counters alone — c(u,w) is the counter, c(u·)/N₁₊(u·)
    * reduce it by context, N₁₊(·w)/N₁₊(··) by continuation — so the
    * stateful half is [[counters]] verbatim and only this assembly
    * differs from the JM face. Emits the exact batch weight table
    * (`LmScore.knBigramSurprisal`'s pb): (lang, u, w, microbits).
    * Dedupes the raw appended table like [[assembleWeights]].
    */
  def assembleKnWeights(counts0: DataFrame): DataFrame = {
    val counts = counts0.groupBy(col("k")).agg(max(col("n")).as("n"))
    val bc = counts.where(col("k").startsWith("b|"))
      .select(split(col("k"), "\\|", 3).getItem(1).as("lang"),
        split(split(col("k"), "\\|", 3).getItem(2), " ", 2).getItem(0)
          .as("u"),
        split(split(col("k"), "\\|", 3).getItem(2), " ", 2).getItem(1)
          .as("w"),
        col("n").as("cb"))
    val ctx = bc.groupBy(col("lang"), col("u"))
      .agg(sum(col("cb")).cast("long").as("cc"),
        count(lit(1)).as("nfu"))
    val cw = bc.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("npw"))
    val tot = bc.groupBy(col("lang")).agg(count(lit(1)).as("nbb"))
    bc.join(ctx, Seq("lang", "u"))
      .join(cw, Seq("lang", "w"))
      .join(broadcast(tot), "lang")
      .select(col("lang"), col("u"), col("w"),
        round(negate(log2(
          (greatest(col("cb").cast("double") - lit(0.75), lit(0.0))
            + lit(0.75) * col("nfu").cast("double")
              * (col("npw").cast("double") / col("nbb").cast("double")))
          / col("cc").cast("double")))
          * lit(1e6)).cast("long").as("microbits"))
  }

  def assembleWeights(counts0: DataFrame): DataFrame = {
    val counts = counts0.groupBy(col("k")).agg(max(col("n")).as("n"))
    val uni = counts.where(col("k").startsWith("u|"))
      .select(split(col("k"), "\\|", 3).getItem(1).as("lang"),
        split(col("k"), "\\|", 3).getItem(2).as("tok"), col("n").as("cu"))
    val bc = counts.where(col("k").startsWith("b|"))
      .select(split(col("k"), "\\|", 3).getItem(1).as("lang"),
        split(split(col("k"), "\\|", 3).getItem(2), " ", 2).getItem(0)
          .as("u"),
        split(split(col("k"), "\\|", 3).getItem(2), " ", 2).getItem(1)
          .as("w"),
        col("n").as("cb"))
    val utot = uni.groupBy(col("lang"))
      .agg(sum(col("cu")).cast("long").as("n_lang"),
        count(lit(1)).as("v_lang"))
    val ctx = bc.groupBy(col("lang"), col("u"))
      .agg(sum(col("cb")).cast("long").as("cc"))
    bc.join(ctx, Seq("lang", "u"))
      .join(uni.select(col("lang"), col("tok").as("w"), col("cu")),
        Seq("lang", "w"))
      .join(broadcast(utot), "lang")
      .select(col("lang"), col("u"), col("w"),
        round(negate(log2(
          lit(0.75) * (col("cb").cast("double") / col("cc").cast("double"))
          + lit(0.25) * ((col("cu") + lit(1L)).cast("double")
            / (col("n_lang") + col("v_lang")).cast("double"))))
          * lit(1e6)).cast("long").as("microbits"))
  }

  /** Count events for q293's tercile report (twin #27): the unigram LM
    * counters (`u|lang|tok`) PLUS per-document token counters
    * (`d|docId|lang|tok`) — the extra coordinate the bucket report
    * needs, because a doc's score depends on the LM over the WHOLE
    * prefix, so it must be re-derivable at assembly time rather than
    * frozen at arrival. Eligibility is q82/q293's ≥ 1 token (not
    * q261's ≥ 2). State stays one long per distinct (doc, token) pair
    * — bounded by content (token occurrences collapse into counts),
    * never by stream length or arrival order.
    */
  def bucketEvents(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String): DataFrame = {
    val t = graft.llm.TextFunctions.tokens(col(textCol))
    val eligible = docs
      .select(col(idCol).cast("string").as("doc"),
        col(langCol).as("lang"), t.as("t"))
      .where(size(col("t")) >= 1)
    val uni = eligible.select(
      explode(transform(col("t"), x =>
        concat(lit("u|"), col("lang"), lit("|"), x))).as("k"))
    val dd = eligible.select(
      explode(transform(col("t"), x =>
        concat(lit("d|"), col("doc"), lit("|"), col("lang"), lit("|"), x)))
        .as("k"))
    uni.unionAll(dd)
  }

  /** q293's tercile-bucket report as a PURE function of the
    * [[bucketEvents]] counter table: rebuild the add-one unigram LM
    * from the `u|` counters (the exact `LmScore.unigramSurprisal`
    * expression), score each doc from its `d|` counters (Σ c·microbits
    * — identical to the batch per-occurrence sum), then run the shared
    * `LmScore.bucketReport` tercile math. Because counters are
    * monotone and the assembly is deterministic, every snapshot equals
    * the batch q293 over the delivered prefix — even when a doc's
    * tokens arrive before most of the LM mass that prices them.
    * Dedupes the raw appended table like [[assembleWeights]].
    */
  def assembleBuckets(counts0: DataFrame): DataFrame = {
    val counts = counts0.groupBy(col("k")).agg(max(col("n")).as("n"))
      .transform(graft.core.Caching.persist)
    val lm = counts.where(col("k").startsWith("u|"))
      .select(split(col("k"), "\\|", 3).getItem(1).as("lang"),
        split(col("k"), "\\|", 3).getItem(2).as("tok"), col("n").as("c"))
    val totals = lm.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_lang"),
        count(lit(1)).as("v_lang"))
    val bits = lm.join(broadcast(totals), "lang")
      .select(col("lang"), col("tok"),
        round(negate(log2((col("c") + lit(1L)).cast("double")
            / (col("n_lang") + col("v_lang")).cast("double"))) * lit(1e6))
          .cast("long").as("microbits"))
    val d = counts.where(col("k").startsWith("d|"))
      .select(split(col("k"), "\\|", 4).getItem(1).as("doc"),
        split(col("k"), "\\|", 4).getItem(2).as("lang"),
        split(col("k"), "\\|", 4).getItem(3).as("tok"),
        col("n").as("c"))
    val scored = d.join(bits, Seq("lang", "tok"))
      .groupBy(col("doc"), col("lang"))
      .agg(sum(col("c")).cast("long").as("n_tok"),
        sum(col("c") * col("microbits")).cast("long")
          .as("total_microbits"))
    graft.llm.LmScore.bucketReport(
      scored.select(col("lang"), col("n_tok"), col("total_microbits")))
  }
}
