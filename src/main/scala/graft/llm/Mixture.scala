package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture balancing: downsample a corpus so stratum (language / domain /
  * source) proportions match a target mixture, keeping as much data as
  * possible without upsampling — the data-mixing step in front of
  * training-corpus assembly.
  *
  * The achievable total is T = min over target strata of count_s / p_s;
  * each stratum keeps rate r_s = (p_s * T) / count_s, so the binding
  * stratum keeps everything and the rest downsample to proportion.
  * Membership is decided by the same deterministic portable hash as
  * [[TextFunctions.stratifiedKeep]] — a pure function of the id, so the
  * sample is reproducible across runs, engines and cluster layouts, and
  * the keep predicate is an ordinary pushdown-friendly filter.
  *
  * Scale shape: one narrow count aggregation over the corpus (map-side
  * partials, |strata| output rows), the rate table derived from it is
  * broadcast back onto the corpus, and the corpus itself never shuffles.
  * Strata without a target weight drop (rate 0); target strata absent
  * from the corpus are ignored (nothing to keep there, and they cannot
  * bind T).
  *
  * Uses its own hash seed, distinct from [[TextFunctions.stratifiedKeep]]
  * (seed 7): composed samplers must make INDEPENDENT keep decisions — on
  * a stratifiedKeep survivor set the surviving buckets are uniform on the
  * kept prefix only, and reusing that seed would turn any mixture rate
  * above the upstream rate into "keep everything".
  */
object Mixture {

  /** Rows of `df` kept by the balanced sample (original columns). */
  def balanceToTargets(df: DataFrame, idCol: String, stratumCol: String,
                       targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "target weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.toDF("stratum", "p")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n"))
    val ratios = counts.join(broadcast(tgt), "stratum")
      .withColumn("ratio", col("n") / col("p"))
    val tTotal = ratios.agg(min(col("ratio")).as("t_total"))
    val rates = ratios.crossJoin(broadcast(tTotal))
      .select(col("stratum"),
        ((col("p") * col("t_total")) / col("n")).as("rate"))
    val bucket = pmod(
      TextFunctions.portableHash(df(idCol).cast("string"), seed = 13),
      lit(1000000L))
    df.join(broadcast(rates), df(stratumCol) === rates("stratum"))
      .where(bucket < col("rate") * lit(1000000L))
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }

  /** Exact water-filling budget allocation: give each row
    * min(available, r·target) with r chosen so allocations sum to the
    * budget — the classic algorithm, run entirely in decimal(38,0)
    * products + integral division so the result is a pure integer
    * function of the inputs on any engine (token counts × 1e6-grid
    * targets exceed a long at 100 TB).
    *
    * @param perSource (source, a, t): available units and integer-grid
    *                  target weight per row, a ≥ 1, t ≥ 1
    * @param budgetDen budget = floor(Σa / budgetDen)
    * @return (source, available, target_grid, capped, allocated,
    *         fill_ratio); windows run over the O(rows) input only.
    */
  def waterfill(perSource: DataFrame, budgetDen: Long = 2L): DataFrame = {
    require(budgetDen >= 1L, s"budgetDen must be >= 1: $budgetDen")
    import org.apache.spark.sql.expressions.Window
    // Enforce the documented precondition at execution: a 0/negative/
    // null `a` or `t` would otherwise make qk null (decimal div-by-zero
    // under non-ANSI semantics), silently corrupting the sort order and
    // every allocation downstream — raise instead (the encodeIdx
    // pattern).
    def atLeastOne(c: String): org.apache.spark.sql.Column =
      when(col(c) >= 1L, col(c)).otherwise(raise_error(concat(
        lit(s"waterfill: $c must be >= 1, got "),
        coalesce(col(c).cast("string"), lit("null")),
        lit(" for source "),
        coalesce(col("source").cast("string"), lit("null"))))
        .cast("long"))
    val checked = perSource.withColumn("a", atLeastOne("a"))
      .withColumn("t", atLeastOne("t"))
    val tot = checked.agg(sum(col("a")).cast("long").as("ta"),
      sum(col("t")).cast("long").as("tt"))
    val w = Window.orderBy(col("qk"), col("source"))
    val ranked = checked.crossJoin(broadcast(tot))
      .withColumn("b", expr(s"ta div ${budgetDen}L"))
      .withColumn("qk", expr(
        "(CAST(a AS DECIMAL(38,0)) * 1000000) div CAST(t AS DECIMAL(38,0))"))
      .withColumn("pref_a", sum(col("a")).over(w) - col("a"))
      .withColumn("suf_t",
        col("tt") - (sum(col("t")).over(w) - col("t")))
      .withColumn("sat", expr(
        """CAST(a AS DECIMAL(38,0)) * CAST(suf_t AS DECIMAL(38,0))
           <= CAST(b - pref_a AS DECIMAL(38,0))
              * CAST(t AS DECIMAL(38,0))"""))
      .withColumn("capped",
        min(when(col("sat"), 1L).otherwise(0L)).over(w) === lit(1L))
      // O(rows) table consumed by the caps aggregate AND the final
      // projection (and by callers that join the result) — persisted so
      // the window subtree plans once instead of once per consumer
      .transform(graft.core.Caching.persist)
    val caps = ranked.agg(
      sum(when(col("capped"), col("a")).otherwise(0L)).cast("long")
        .as("ca"),
      sum(when(col("capped"), col("t")).otherwise(0L)).cast("long")
        .as("ct"))
    ranked.crossJoin(broadcast(caps))
      .select(col("source"), col("a").as("available"),
        col("t").as("target_grid"), col("capped"),
        when(col("capped"), col("a")).otherwise(expr(
          """CAST(b - ca AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
             div CAST(tt - ct AS DECIMAL(38,0))""").cast("long"))
          .as("allocated"))
      .select(col("source"), col("available"), col("target_grid"),
        col("capped"), col("allocated"),
        (col("allocated").cast("double") / col("available").cast("double"))
          .as("fill_ratio"))
  }

  /** Effective-data ratio of the repeated-epoch decay (published
    * data-constrained-scaling fit, R* = 5.3): allocated < U means every
    * token is fresh (ratio = allocated/U); past one epoch repeats decay
    * as 1 + R*·(1−e^{−(ep−1)/R*}). Single libm exp on exact-integer
    * division inputs, rounded to the 6-decimal grid (q82 discipline).
    */
  def effectiveRatio(allocated: Column, u: Column): Column =
    round(when(allocated < u,
      allocated.cast("double") / u.cast("double"))
      .otherwise(lit(1.0) + lit(5.3)
        * (lit(1.0) - exp(negate(
            (allocated.cast("double") / u.cast("double")
              - lit(1.0)) / lit(5.3))))), 6)
}
