package graft.llm

import org.apache.spark.sql.DataFrame
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
}
