package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration damped PageRank in integer micro-units — iterative
  * graph computation as chained join→aggregate rounds.
  *
  * Float PageRank is order-dependent (parallel double sums), so two runs
  * of the same job can disagree in the last bits and no cross-engine
  * oracle can hash it. Quantizing to integer micro-units makes every
  * round exact: contributions are `(pr*17) div (20*od)` (damping 0.85 as
  * the rational 17/20, floor division), the per-node update is an integer
  * sum — associative, commutative, partition-order-independent — plus the
  * teleport term `0.15*unit`. Results are bit-identical at any
  * parallelism and reproducible in any engine with 64-bit integers.
  *
  * Scale shape: `edges ⋈ outdeg` is computed once, persisted, and reused
  * by every round (the per-iteration work is ONE hash join against the
  * current ranks — co-keyed on src — and ONE aggregation shuffle on dst).
  * Rank state is one row per node, never per edge. Integer division runs
  * through the SQL `div` operator, not floor(double/double): at 10⁹ nodes
  * a rank can reach ~10¹⁵ micro-units and pr*17 overflows double's 53-bit
  * mantissa while staying far inside Long.
  *
  * Contract: `edges` is directed (src, dst) with every node having
  * out-degree ≥ 1 and in-degree ≥ 1 — a symmetrized undirected graph
  * satisfies both. (Dangling-node redistribution would need a global
  * scalar per round; out of scope for the oracle-gated form.)
  */
object PageRank {

  def ranks(edges: DataFrame, iters: Int = 3, unit: Long = 1000000L): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // the ONLY thing that touches the caller's (possibly expensive) edge
    // DAG: everything else — initial ranks included — derives from this
    // persisted table, so the edge build executes exactly once, not once
    // per consumer. Explicitly hash-partitioned by src BEFORE the
    // persist: every round's ranks join requires exactly that
    // distribution, so the cached layout satisfies it and only the
    // (node-sized) ranks side shuffles per round — without it the
    // edge-sized table was re-exchanged and re-sorted on every
    // iteration (r17 plan: one Exchange+Sort over the cache per round).
    val eo = edges.join(outdeg, Seq("src"))
      .repartition(col("src"))
      .transform(graft.core.Caching.persist)
    val teleport = lit(unit * 3 / 20)
    val p0 = eo.select(col("src").as("node")).distinct()
      .select(col("node"), lit(unit).as("pr"))
    (1 to iters).foldLeft(p0) { (p, _) =>
      eo.join(p.select(col("node").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst"))
        .agg((teleport + sum(expr("(pr * 17) div (20 * od)"))).cast("long").as("pr"))
        .select(col("dst").as("node"), col("pr"))
    }
  }
}
