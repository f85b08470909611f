package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered edge orientation
  * (Schank's thesis; Suri & Vassilvitskii's MapReduce formulation).
  *
  * The naive wedge join — self-join the edge list on a shared endpoint,
  * then probe for the closing edge — generates Σ deg(v)² candidate
  * wedges: one celebrity node with degree 10⁷ in a 100 TB graph emits
  * 10¹⁴ wedges and the job never finishes. Orienting every undirected
  * edge from its (degree, id)-smaller endpoint to the larger fixes this
  * unconditionally: each triangle then has exactly one apex whose two
  * OUT-edges form the wedge, and every node's out-degree is ≤ √(2m)
  * regardless of skew (a node with out-degree d has d higher-ranked
  * neighbors, each of degree ≥ d, so d² ≤ Σdeg = 2m). The wedge join
  * drops from Σ deg² (unbounded under skew) to Σ outdeg² ≤ O(m^1.5) —
  * the hub's edges become IN-edges of its higher-rank neighbors and the
  * hub itself emits nothing.
  *
  * Everything is equi-joins on node ids: degree attach (2 hash joins),
  * wedge self-join on the apex, closing-edge join on the (x, y) pair —
  * all AQE-planned, no sort windows, no driver-side state. Training-data
  * relevance: triangle/wedge counts and the clustering coefficient they
  * form are the standard structure probes on similarity graphs (near-dup
  * pair graphs, co-citation graphs) before choosing cluster thresholds.
  *
  * Reference scope note: FLINK.NET has no graph library; this extends the
  * engine the same way the dedup/ANN family does (SURVEY §8 extension
  * table), with the oracle defining exact semantics.
  */
object Triangles {

  /** Edge list (`u`, `v`; canonical u < v, deduped) → one summary row:
    * n_nodes, n_edges, n_wedges (unordered 2-paths, the clustering
    * coefficient denominator Σ d(d−1)/2), n_triangles. All BIGINT-exact.
    */
  def summary(edges: DataFrame): DataFrame = {
    // the edge list is consumed by the degree count (twice via union),
    // the orientation join, and the closing-edge probe — persist the
    // input once so an expensive upstream edge build (a support-filtered
    // self-join, an LSH candidate generator) executes once, not per
    // consumer
    val e = edges.transform(graft.core.Caching.persist)
    // deg feeds the two orientation joins AND the summary aggregate;
    // oriented feeds both wedge sides AND the closing-edge probe. Without
    // persisting them each consumer re-runs the degree shuffle and the
    // two attach joins from scratch (measured: full q105 8.5 s → 3.9 s at
    // sf0.1). Both tables are O(nodes)/O(edges) — small by construction.
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .transform(graft.core.Caching.persist)

    // attach both endpoint degrees, orient by the (degree, id) total order
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"),
      // carry the target's rank so wedge pairs can be emitted in
      // orientation order without re-joining degrees (field names must
      // agree across the branches for the CASE to typecheck)
      when(uFirst, struct(col("dv").as("rd"), col("v").as("rn")))
        .otherwise(struct(col("du").as("rd"), col("u").as("rn"))).as("rt"))
      .transform(graft.core.Caching.persist)

    // wedges at the apex s: unordered out-neighbor pairs, emitted as
    // (lower-rank x, higher-rank y) so the closing edge — itself oriented
    // low→high — matches by direct equality. Distinct edges ⇒ the closing
    // join multiplies each wedge by exactly 0 or 1.
    val a = oriented.select(col("s"), col("t").as("x"), col("rt").as("rx"))
    val b = oriented.select(col("s"), col("t").as("y"), col("rt").as("ry"))
    val wedges = a.join(b, Seq("s")).filter(col("rx") < col("ry"))
      .select(col("x"), col("y"))
    val closed = wedges.join(
      oriented.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))

    val triCount = closed.agg(count(lit(1)).as("n_triangles"))
    val degStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("d")) / lit(2)).cast("long").as("n_edges"),
      sum(col("d") * (col("d") - lit(1)) / lit(2)).cast("long").as("n_wedges"))
    degStats.crossJoin(triCount)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
  }

  /** Per-edge oriented form, exposed for the skew-bound spec: the max
    * out-degree after orientation is what bounds the wedge join.
    */
  def orientedOutDegrees(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    withDeg.select(when(uFirst, col("u")).otherwise(col("v")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("out_d"))
  }
}
