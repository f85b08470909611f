package graft.tools
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Interleaved A/B for the r17 rewrites the full-suite bench could not
  * adjudicate (the harness host shows ×1.4–1.6 drift bursts on
  * UNTOUCHED queries, so single-sweep before/after deltas under ~1.6×
  * are noise): old-vs-new shapes run alternating reps in one JVM on one
  * dataset so drift hits both sides equally.
  *
  *   runMain graft.tools.AbR17 q175   # linkage candidates: self-join vs grouped pairs
  *   runMain graft.tools.AbR17 q106   # pagerank eo cache: plain vs repartition(src)
  */
object AbR17 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("AB_REPS", "5").toInt
    val which = args.headOption.getOrElse("q175")

    def consumeTimed(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.Bench.consume(df)
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }

    // ---- q175 candidate-pair variants -------------------------------
    def bandedKeyed(c: DataFrame): DataFrame =
      c.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        explode(graft.operators.DeletionBandExpr(col("c_name"),
          graft.operators.Linkage.DefaultBandPrefix, false)).as("band"))
    def candOld(c: DataFrame): DataFrame = {
      val keyed = bandedKeyed(c).transform(graft.core.Caching.materialize)
      val a = keyed.columns.foldLeft(keyed)((d, c0) =>
        d.withColumnRenamed(c0, "a_" + c0))
      val b = keyed.columns.foldLeft(keyed)((d, c0) =>
        d.withColumnRenamed(c0, "b_" + c0))
      val keys = Seq("c_nationkey", "c_mktsegment", "band")
      val cond = keys.map(k => col("a_" + k) === col("b_" + k))
        .reduce(_ && _) && col("a_c_custkey") < col("b_c_custkey")
      a.join(b.hint("shuffle_hash"), cond)
        .select(col("a_c_custkey").as("id_a"), col("b_c_custkey").as("id_b"))
        .distinct()
    }
    def candNew(c: DataFrame): DataFrame =
      graft.operators.Linkage.candidatePairs(c, "c_custkey", "c_name",
        Seq("c_nationkey", "c_mktsegment"))
    def q175With(cand: DataFrame => DataFrame): DataFrame = {
      val c = Tables.customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val attrs = c.select(col("c_custkey"), col("c_name"), col("cents"))
      val a = attrs.columns.foldLeft(attrs)((d, n) => d.withColumnRenamed(n, "a_" + n))
      val b = attrs.columns.foldLeft(attrs)((d, n) => d.withColumnRenamed(n, "b_" + n))
      val links = cand(c)
        .join(a, col("id_a") === col("a_c_custkey"))
        .join(b, col("id_b") === col("b_c_custkey"))
        .filter(abs(col("a_cents") - col("b_cents")) < 50000L &&
          levenshtein(col("a_c_name"), col("b_c_name")) <= 2)
        .select(col("id_a"), col("id_b"))
      val cc = graft.llm.Dedup.connectedComponents(links, "id_a", "id_b")
        .withColumnsRenamed(Map("node" -> "c_custkey"))
      val members = c.join(cc, Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("cents"),
          coalesce(col("cluster_id"), col("c_custkey")).as("cluster_id"))
      members.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), sum(col("cents")).as("t"))
    }

    // ---- q106 eo-cache variants --------------------------------------
    def ranksWith(repart: Boolean): DataFrame = {
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
      val pairs = li.select(col("l_orderkey"), col("l_partkey").as("u"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("v")), Seq("l_orderkey"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2).select(col("u"), col("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val eo0 = edges.join(outdeg, Seq("src"))
      val eo = graft.core.Caching.persist(
        if (repart) eo0.repartition(col("src")) else eo0)
      val unit = 1000000L
      val teleport = lit(unit * 3 / 20)
      val p0 = eo.select(col("src").as("node")).distinct()
        .select(col("node"), lit(unit).as("pr"))
      (1 to 3).foldLeft(p0) { (p, _) =>
        eo.join(p.select(col("node").as("src"), col("pr")), Seq("src"))
          .groupBy(col("dst"))
          .agg((teleport + sum(expr("(pr * 17) div (20 * od)"))).cast("long").as("pr"))
          .select(col("dst").as("node"), col("pr"))
      }
    }

    val (mkA, mkB): (() => DataFrame, () => DataFrame) = which match {
      case "q175" => (() => q175With(candOld), () => q175With(candNew))
      case "q106" => (() => ranksWith(false), () => ranksWith(true))
      case x => sys.error(s"unknown target $x")
    }
    consumeTimed(mkA()); consumeTimed(mkB()) // warm both code paths
    val (as, bs) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) { as(i) = consumeTimed(mkA()); bs(i) = consumeTimed(mkB()) }
    def st(v: Array[Double]) =
      f"min=${v.min}%.2f median=${v.sorted.apply(reps / 2)}%.2f all=${v.map(x => f"$x%.2f").mkString(",")}"
    println(s"[ab-r17] $which OLD ${st(as)}")
    println(s"[ab-r17] $which NEW ${st(bs)}")
    spark.stop()
  }
}
