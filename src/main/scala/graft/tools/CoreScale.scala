package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Per-query core-scaling measurement at a scale where parallelism is
  * visible (r16 verdict #7): sf0.1 is overhead-bound — the full suite
  * totals the SAME at 8 and 32 cores because ~137 queries run under
  * 0.5 s against a ~0.15 s per-query session floor — so sf0.1 numbers
  * cannot certify that the heavy plans actually parallelize.
  *
  * This tool replicates the sf0.1 inputs of the heavy bench families as
  * `SPARK_GRAFT_REPL` (default 10) DISJOINT key-shifted copies (~sf1
  * row counts), materializes them to parquet once, and times the heavy
  * queries end-to-end at the core count in `SPARK_GRAFT_CPUS`. One JSON
  * line on stdout: {"tool":"core_scale","cpus":N,"repl":R,
  * "queries":{name:sec,...}}. Run it twice (8 and 32 cores) and compare
  * per-query ratios — `tools/core_scale.sh` does exactly that and
  * writes the merged ratios to core_scale.json.
  *
  * Replication is the same disjoint-copy construction ScaleSmoke's
  * frontier uses: key shifts keep every per-key density identical (the
  * star/prefix-cap axis is smoked separately), so the measurement is
  * pure volume throughput — the thing more cores must divide.
  */
object CoreScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the session MUST be built at the requested core count — the
    // plain getOrCreate() default is local[32], which silently turns
    // the "8-core" leg into a second 32-core run (the first committed
    // core_scale.json was exactly that artifact: flat ratios)
    val spark = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.llm.GraftFunctions.register(spark)
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "10").toInt
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "2").toInt.max(1)
    // reuse an existing replicated dir (the 8-core and 32-core runs must
    // time IDENTICAL bytes; also saves the second materialize pass)
    val out = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-corescale").toString)
    val rep = spark.range(repl.toLong).select(col("id").as("rep"))
    def materialize(name: String, df: org.apache.spark.sql.DataFrame,
                    shiftCols: Seq[String], shift: Long): Unit = {
      val p = s"$out/$name.parquet"
      if (!new java.io.File(p).exists()) {
        shiftCols.foldLeft(df.crossJoin(rep)) { (d, c) =>
          d.withColumn(c, col(c) + col("rep") * lit(shift))
        }.drop("rep").write.mode("overwrite").parquet(p)
      }
    }
    materialize("lineitem", Tables.lineitem(spark, dir),
      Seq("l_orderkey", "l_partkey"), 100000000L)
    materialize("orders", Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey"), 100000000L)
    materialize("customer", Tables.customer(spark, dir),
      Seq("c_custkey"), 100000000L)
    materialize("documents", Tables.documents(spark, dir),
      Seq("doc_id"), 100000000L)
    materialize("embeddings", Tables.embeddings(spark, dir),
      Seq("vec_id"), 100000000L)
    materialize("events", Tables.events(spark, dir),
      Seq("event_id", "user_id"), 100000000L)
    // the part table is a DIMENSION of the replicated facts (q136 joins
    // l_partkey -> p_partkey): replicate it with the same key shift so
    // every shifted fact key still resolves
    materialize("part", Tables.part(spark, dir),
      Seq("p_partkey"), 100000000L)
    // supplier stays 1x UNREPLICATED: l_suppkey is not shifted, so the
    // original dimension rows already resolve every fact key (a blind
    // rep-crossJoin would duplicate dimension rows and join results)
    val supplierPath = s"$out/supplier.parquet"
    if (!new java.io.File(supplierPath).exists()) {
      Tables.supplier(spark, dir).write.mode("overwrite")
        .parquet(supplierPath)
    }
    spark.catalog.clearCache()

    // the heavy, corpus-bound bench families (r16/r17 cost table top):
    // graph (q105/q106/q147), linkage/ER (q166/q175), curation + LM
    // (q58/q261/q277), packing (q314/q318), sketches (q191), baskets
    // (q136/q168), ANN (q320)
    val heavy = Seq("q105_", "q106_", "q147_", "q166_", "q175_", "q58_",
      "q261_", "q277_", "q314_", "q318_", "q191_", "q136_", "q168_",
      "q320_", "q153_")
    // optional prefix filter after the dir arg (deeper-replication runs
    // time a subset: repl x heavy-count x 4 alternating JVMs adds up)
    val wanted = if (args.length > 1) args.drop(1).toSeq else heavy
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.exists(n.startsWith))
    require(names.size == wanted.size, s"heavy-set resolution: $names")
    val times = names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      val secs = (1 to sweeps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.consume(fn(spark, out))
        val s0 = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s0
      }.min
      System.err.println(f"[corescale] $n%-28s $secs%8.2f s ($cpus cores)")
      n -> secs
    }
    val qs = times.map { case (n, s) =>
      "\"" + n + "\":" + String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(s))
    }.mkString("{", ",", "}")
    println(s"""{"tool":"core_scale","cpus":$cpus,"repl":$repl,""" +
      s""""dir":"$out","queries":$qs}""")
    spark.stop()
  }
}
