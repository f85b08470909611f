package graft.tools

/** Dump `.explain("formatted")` for named SparkEntry queries to
  * plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence an
  * optimization round commits next to its bench numbers.
  * Usage: runMain graft.tools.PlanDump r16 before q312 q320
  * (args: tag, suffix, then query-name prefixes; data dir from
  * SPARK_GRAFT_SF_DIR, default sf0.001 — plan SHAPE is sf-independent).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <prefix>...")
    val (tag, suffix, prefixes) = (args(0), args(1), args.drop(2).toSeq)
    val spark = graft.core.GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    graft.SparkEntry.queries
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val exchanges = txt.sliding("Exchange".length)
          .count(_ == "Exchange")
        println(s"[plandump] $name -> ${outDir.resolve(name)}_$suffix.txt " +
          s"(Exchange=$exchanges)")
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
