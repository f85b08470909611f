package graft.tools
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.llm.Dedup

/** One-off 10x scale smoke: replicate the sf0.1 documents corpus 10 times
  * (ids shifted so replicas are exact near-dups of each other) and run the
  * full near-dup clustering. Checks: runtime stays near-linear, the
  * hot-bucket guard + star components survive 10x replication (every
  * replica family must cluster together).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val n = base.count()
    val big = (0 until 10).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
    println(s"[smoke] corpus: ${n * 10} docs (10 x $n)")
    val t0 = System.nanoTime()
    // smallGraphThreshold = 0: smoke the DISTRIBUTED star path on the
    // full replicated edge set (the default would collect driver-side)
    val clusters = Dedup.connectedComponents(
      Dedup.nearDuplicatePairs(big, "doc_id", "text", 3, 8, 4, 0.5),
      smallGraphThreshold = 0L)
    val nClustered = clusters.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // every base doc with >= 3 tokens has 10 exact replicas -> its family
    // must land in ONE cluster labeled by the base (smallest) id
    val families = clusters
      .withColumn("family", pmod(col("node"), lit(1000000L)))
      .groupBy("family").agg(countDistinct("cluster_id").as("nc"),
        count(lit(1)).as("members"))
    val bad = families.where(col("nc") =!= 1).count()
    val fullFamilies = families.where(col("members") >= 10).count()
    println(f"[smoke] pairs->clusters in $secs%.1f s; $nClustered nodes clustered; " +
      s"$fullFamilies full replica families; $bad families split across clusters")
    require(bad == 0, "replica family split across clusters")
    spark.stop()
  }
}
