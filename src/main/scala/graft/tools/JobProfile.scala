package graft.tools

import scala.collection.mutable

/** Per-JOB wall-time attribution for named SparkEntry queries: prints
  * every Spark job the query runs (duration + description) AND the
  * driver-side gaps between jobs (planning, collects, codegen) — the
  * breakdown the optimization loop needs when a query's bench time is
  * not explained by its final plan. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobProfile q175 q166
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          starts.put(j.jobId, (j.time, desc))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.get(j.jobId)).foreach { case (t0, d) =>
            jobs.synchronized { jobs += ((j.jobId, t0, j.time, d)) }
          }
        }
      })
    val wanted = graft.SparkEntry.queries
      .filter { case (name, _) => args.exists(name.startsWith) }
    wanted.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      jobs.synchronized(jobs.clear())
      val t0 = System.currentTimeMillis()
      graft.Bench.consume(fn(spark, dir))
      val t1 = System.currentTimeMillis()
      // listener events are async — give the bus a beat to drain
      Thread.sleep(300)
      val js = jobs.synchronized(jobs.sortBy(_._2).toVector)
      println(f"[jobprofile] $name total ${(t1 - t0) / 1000.0}%.2f s, " +
        s"${js.size} jobs")
      var cursor = t0
      js.foreach { case (id, s, e, d) =>
        val gap = (s - cursor) / 1000.0
        if (gap > 0.05)
          println(f"[jobprofile]   (driver gap ${gap}%6.2f s)")
        println(f"[jobprofile]   job $id%3d @${(s - t0) / 1000.0}%6.2f " +
          f"${(e - s) / 1000.0}%6.2f s  " + d.take(90))
        cursor = math.max(cursor, e)
      }
      val tail = (t1 - cursor) / 1000.0
      if (tail > 0.05)
        println(f"[jobprofile]   (driver tail ${tail}%6.2f s)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
