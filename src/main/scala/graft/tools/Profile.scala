package graft.tools

import graft.core.GraftSession

/** Scratch profiler: time named SparkEntry queries through Bench.consume
  * (the one force-every-column evaluator, so profiler and bench always
  * measure identical work) at SPARK_GRAFT_SF_DIR.
  * Usage: runMain graft.tools.Profile q52 q58 (prefix match on query
  * names; no args = nothing — not part of the API surface).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val wanted = graft.SparkEntry.queries.filter {
      case (name, _) => args.exists(name.startsWith)
    }
    wanted.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      time(name)(graft.Bench.consume(df))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
