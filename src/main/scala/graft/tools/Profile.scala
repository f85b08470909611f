package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.llm.Dedup

/** Scratch profiler for LSH stage timings (not part of the API surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("FRESH full nearDuplicatePairs")(
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", 3, 8, 4, 0.5).count())
    time("full again (cache hit)")(
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", 3, 8, 4, 0.5).count())
    spark.stop()
  }
}
