package graft.tools
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Interleaved A/B microbench: native ChunkStructsExpr vs the
  * Column-composed (HOF) chunking, same JVM, same data, alternating
  * reps so host drift cancels. Drives the full membership + hash-agg
  * shape (explode → groupBy chash) that every chunk query sits on.
  */
object AbChunk {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables.documents(spark, dir)
      .select(graft.llm.TextFunctions.tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .persist()
    t.count()
    def run(native: Boolean): Double = {
      val ch = if (native) graft.llm.ChunkDedup.chunkStructs(col("t"), 20, 7)
        else graft.llm.ChunkDedup.chunkStructsHof(col("t"), 20, 7)
      val t0 = System.nanoTime()
      val n = t.select(explode(ch).as("c"))
        .groupBy(col("c.chash")).agg(sum(col("c.ctoks")))
        .count()
      val s = (System.nanoTime() - t0) / 1e9
      require(n > 0)
      s
    }
    run(true); run(false) // warm both code paths
    val reps = 7
    val (nat, hof) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) { nat(i) = run(true); hof(i) = run(false) }
    println(f"[ab] native min=${nat.min}%.3f median=${nat.sorted.apply(reps / 2)}%.3f")
    println(f"[ab] hof    min=${hof.min}%.3f median=${hof.sorted.apply(reps / 2)}%.3f")
    spark.stop()
  }
}
