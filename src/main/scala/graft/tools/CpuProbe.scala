package graft.tools
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 640000000L, 1, cpus.toInt * 4)
        .select(expr("xxhash64(id, id+1, id+2)").as("h"))
        .agg(expr("bit_xor(h)")).head()
      (System.nanoTime() - t0) / 1e9
    }
    run()
    println(f"[cpuprobe] cpus=$cpus best=${(1 to 3).map(_ => run()).min}%.2f s")
    spark.stop()
  }
}
