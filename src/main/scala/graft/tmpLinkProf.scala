import org.apache.spark.sql.functions._
object LinkProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder(master = "local[32]", shufflePartitions = 32).appName("prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val c = graft.core.Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    def time[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val n = length(col("c_name"))
    val none = array().cast("array<string>")
    val del1 = when(n >= 1, transform(sequence(lit(1), n), i => concat(col("c_name").substr(lit(1), i - lit(1)), col("c_name").substr(i + lit(1), n)))).otherwise(none)
    val del2 = when(n >= 2, flatten(transform(sequence(lit(1), n - lit(1)), i => transform(sequence(i + lit(1), n), j => concat(col("c_name").substr(lit(1), i - lit(1)), col("c_name").substr(i + lit(1), j - i - lit(1)), col("c_name").substr(j + lit(1), n)))))).otherwise(none)
    val hb = array_distinct(transform(concat(array(col("c_name")), del1, del2), v => xxhash64(v)))
    val keyed = c.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"), explode(hb).as("band"))
    time("explode+count")(println(keyed.count()))
    val k2 = keyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize")(println(k2.count()))
    val a = k2.columns.foldLeft(k2)((d, c0) => d.withColumnRenamed(c0, "a_" + c0))
    val b = k2.columns.foldLeft(k2)((d, c0) => d.withColumnRenamed(c0, "b_" + c0))
    val j = a.join(b, col("a_c_nationkey") === col("b_c_nationkey") && col("a_c_mktsegment") === col("b_c_mktsegment") && col("a_band") === col("b_band") && col("a_c_custkey") < col("b_c_custkey"))
    time("join count")(println(j.count()))
    time("distinct count")(println(j.select(col("a_c_custkey").as("id_a"), col("b_c_custkey").as("id_b")).distinct().count()))
    spark.stop()
  }
}
