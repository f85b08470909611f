package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.RelationalQueries

object TestSession {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("every relational query runs and returns a stable schema") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q01 pricing summary has the expected group cardinality and totals") {
    val rows = RelationalQueries.queries("q01_agg_pricing")(spark, sfDir).collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus in fixture
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    assert(totalCount > 3000 && totalCount <= 6010)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle is registered, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
  }

  test("filter and projection are pushed into the parquet scan") {
    val df = RelationalQueries.queries("q02_filter_project")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected pushed filters in:\n$plan")
    // ReadSchema must not include untouched wide columns.
    assert(!plan.contains("l_comment") && !plan.contains("l_shipdate"),
      "column pruning failed: scan reads unused columns")
  }

  test("dim join uses broadcast hash join (no shuffle of the fact side)") {
    val df = RelationalQueries.queries("q05_join_broadcast")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ in:\n$plan")
  }

  test("sort+limit compiles to TakeOrderedAndProject (no global sort)") {
    val df = RelationalQueries.queries("q11_sort_limit")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$plan")
  }

  test("semi/anti joins produce correct disjoint partition of customers") {
    import org.apache.spark.sql.functions._
    val c = graft.core.Tables.customer(spark, sfDir)
    val o = graft.core.Tables.orders(spark, sfDir).filter(col("o_totalprice") > lit(300000.0))
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti === c.count())
  }

  test("approx_count_distinct lands within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = graft.queries.ExtendedRelationalQueries
      .queries("q52_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05, s"$k: ${approx(k)} vs $e")
    }
  }

  test("range join broadcasts the bucket table (fact side never shuffles)") {
    val df = graft.queries.ExtendedRelationalQueries.queries("q49_range_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ in:\n$plan")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.core.Tables.orders(spark, sfDir)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.core.Tables.lineitem(spark, sfDir)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucket pruning: the JOIN itself must not introduce a shuffle —
      // both sides arrive pre-partitioned on the bucket key
      val joinSection = plan.substring(0, plan.indexOf("FileScan"))
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey")
        && !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"join should be co-located, got:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("hive-style partitioned writes prune partitions at the scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    graft.core.Tables.documents(spark, sfDir)
      .write.partitionBy("lang").mode("overwrite").parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs").where(col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$plan")
    assert(df.count() > 0)
    // the data filter never appears as a post-scan Filter: it's pruned away
    assert(!plan.contains("PushedFilters: [IsNotNull(lang"),
      "partition column wrongly treated as data filter")
  }

  test("dynamic partition pruning kicks in for dim-filtered joins") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    graft.core.Tables.lineitem(spark, sfDir)
      .withColumn("part_mod", (col("l_partkey") % 10).cast("int"))
      .write.partitionBy("part_mod").mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // DPP needs a selective predicate on the dim side to prune against
    val dim = spark.range(10).selectExpr("CAST(id AS INT) AS part_mod", "id AS dim_payload")
      .where(col("dim_payload") < 3)
    val joined = fact.join(dim, "part_mod").agg(sum(col("l_quantity")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("dynamicpruningexpression"),
      s"expected dynamic partition pruning in:\n$plan")
    assert(joined.head().getDouble(0) > 0)
  }

  test("bucketed interval join plans as an equi-join, never a nested loop") {
    val df = graft.queries.ExtendedRelationalQueries.queries("q68_interval_join")(
      spark, sfDir)
    df.head() // settle AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join must stay an equi-join on (key, bucket):\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join:\n$plan")
  }

  test("WeightedAvg aggregator merge is associative and order-insensitive") {
    val w = new graft.operators.WeightedAvg
    val vals = Seq((10.0, 2.0), (20.0, 3.0), (5.0, 1.0), (40.0, 4.0))
    val whole = vals.foldLeft(w.createAccumulator())(w.add)
    val (l, r) = vals.splitAt(2)
    val split = w.merge(
      l.foldLeft(w.createAccumulator())(w.add),
      r.foldLeft(w.createAccumulator())(w.add))
    assert(math.abs(w.getResult(whole) - w.getResult(split)) < 1e-12)
  }
}
