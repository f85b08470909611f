package graft.tools

/** Prints the executed-plan node summary for the named queries (or a
  * default recent set) at sf0.001 — the .explain review loop the build
  * brief asks for, kept runnable per round.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.getOrCreate()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q130_keep_best", "q131_regression", "q132_source_overlap",
        "q133_token_entropy", "q134_rolling_dau", "q135_rolling_hll")
    val dir = "/root/testdata/sf0.001"
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val counts = Seq("Exchange", "Window", "CartesianProduct",
        "BroadcastNestedLoopJoin", "SortMergeJoin", "BroadcastHashJoin",
        "ObjectHashAggregate", "HashAggregate", "Sort ")
        .map(k => s"$k=${plan.sliding(k.length).count(_ == k)}").mkString(" ")
      println(s"[plan] $n $counts")
    }
    spark.stop()
  }
}
