package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point: every graft native expression
  * becomes a built-in SQL function at session construction —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Equivalent to calling [[graft.llm.GraftFunctions.register]] on a
  * running session, but injection registers in the session's function
  * registry at build time, so SQL-only users (thrift server, notebooks)
  * never touch Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.llm.GraftFunctions.builders.foreach { case (name, usage, builder) =>
      // (className, db, functionName, usage, extended) — so
      // `DESCRIBE FUNCTION word_shingles` shows the call signature
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.llm.GraftFunctions", null, name, usage, ""),
        builder))
    }
    // semantics-preserving rewrites Catalyst lacks (each rule documents
    // its soundness theorem; the full oracle gate runs with them active)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    ext.injectOptimizerRule(_ => graft.plans.JaccardSizeRatioRule)
  }
}
