package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the native expressions, so `spark.sql`
  * users get them too: `word_shingles(text, 3)`,
  * `minhash_signature(shingles, 8)`. Equivalent to wiring
  * `SparkSessionExtensions.injectFunction` at session build.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "word_shingles") { args =>
      require(args.length == 2, "word_shingles(text, n)")
      ShinglesExpr(args.head, intArg(args(1), "n"))
    }
    ColumnBridge.registerFunction(spark, "minhash_signature") { args =>
      require(args.length == 2, "minhash_signature(shingles, k)")
      MinHashSignatureExpr(args.head, intArg(args(1), "k"))
    }
    ColumnBridge.registerFunction(spark, "cosine_similarity") { args =>
      require(args.length == 2, "cosine_similarity(a, b)")
      CosineSimilarityExpr(args.head, args(1))
    }
  }
}
