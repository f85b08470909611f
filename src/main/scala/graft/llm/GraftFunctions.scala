package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the native expressions, so `spark.sql`
  * users get them too: `word_shingles(text, 3)`,
  * `minhash_signature(shingles, 8)`. Builders are shared with
  * [[graft.GraftExtensions]], the `spark.sql.extensions` entry point that
  * injects the same functions at session build.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every SQL-callable native expression. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("word_shingles", "word_shingles(text, n)", args => {
      require(args.length == 2, "word_shingles(text, n)")
      ShinglesExpr(args.head, intArg(args(1), "n"))
    }),
    ("minhash_signature", "minhash_signature(shingles, k)", args => {
      require(args.length == 2, "minhash_signature(shingles, k)")
      MinHashSignatureExpr(args.head, intArg(args(1), "k"))
    }),
    ("cosine_similarity", "cosine_similarity(a, b)", args => {
      require(args.length == 2, "cosine_similarity(a, b)")
      CosineSimilarityExpr(args.head, args(1))
    }),
    ("simhash", "simhash(tokens, bits)", args => {
      require(args.length == 2, "simhash(tokens, bits)")
      SimHashExpr(args.head, intArg(args(1), "bits"))
    }),
    ("hyperplane_band_buckets",
      "hyperplane_band_buckets(vec, bands, planesPerBand, dims)", args => {
      require(args.length == 4,
        "hyperplane_band_buckets(vec, bands, planesPerBand, dims)")
      HyperplaneBandBucketsExpr(args.head, intArg(args(1), "bands"),
        intArg(args(2), "planesPerBand"), intArg(args(3), "dims"))
    }),
    ("deletion_band_hashes",
      "deletion_band_hashes(str[, prefix]) — hashes the <=2-deletion " +
        "neighborhood of the FIRST min(length, prefix) code points; " +
        "prefix defaults to 20 (r8 change: previously unbounded, so " +
        "band keys for >20-char strings differ from pre-r8 indexes — " +
        "pass an explicit larger prefix to match an old index; " +
        "persisted indexes should go through graft.operators.BandIndex, " +
        "which records the prefix and fails loudly on mismatch)", args => {
      require(args.length == 1 || args.length == 2,
        "deletion_band_hashes(str[, prefix])")
      val p = if (args.length == 2) intArg(args(1), "prefix")
              else graft.operators.DeletionBandExpr.DefaultPrefix
      graft.operators.DeletionBandExpr(args.head, p, fromEnd = false)
    }),
    ("jaccard_sim", "jaccard_sim(arrayA, arrayB)", args => {
      require(args.length == 2, "jaccard_sim(arrayA, arrayB)")
      JaccardExpr(args.head, args(1))
    }),
    ("char_ngram_stats", "char_ngram_stats(text, n)", args => {
      require(args.length == 2, "char_ngram_stats(text, n)")
      CharNgramStatsExpr(args.head, intArg(args(1), "n"))
    })
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      ColumnBridge.registerFunction(spark, name)(builder)
    }
}
