package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Star-cap vs oracle divergence boundary (r7 ADVICE).
  *
  * q199/q204/q214 generate candidates through
  * `LshGuard.guardedCandidates(maxBucket = 10000)` while their DuckDB
  * oracles enumerate ALL banded pairs uncapped — the two agree exactly
  * while every (band, bucket) population stays BELOW the cap, and
  * silently diverge (capped side degrades hot buckets to star edges)
  * beyond it. This spec pins the boundary at every oracle-verified
  * scale: the hottest bucket of each banded table involved must keep
  * ≥10× headroom under the cap, so the guard is provably a no-op where
  * the gate asserts hash equality. If a fixture regeneration or a new
  * SF ever pushes a bucket within reach of the cap, this fails BEFORE
  * the oracle gate starts disagreeing — the fix is then either raising
  * the cap for the query or mirroring the star-cap in the oracle SQL.
  */
class LshCapHeadroomSpec extends AnyFunSuite {
  import TestSession._

  private val Cap = 10000
  // the driver's oracle gate runs sf0.01; specs run sf0.001 — pin both
  private val gateDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("document MinHash band buckets (q204/q214 shape) keep >=10x " +
      "headroom under the star-cap at every gate scale") {
    for (dir <- gateDirs) {
      val sh = graft.core.Tables.documents(spark, dir)
        .select(col("doc_id"), graft.llm.Dedup.shinglesText(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      val hottest = graft.llm.Dedup.bandsFromShingles(sh, 8, 4)
        .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head.getLong(0)
      info(s"$dir: hottest (band,bucket) = $hottest of cap $Cap")
      assert(hottest <= Cap / 10,
        s"$dir: a minhash band bucket is within 10x of the star-cap — " +
          "capped candidates may start diverging from the uncapped oracle")
    }
  }

  test("embedding hyperplane band buckets (q199 shape) keep >=10x " +
      "headroom under the star-cap at every gate scale") {
    for (dir <- gateDirs) {
      val banded = graft.core.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          posexplode(graft.llm.HyperplaneBandBucketsExpr(
            col("embedding").cast("array<double>"), 4, 8, 64)))
        .toDF("vec_id", "band", "bucket")
      val hottest = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head.getLong(0)
      info(s"$dir: hottest (band,bucket) = $hottest of cap $Cap")
      assert(hottest <= Cap / 10,
        s"$dir: a hyperplane band bucket is within 10x of the star-cap — " +
          "capped ANN candidates may start diverging from the uncapped oracle")
    }
  }
}
