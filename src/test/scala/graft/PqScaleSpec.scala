package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ at PRODUCTION parameters (r15 advice): real deployments encode
  * with ksub = 256 (one byte per code) and m >= 8; q320's fixture runs
  * m=4/ksub=8. This spec proves the literal-codebook `array_min`
  * encode ([[graft.llm.Pq.encodeLists]]) stays tractable and CORRECT
  * at 256-entry codebooks x 8 subspaces (2048 struct literals in the
  * projection): values pinned to a driver-side reference argmin
  * (integer grid, ties to the lower code), codes byte-ranged, norms
  * exact, and the wall-clock bounded.
  */
class PqScaleSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  import graft.llm.{Pq, Similarity}
  import graft.operators.KMeans

  test("encodeLists at ksub=256, m=8: literal-codebook expression " +
      "compiles, matches the reference argmin, and stays inside the " +
      "time envelope") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val (m, dsub, ksub) = (8, 8, 256)
    val t0 = System.nanoTime()
    val cb = Pq.collectCodebooks(Pq.trainCodebooks(
      emb, "vec_id", "v", dims = 64, m = m, ksub = ksub, iters = 1))
    assert(cb.size === m * ksub, s"full codebook: ${cb.size}")
    assert(cb.forall(_._3.size == dsub))
    val quantizer: Seq[(Long, Seq[Double])] = emb.orderBy("vec_id")
      .limit(4).as[(Long, Seq[Double])].collect().toSeq
    val lists = Similarity.ivfBuildWith(emb, "vec_id", "v",
      quantizer.toDF("cid", "cv")).lists
    val got = Pq.encodeLists(lists, cb)
      .select(col("member"), col("codes"), col("pnrm2"))
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"ksub=256 m=8 train+encode over ${got.length} vectors: " +
      f"$secs%.2f s")
    // the envelope: an expression-size blowup here shows up as minutes
    // (or a codegen explosion), not seconds
    assert(secs < 120.0, f"ksub=256 encode too slow: $secs%.1f s")
    assert(got.length === 500)
    assert(got.forall(_._2.size == m))
    assert(got.forall(_._2.forall(c => c >= 0 && c < ksub)))
    // reference argmin on the same integer grid, ties to lower code
    val bySub = cb.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(e => (e._2.toLong, e._3))).toMap
    val qv = emb.select(col("vec_id"),
        KMeans.quantize(col("v")).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    got.foreach { case (member, codes, pnrm2) =>
      val q = qv(member)
      var n2 = 0L
      (0 until m).foreach { j =>
        val sub = q.slice(j * dsub, j * dsub + dsub)
        val (bestCode, bestCoords) = bySub(j).minBy { case (c, coords) =>
          (sub.zip(coords).map { case (a, b) =>
            (a - b) * (a - b) }.sum, c)
        }
        assert(codes(j) === bestCode,
          s"member $member sub $j: ${codes(j)} != $bestCode")
        n2 += bestCoords.map(x => x * x).sum
      }
      assert(pnrm2 === n2, s"member $member norm")
    }
  }
}
