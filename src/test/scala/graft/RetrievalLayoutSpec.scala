package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder
import graft.queries.AnalyticQueries

/** Specs for the retrieval/layout pair: BM25 scoring (q98) against an
  * independent in-memory reference, and Z-order clustering (q99) — bit
  * roundtrip plus the locality claim the operator exists for.
  */
class RetrievalLayoutSpec extends AnyFunSuite {
  import TestSession._

  private val terms = Seq("join", "hash", "window")

  test("bm25 micro-scores equal an independent driver-side reference exactly") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val n = docs.size.toLong
    val sumDl = docs.values.map(_.size.toLong).sum
    val avgdl = sumDl.toDouble / n.toDouble
    val df = terms.map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    val idfMicro = terms.map { t =>
      t -> math.round(1e6 * math.log((n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5)))
    }.toMap
    val (k1, b) = (1.2, 0.75)
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.size.toDouble
      val cs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else Some(math.round(idfMicro(t).toDouble *
          (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl)))))
      }
      if (cs.isEmpty) None else Some(id -> ((cs.size.toLong, cs.sum)))
    }

    val got = graft.llm.Bm25.score(
      graft.core.Tables.documents(spark, sfDir), "doc_id", "text", terms)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("score_micro")))).toMap
    assert(got.keySet === expected.keySet, "matched-document sets differ")
    expected.foreach { case (id, e) =>
      assert(got(id) === e, s"bm25 mismatch for doc $id")
    }
  }

  test("zvalue interleave is a bijection (decode recovers both inputs)") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = spark.createDataFrame(pts).toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(col("x"), col("y")))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dx = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val dy = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(dx == x && dy == y, s"decode($z) = ($dx,$dy) != ($x,$y)")
    }
  }

  test("z-order buckets have tighter 2-d bounding boxes than row-order ranges") {
    def meanArea(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map { r =>
        (r.getAs[Long]("max_x") - r.getAs[Long]("min_x") + 1).toDouble *
          (r.getAs[Long]("max_y") - r.getAs[Long]("min_y") + 1).toDouble
      }.sum / rows.length
    val z = AnalyticQueries.queries("q99_zorder")(spark, sfDir).collect()
    // same bucket count, but ranges of the ROW order (orderkey) instead
    val orders = graft.core.Tables.orders(spark, sfDir)
    val naive = orders
      .select(col("o_orderkey"),
        (col("o_custkey") % 1024L).as("x"),
        ZOrder.bucket(col("o_totalprice"), 0.0, 1000.0).as("y"))
      .groupBy((col("o_orderkey") % lit(z.length.toLong)).as("zbucket"))
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .collect()
    val (za, na) = (meanArea(z), meanArea(naive))
    assert(za * 4 < na,
      s"z-order bbox area $za should be <1/4 of row-order $na")
  }
}
