package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 22nd streaming twin (`StreamingLm`):
  * the incrementally counted LM assembles, at every stream prefix, to
  * exactly the weight table an independent brute-force build derives
  * from the same prefix, and scoring the full fixture against the
  * final snapshot reproduces batch q261 bit for bit.
  */
class StreamingLmSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def bruteWeights(docs: Seq[(Long, String, Seq[String])])
      : Map[(String, String, String), Long] = {
    val eligible = docs.filter(_._3.length >= 2)
    val uni = eligible.flatMap { case (_, lang, t) => t.map((lang, _)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val utot = uni.groupBy(_._1._1).map { case (lang, m) =>
      lang -> (m.values.sum, m.size.toLong)
    }
    val bc = eligible.flatMap { case (_, lang, t) =>
      t.sliding(2).map(p => (lang, p(0), p(1)))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ctx = bc.groupBy { case ((lang, u, _), _) => (lang, u) }
      .map { case (k, m) => k -> m.values.sum }
    bc.keys.map { case key @ (lang, u, w) =>
      val p = 0.75 * (bc(key).toDouble / ctx((lang, u)).toDouble) +
        0.25 * ((uni((lang, w)) + 1).toDouble /
          (utot(lang)._1 + utot(lang)._2).toDouble)
      key -> Math.round(-(Math.log(p) / Math.log(2.0)) * 1e6)
    }.toMap
  }

  test("streaming LM counters assemble to the brute-force weight table " +
      "at every prefix and reproduce batch q261 at the end") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"),
          graft.llm.TextFunctions.tokens(col("text")).as("t"), col("text"))
        .as[(Long, String, Seq[String], String)].collect().toSeq
      val batches = docs.grouped((docs.size + 2) / 3).toSeq
      val input = MemoryStream[(String, String)](spark) // (lang, text)
      val events = graft.streaming.StreamingLm.countEvents(
        input.toDS().toDF("lang", "text"), "text", "lang")
      val grouped = events.as[String].groupByKey(identity)
      val sink = scala.collection.mutable.Map.empty[String, Long]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-slm").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            b.collect().foreach { case (k, n) => sink(k) = n }
            ()
        }.start()
      var delivered = Seq.empty[(Long, String, Seq[String])]
      batches.foreach { batch =>
        input.addData(batch.map(d => (d._2, d._4)): _*)
        q.processAllAvailable()
        delivered ++= batch.map(d => (d._1, d._2, d._3))
        val assembled = graft.streaming.StreamingLm.assembleWeights(
            sink.toSeq.toDF("k", "n"))
          .as[(String, String, String, Long)].collect()
          .map { case (lang, u, w, mb) => (lang, u, w) -> mb }.toMap
        val expected = bruteWeights(delivered)
        assert(assembled === expected,
          s"prefix of ${delivered.size} docs: weight tables differ")
      }
      q.stop()
      // final snapshot scores the whole fixture exactly like batch q261
      val weights = graft.streaming.StreamingLm.assembleWeights(
          sink.toSeq.toDF("k", "n"))
        .as[(String, String, String, Long)].collect()
        .map { case (lang, u, w, mb) => (lang, u, w) -> mb }.toMap
      val batchQ = SparkEntry.queries("q261_bigram_perplexity")(spark, sfDir)
        .select(col("doc_id"), col("total_microbits"))
        .as[(Long, Long)].collect().toMap
      val scored = delivered.filter(_._3.length >= 2).map { case (id, lang, t) =>
        id -> t.sliding(2).map(p => weights((lang, p(0), p(1)))).sum
      }.toMap
      assert(scored === batchQ)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("assembleWeights dedupes the RAW appended counter table: " +
      "cumulative per-batch rows collapse to the latest total") {
    val latest = Seq(("u|en|a", 3L), ("u|en|b", 2L), ("b|en|a b", 2L),
        ("b|en|b a", 1L)).toDF("k", "n")
    // append-mode sink history: earlier cumulative totals still present
    val appended = Seq(("u|en|a", 1L), ("u|en|a", 2L), ("u|en|a", 3L),
        ("u|en|b", 2L), ("b|en|a b", 1L), ("b|en|a b", 2L),
        ("b|en|b a", 1L)).toDF("k", "n")
    def tab(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingLm.assembleWeights(df).collect()
        .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
          r.getLong(3))).toMap
    val a = tab(latest)
    val b = tab(appended)
    assert(a === b, "raw appended table must not inflate the LM")
    assert(a.nonEmpty)
  }

  test("KN assembly over the SAME counter stream matches a brute-force " +
      "KN weight table at every prefix and reproduces batch q277") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        graft.llm.TextFunctions.tokens(col("text")).as("t"))
      .as[(Long, String, Seq[String])].collect().toSeq
    def bruteKn(prefix: Seq[(Long, String, Seq[String])])
        : Map[(String, String, String), Long] = {
      val bs = prefix.filter(_._3.length >= 2).flatMap { case (_, l, t) =>
        t.sliding(2).map(p => (l, p(0), p(1)))
      }
      val bc = bs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val cc = bc.groupBy { case ((l, u, _), _) => (l, u) }
        .map { case (k, m) => k -> m.values.sum }
      val nfu = bc.groupBy { case ((l, u, _), _) => (l, u) }
        .map { case (k, m) => k -> m.size.toLong }
      val npw = bc.groupBy { case ((l, _, w), _) => (l, w) }
        .map { case (k, m) => k -> m.size.toLong }
      val nbb = bc.groupBy { case ((l, _, _), _) => l }
        .map { case (k, m) => k -> m.size.toLong }
      bc.keys.map { case k @ (l, u, w) =>
        val p = (math.max(bc(k).toDouble - 0.75, 0.0) +
          0.75 * nfu((l, u)).toDouble *
            (npw((l, w)).toDouble / nbb(l).toDouble)) / cc((l, u)).toDouble
        k -> Math.round(-(math.log(p) / math.log(2.0)) * 1e6)
      }.toMap
    }
    // replay the counter stream in 3 batches through a plain map-sink
    // (the counter processor itself is already spec-covered above; the
    // KN face only adds assembly, which is what this pins)
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    val sink = scala.collection.mutable.Map.empty[String, Long]
    var delivered = Seq.empty[(Long, String, Seq[String])]
    batches.foreach { batch =>
      // batch-side counter increment (equivalent to the processor: one
      // monotone long per b| key; u| keys are irrelevant to KN)
      batch.filter(_._3.length >= 2).foreach { case (_, lang, t) =>
        t.sliding(2).foreach { p =>
          val k = s"b|$lang|${p(0)} ${p(1)}"
          sink(k) = sink.getOrElse(k, 0L) + 1L
        }
      }
      delivered ++= batch
      val assembled = graft.streaming.StreamingLm.assembleKnWeights(
          sink.toSeq.toDF("k", "n"))
        .as[(String, String, String, Long)].collect()
        .map { case (l, u, w, mb) => (l, u, w) -> mb }.toMap
      assert(assembled === bruteKn(delivered),
        s"prefix of ${delivered.size} docs: KN weight tables differ")
    }
    // final snapshot scores the whole fixture exactly like batch q277
    val weights = graft.streaming.StreamingLm.assembleKnWeights(
        sink.toSeq.toDF("k", "n"))
      .as[(String, String, String, Long)].collect()
      .map { case (l, u, w, mb) => (l, u, w) -> mb }.toMap
    val batchQ = graft.queries.CurationQueries
      .queries("q277_kn_perplexity")(spark, sfDir)
      .select(col("doc_id"), col("total_microbits"))
      .as[(Long, Long)].collect().toMap
    val scored = delivered.filter(_._3.length >= 2)
      .map { case (id, lang, t) =>
        id -> t.sliding(2).map(p => weights((lang, p(0), p(1)))).sum
      }.toMap
    assert(scored === batchQ)
  }

  test("streamed per-doc counters assemble to the EXACT batch q293 " +
      "tercile report at every prefix (twin #27, RocksDB)") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)].collect().toSeq
      val batches = docs.grouped((docs.size + 2) / 3).toSeq
      val input = MemoryStream[(Long, String, String)](spark)
      val events = graft.streaming.StreamingLm.bucketEvents(
        input.toDS().toDF("doc_id", "lang", "text"),
        "doc_id", "text", "lang")
      val grouped = events.as[String].groupByKey(identity)
      val sink = scala.collection.mutable.Map.empty[String, Long]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-spb").toString
      val q = graft.streaming.StreamingLm.counters(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
            b.collect().foreach { case (k, n) => sink(k) = n }
            ()
        }.start()
      def tab(df: org.apache.spark.sql.DataFrame) = df
        .select(col("lang"), col("bucket"), col("n_docs"), col("tokens"),
          col("sum_microbits"), col("mean_bits"))
        .as[(String, String, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
      var delivered = Seq.empty[(Long, String, String)]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val assembled = tab(graft.streaming.StreamingLm.assembleBuckets(
          sink.toSeq.toDF("k", "n")))
        val expected = tab(graft.llm.LmScore.perplexityBuckets(
          delivered.toDF("doc_id", "lang", "text"),
          "doc_id", "text", "lang"))
        assert(assembled === expected,
          s"prefix of ${delivered.size} docs: bucket reports differ")
      }
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
