package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, size}
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 22nd streaming twin: the incrementally
  * maintained AUC equals (a) a brute-force pairwise reference over
  * every stream prefix, and (b) the batch q249 output exactly once the
  * stream has delivered the whole fixture.
  */
class StreamingAucSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Long, Boolean)]): (Long, Long, Double) = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var num2 = BigInt(0)
    pos.foreach(p => neg.foreach(q =>
      if (p > q) num2 += 2 else if (p == q) num2 += 1))
    (pos.length.toLong, neg.length.toLong,
      num2.toDouble / (2.0 * pos.length.toDouble * neg.length.toDouble))
  }

  test("aucOf on a single-score corpus coalesces the empty ordered-pair " +
      "join to the tie half-credit (batch q249 shares this assembly)") {
    // the sa > sb join is empty, so sum() is null without the
    // coalesce; the degenerate AUC is e / (2·tp·tn) = 0.5 exactly
    // (tie half-credit), the same on both faces — q249's batch body
    // now calls this very assembly, so the agreement is structural
    val counts = Seq((42L, 3L, 5L)).toDF("sv", "np", "nn")
    val r = graft.streaming.StreamingAuc.aucOf(counts).collect()(0)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 5L)
    assert(!r.isNullAt(r.fieldIndex("auc")), "auc must not be null")
    assert(r.getAs[Double]("auc") === 0.5)
    val (tp, tn, ref) = bruteAuc(
      Seq.fill(3)((42L, true)) ++ Seq.fill(5)((42L, false)))
    assert((tp, tn) === (3L, 5L))
    assert(r.getAs[Double]("auc") === ref)
  }

  test("streaming AUC equals brute force at every prefix and batch q249 " +
      "at the end") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(size(graft.llm.TextFunctions.tokens(col("text")))
          .cast("long").as("s"), (col("lang") === "en").as("pos"))
        .as[(Long, Boolean)].collect().toSeq
      val batches = docs.grouped((docs.size + 2) / 3).toSeq
      val input = MemoryStream[(Long, Boolean)](spark)
      val grouped = input.toDS().groupByKey(_._1)
      val sink = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sauc").toString
      val q = graft.streaming.StreamingAuc.scoreCounts(grouped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
            b.collect().foreach { case (sv, np, nn) =>
              sink(sv) = (np, nn)
            }
            ()
        }.start()
      var delivered = Seq.empty[(Long, Boolean)]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val asm = graft.streaming.StreamingAuc.aucOf(
          sink.toSeq.map { case (sv, (np, nn)) => (sv, np, nn) }
            .toDF("sv", "np", "nn")).collect()(0)
        val (tp, tn, ref) = bruteAuc(delivered)
        assert(asm.getAs[Long]("n_pos") === tp)
        assert(asm.getAs[Long]("n_neg") === tn)
        assert(math.abs(asm.getAs[Double]("auc") - ref) < 1e-12,
          s"prefix of ${delivered.size} rows")
      }
      q.stop()
      // whole-fixture agreement with the batch query, value-exact
      val asm = graft.streaming.StreamingAuc.aucOf(
        sink.toSeq.map { case (sv, (np, nn)) => (sv, np, nn) }
          .toDF("sv", "np", "nn")).collect()(0)
      val batch = SparkEntry.queries("q249_auc_length")(spark, sfDir)
        .collect()(0)
      assert(asm.getAs[Long]("n_pos") === batch.getAs[Long]("n_pos"))
      assert(asm.getAs[Long]("n_neg") === batch.getAs[Long]("n_neg"))
      assert(asm.getAs[Double]("auc") === batch.getAs[Double]("auc"))
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
