package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Agreement contract for the 33rd streaming twin
  * (`StreamingBlockPacker`): at every prefix (arrivals in doc_id
  * order), the streamed COMPLETED blocks equal the batch
  * `packTokenBlocks` full blocks — same (shard, block_id, n_ids,
  * block_hash) — the batch tails are exactly the id mass still in
  * state, blocks are emitted exactly once (immutable), and state is
  * bounded by blockTokens per shard. RocksDB-backed.
  */
class StreamingBlockPackerSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("streamed blocks equal batch full blocks at every prefix on " +
      "RocksDB; blocks never re-emit; leftover mass = batch tails") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val bt = 8
      val shards = 2
      // deterministic id sequences with ragged lengths so block
      // boundaries cross documents in both shards
      def idsOf(d: Long): Seq[Long] =
        (0L until (d % 7 + 3)).map(i => d * 100 + i)
      val all = (0L until 24L).map(d => (d, idsOf(d)))
      val batches = Seq(all.slice(0, 8), all.slice(8, 15),
        all.slice(15, 24))

      val input = MemoryStream[(Long, Seq[Long])](spark)
      val grouped = graft.streaming.StreamingBlockPacker.packEvents(
          input.toDS().toDF("doc_id", "ids"), "doc_id", "ids", shards)
        .as[(Long, Long, Seq[Long])].groupByKey(_._1)
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sbp").toString
      val q = graft.streaming.StreamingBlockPacker.packer(grouped, bt)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(Long, Long, Long, Long)],
           _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      var delivered = Seq.empty[(Long, Seq[Long])]
      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val batchBlocks = graft.llm.Packing.packTokenBlocks(
            delivered.toDF("doc_id", "ids"), "doc_id", "ids",
            blockTokens = bt, shards = shards)
          .select(col("shard"), col("block_id"), col("n_ids"),
            col("block_hash"))
          .as[(Long, Long, Long, Long)].collect().toSeq
        val full = batchBlocks.filter(_._3 == bt.toLong).toSet
        assert(sink.toSet === full,
          s"prefix of ${delivered.size} docs: completed blocks differ")
        // leftover mass in state = the batch tails' mass
        val totalIds = delivered.map(_._2.length.toLong).sum
        val tails = batchBlocks.filterNot(_._3 == bt.toLong)
        assert(tails.size <= shards, "at most one tail per shard")
        assert(totalIds - sink.size.toLong * bt ===
          tails.map(_._3).sum, "state holds exactly the tail mass")
      }
      q.stop()
      // exactly-once emission: no block id appears twice per shard
      assert(sink.map(b => (b._1, b._2)).distinct.size === sink.size)
      // dense block ids per shard from 0
      sink.groupBy(_._1).foreach { case (_, bs) =>
        assert(bs.map(_._2).sorted === (0L until bs.length).toSeq)
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("out-of-order packer (twin #34): blocks equal batch under " +
      "SHUFFLED cross-batch arrival (empty doc included) on RocksDB; " +
      "already-emitted blocks are a prefix at every step; duplicate " +
      "replay raises") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val bt = 8
      val shards = 2
      def idsOf(d: Long): Seq[Long] =
        if (d == 6L) Seq.empty // the empty doc: advances the frontier
        else (0L until (d % 7 + 3)).map(i => d * 100 + i)
      val all = (0L until 24L).map(d => (d, idsOf(d)))
      // shuffled delivery that crosses batch boundaries out of order
      val rnd = new scala.util.Random(99)
      val shuffled = rnd.shuffle(all)
      val batches = Seq(shuffled.slice(0, 9), shuffled.slice(9, 16),
        shuffled.slice(16, 24))

      val input = MemoryStream[(Long, Seq[Long])](spark)
      val grouped = graft.streaming.StreamingBlockPacker.packEventsAll(
          input.toDS().toDF("doc_id", "ids"), "doc_id", "ids", shards)
        .as[(Long, Long, Seq[Long])].groupByKey(_._1)
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sbp-ooo").toString
      val q = graft.streaming.StreamingBlockPacker
        .packerOoo(grouped, bt, shards)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(Long, Long, Long, Long)],
           _: Long) =>
            sink ++= b.collect()
            ()
        }.start()

      // the final batch layout (empty doc drops there by the filter)
      val finalBlocks = graft.llm.Packing.packTokenBlocks(
          all.toDF("doc_id", "ids"), "doc_id", "ids",
          blockTokens = bt, shards = shards)
        .select(col("shard"), col("block_id"), col("n_ids"),
          col("block_hash"))
        .as[(Long, Long, Long, Long)].collect().toSeq
      val finalFull = finalBlocks.filter(_._3 == bt.toLong).toSet

      batches.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        // everything emitted so far is a correct, immutable prefix of
        // the final layout — dense block ids per shard
        assert(sink.toSet.subsetOf(finalFull),
          "no emitted block may differ from the final batch layout")
        sink.groupBy(_._1).foreach { case (_, bs) =>
          assert(bs.map(_._2).sorted === (0L until bs.length).toSeq)
        }
      }
      // after full delivery: exactly the batch full blocks, once each
      assert(sink.toSet === finalFull,
        "all completed blocks emitted once the set is delivered")
      assert(sink.map(b => (b._1, b._2)).distinct.size === sink.size)
      // leftover in state = exactly the batch tails' mass (the
      // reorder buffer has fully drained — state is bounded)
      val totalIds = all.map(_._2.length.toLong).sum
      val tails = finalBlocks.filterNot(_._3 == bt.toLong)
      assert(totalIds - sink.size.toLong * bt === tails.map(_._3).sum)
      // duplicate replay fails loudly instead of corrupting blocks
      input.addData((3L, Seq(1L, 2L)))
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(Option(ex.getMessage).getOrElse("")
          .contains("duplicate or replayed doc_id") ||
        ex.getCause != null,
        "replayed id must abort the query")
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
