package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Incremental cross-document block packing — the 33rd streaming
  * twin, and the q308/q314 layout's ingestion face: the STREAMING
  * BLOCK WRITER. As encoded documents arrive (in doc_id order per
  * shard — the append-only contract any block writer has), each
  * shard's id stream concatenates and every completed `blockTokens`
  * window is emitted EXACTLY ONCE as an immutable block; the
  * under-full remainder waits in state for the next arrivals.
  *
  * State per shard is ONE (next_block_id, leftover<blockTokens ids)
  * pair — bounded by the block size, never by stream length — so an
  * unbounded corpus streams through a fixed-memory writer, RocksDB-
  * backed like every twin. Completed blocks are immutable by
  * construction (later arrivals only ever append), which is exactly
  * why the batch layout cuts at fixed global offsets: the spec pins
  * that every streamed block equals the batch
  * [[graft.llm.Packing.packTokenBlocks]] block (same id hash, same
  * block_id) at every prefix, with the batch run's per-shard TAIL
  * block equal to the state's leftover.
  *
  * The block hash is the same engine-portable md5 formula as the
  * batch side (`TextFunctions.portableHash`, seed 31), computed here
  * in plain JVM code — one digest per COMPLETED block, amortized.
  */
object StreamingBlockPacker {

  /** (shard, doc_id, ids) per arriving encoded doc (empty docs drop —
    * the [[graft.llm.Packing.packTokenBlocks]] filter).
    */
  def packEvents(enc: DataFrame, idCol: String, idsCol: String,
                 shards: Int): DataFrame = {
    require(shards >= 1, "shards >= 1")
    enc.select(col(idCol).cast("long").as("doc_id"),
        col(idsCol).as("ids"))
      .where(size(col("ids")) > 0)
      .select(pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        col("doc_id"), col("ids"))
  }

  /** The portable block hash (= `portableHash(ids.mkString(","), 31)`:
    * first 8 hex chars of md5("31|" + csv) as a long).
    */
  def blockHash(ids: Seq[Long]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("31|" + ids.mkString(","))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Keyed packer: per shard, carry (next_block_id, leftover) and emit
    * one (shard, block_id, n_ids, block_hash) row per COMPLETED block.
    * Within a micro-batch the slice is processed in doc_id order (the
    * same pure-function-of-data rule as [[StreamingUrlDedup]]), so
    * emitted blocks are a deterministic function of the delivered
    * prefix whenever arrival order is doc_id order per shard.
    */
  def packer(grouped: KeyValueGroupedDataset[Long, (Long, Long, Seq[Long])],
             blockTokens: Int)(
      implicit stEnc: Encoder[(Long, Seq[Long])],
      outEnc: Encoder[(Long, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    require(blockTokens >= 1, "blockTokens >= 1")
    val processor =
      new StatefulProcessor[Long, (Long, Long, Seq[Long]),
          (Long, Long, Long, Long)] {
        @transient private var st: ValueState[(Long, Seq[Long])] = _
        override def init(outputMode: OutputMode,
                          timeMode: TimeMode): Unit =
          st = getHandle.getValueState[(Long, Seq[Long])]("pk", stEnc,
            TTLConfig.NONE)
        override def handleInputRows(shard: Long,
            rows: Iterator[(Long, Long, Seq[Long])],
            timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
          var (nextId, leftover) =
            if (st.exists()) st.get() else (0L, Seq.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long)]
          var buf = leftover.toVector
          rows.toArray.sortBy(_._2).foreach { case (_, _, ids) =>
            buf = buf ++ ids
            while (buf.length >= blockTokens) {
              val (blk, rest) = buf.splitAt(blockTokens)
              out += ((shard, nextId, blockTokens.toLong, blockHash(blk)))
              nextId += 1
              buf = rest
            }
          }
          st.update((nextId, buf))
          out.iterator
        }
      }
    grouped.transformWithState(processor, TimeMode.None(),
      OutputMode.Append())
  }
}
