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

  /** [[packEvents]] WITHOUT the empty-doc filter — the out-of-order
    * packer's input shape: an empty document must still ARRIVE so its
    * shard's doc_id frontier can advance past it (the frontier cannot
    * distinguish a missing id that is empty from one that is late;
    * the batch layout drops it, and appending zero ids preserves that).
    */
  def packEventsAll(enc: DataFrame, idCol: String, idsCol: String,
                    shards: Int): DataFrame = {
    require(shards >= 1, "shards >= 1")
    enc.select(col(idCol).cast("long").as("doc_id"),
        col(idsCol).as("ids"))
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

  /** OUT-OF-ORDER-tolerant packer — the 34th streaming twin: [[packer]]
    * requires doc_id-ordered arrival per shard (a crawl that delivers
    * doc 9 before doc 7 across a micro-batch boundary would silently
    * produce different blocks than batch); this variant holds arrivals
    * ABOVE the contiguous doc_id frontier in a per-shard reorder buffer
    * and consumes them in id order the moment the frontier reaches
    * them, so emitted blocks are a pure function of the delivered SET —
    * prefix-exact vs batch [[graft.llm.Packing.packTokenBlocks]] under
    * ANY cross-batch arrival order.
    *
    * Contract: each shard's doc_ids are the arithmetic progression
    * shard, shard+shards, … (dense corpus ids — the [[packEventsAll]]
    * routing) and every id eventually arrives, EMPTY DOCUMENTS
    * INCLUDED (they advance the frontier and append nothing — the
    * batch filter's behavior). A duplicate or below-frontier replay
    * raises instead of corrupting blocks (the batch side's loud
    * duplicate guard).
    *
    * State per shard = (frontier, next_block_id, <blockTokens
    * leftover, pending map) — pending is bounded by the DISORDER
    * WINDOW (max ids in flight between the frontier and the newest
    * arrival), never by stream length.
    */
  def packerOoo(grouped: KeyValueGroupedDataset[Long, (Long, Long, Seq[Long])],
                blockTokens: Int, shards: Int)(
      implicit stEnc: Encoder[(Long, Long, Seq[Long], Seq[(Long, Seq[Long])])],
      outEnc: Encoder[(Long, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    require(blockTokens >= 1 && shards >= 1, "blockTokens, shards >= 1")
    val processor =
      new StatefulProcessor[Long, (Long, Long, Seq[Long]),
          (Long, Long, Long, Long)] {
        // pending rides as an array of (doc_id, ids) structs (the state
        // encoder takes no MapType); the disorder window stays small,
        // so the linear scans below cost nothing
        @transient private var st
            : ValueState[(Long, Long, Seq[Long], Seq[(Long, Seq[Long])])] = _
        override def init(outputMode: OutputMode,
                          timeMode: TimeMode): Unit =
          st = getHandle.getValueState[
            (Long, Long, Seq[Long], Seq[(Long, Seq[Long])])]("pko", stEnc,
            TTLConfig.NONE)
        override def handleInputRows(shard: Long,
            rows: Iterator[(Long, Long, Seq[Long])],
            timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
          var (frontier, nextId, leftover, pend0) =
            if (st.exists()) st.get()
            else (shard, 0L, Seq.empty[Long],
              Seq.empty[(Long, Seq[Long])])
          val pending =
            scala.collection.mutable.LinkedHashMap(pend0: _*)
          rows.foreach { case (_, d, ids) =>
            require(d >= frontier && !pending.contains(d),
              s"duplicate or replayed doc_id $d (shard $shard " +
                s"frontier $frontier)")
            pending += d -> ids
          }
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long)]
          var buf = leftover.toVector
          while (pending.contains(frontier)) {
            buf = buf ++ pending(frontier)
            pending -= frontier
            while (buf.length >= blockTokens) {
              val (blk, rest) = buf.splitAt(blockTokens)
              out += ((shard, nextId, blockTokens.toLong, blockHash(blk)))
              nextId += 1
              buf = rest
            }
            frontier += shards
          }
          st.update((frontier, nextId, buf,
            pending.toSeq.sortBy(_._1)))
          out.iterator
        }
      }
    grouped.transformWithState(processor, TimeMode.None(),
      OutputMode.Append())
  }
}
