package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Stream-stream AS-OF join: for every left event, the LATEST right event
  * at or before it on the same key, within a bounded lookback — the
  * streaming twin of the batch q50 window-form as-of join, completing the
  * streaming join matrix the reference's DataStream API implies
  * (IJoinFunction.cs:18-27 joins two keyed streams; the as-of variant is
  * the one `intervalJoin` cannot express because it needs "latest", not
  * "all in range").
  *
  * Mechanics (transformWithState, event-time timers):
  *  - both sides arrive as one keyed union tagged left/right — each side
  *    watermarked BEFORE the union, so Spark aligns the query watermark
  *    to the min (the §2.7 multi-input rule);
  *  - right events buffer per key; a right older than
  *    `watermark − lookback` can never match a future left (every
  *    unprocessed left has ts ≥ watermark) and is dropped at ingress or
  *    evicted on timers — state per key is O(rate × lookback), bounded;
  *  - a left event waits until the watermark PASSES its timestamp (timer
  *    at ts+1): only then has every right with rts ≤ lts provably
  *    arrived. A left arriving already behind the watermark resolves
  *    immediately against the buffered rights (same-batch rights are
  *    folded in first) instead of being dropped;
  *  - match rule: greatest (rts, payload) with rts ≤ lts and
  *    lts − rts ≤ lookback; no candidate → (-1, null) — an explicit
  *    no-match row, not a dropped event (the reference's outer-ish
  *    enrichment contract).
  */
object StreamingAsOf {

  /** rows: (tsMs, isLeft, payload) grouped by key. Emits one row per left
    * event: (key, leftTs, leftPayload, matchTs | -1, matchPayload | null).
    */
  def asOfJoin[K](grouped: KeyValueGroupedDataset[K, (Long, Boolean, String)],
                  lookbackMs: Long)(
      implicit bufEnc: Encoder[(Long, String)],
      outEnc: Encoder[(K, Long, String, Long, String)]): Dataset[(K, Long, String, Long, String)] = {
    require(lookbackMs > 0)

    val processor = new StatefulProcessor[K, (Long, Boolean, String), (K, Long, String, Long, String)] {
      @transient private var rights: ListState[(Long, String)] = _
      @transient private var pending: ListState[(Long, String)] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        rights = getHandle.getListState[(Long, String)]("rights", bufEnc, TTLConfig.NONE)
        pending = getHandle.getListState[(Long, String)]("lefts", bufEnc, TTLConfig.NONE)
      }

      private def bestMatch(lts: Long,
                            candidates: Seq[(Long, String)]): (Long, String) =
        candidates.iterator
          .filter { case (rts, _) => rts <= lts && lts - rts <= lookbackMs }
          .reduceOption((a, b) => if (implicitly[Ordering[(Long, String)]].gt(a, b)) a else b)
          .getOrElse((-1L, null))

      override def handleInputRows(key: K, rows: Iterator[(Long, Boolean, String)],
                                   timers: TimerValues): Iterator[(K, Long, String, Long, String)] = {
        val wm = timers.getCurrentWatermarkInMs
        val (leftRows, rightRows) = rows.toSeq.partition(_._2)
        // rights first: a late left in this batch must see this batch's rights
        val liveRights = rightRows.collect {
          case (rts, _, p) if rts >= wm - lookbackMs => (rts, p)
        }
        liveRights.foreach(rights.appendValue)
        val buffered = rights.get().toIndexedSeq
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(K, Long, String, Long, String)]
        leftRows.foreach { case (lts, _, p) =>
          if (lts < wm) {
            // already behind the watermark: every matching right has
            // arrived — resolve now rather than late-drop
            val (mts, mp) = bestMatch(lts, buffered)
            out += ((key, lts, p, mts, mp))
          } else {
            pending.appendValue((lts, p))
            getHandle.registerTimer(lts + 1)
          }
        }
        out.iterator
      }

      override def handleExpiredTimer(key: K, timers: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[(K, Long, String, Long, String)] = {
        val wm = timers.getCurrentWatermarkInMs
        val (ripe, still) = pending.get().toIndexedSeq.partition(_._1 < wm)
        if (still.isEmpty) pending.clear() else pending.put(still.toArray)
        val buffered = rights.get().toIndexedSeq
        // every unprocessed left has lts ≥ wm, so rights below
        // wm − lookback are dead weight: evict (bounded state)
        val live = buffered.filter(_._1 >= wm - lookbackMs)
        if (live.size != buffered.size) {
          if (live.isEmpty) rights.clear() else rights.put(live.toArray)
        }
        ripe.sortBy(_._1).iterator.map { case (lts, p) =>
          val (mts, mp) = bestMatch(lts, buffered)
          (key, lts, p, mts, mp)
        }
      }
    }

    grouped.transformWithState(processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
