package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming face of q294's per-label centroid-drift monitor (twin
  * #28) — the continuously maintained embedded-corpus mix dashboard.
  *
  * This is the STRICTLY bounded end of the twin spectrum: state is one
  * (n, sum) pair per `(label, pos)` coordinate plus one per label —
  * |labels|·(d+1) entries FOREVER, independent of stream length,
  * because a centroid sum is the perfectly mergeable statistic. The
  * assembly ([[assembleDrift]]) is a pure function of the counter
  * table: it feeds the exact `Similarity.centroidDriftFromSums` tail,
  * so every snapshot equals the batch q294 over the delivered prefix
  * bit for bit (same decimal dot products, same one fixed-order double
  * expression).
  *
  * Unlike the count-only twins, component sums are NOT monotone (the
  * 14-bit grid values are signed), so cumulative emissions cannot be
  * deduped with `max(sum)`. Each emission therefore carries the
  * monotone contribution count n, and the assembly keeps the row with
  * the largest n per key — (n, sum) is deterministic given n, so the
  * latest total always wins over any stale appended history.
  */
object StreamingCentroidDrift {

  /** Tag an embedding frame into per-coordinate quantized events:
    * `c|label|pos` carrying the 14-bit grid component, and one
    * `n|label` count event per vector (value 1).
    */
  def componentEvents(emb: DataFrame, vecCol: String, labelCol: String,
                      scaleBits: Int = 14): DataFrame = {
    val scale = math.pow(2.0, scaleBits)
    val comp = emb
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(concat(lit("c|"), col("label"), lit("|"), col("pos"))
          .as("k"),
        floor(col("v").cast("double") * lit(scale) + lit(0.5))
          .cast("long").as("q"))
    val cnt = emb.select(
      concat(lit("n|"), col(labelCol).cast("long")).as("k"),
      lit(1L).as("q"))
    comp.unionAll(cnt)
  }

  /** Keyed (n, sum) accumulator: per key one pair of longs of state;
    * emits the key's updated (n, sum) whenever a batch touches it.
    */
  def sums(grouped: KeyValueGroupedDataset[String, (String, Long)])(
      implicit stEnc: Encoder[(Long, Long)],
      outEnc: Encoder[(String, Long, Long)])
      : Dataset[(String, Long, Long)] = {
    val processor =
      new StatefulProcessor[String, (String, Long), (String, Long, Long)] {
        @transient private var st: ValueState[(Long, Long)] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          st = getHandle.getValueState[(Long, Long)]("ns", stEnc,
            TTLConfig.NONE)
        override def handleInputRows(key: String,
            rows: Iterator[(String, Long)],
            timers: TimerValues): Iterator[(String, Long, Long)] = {
          var (n, s) = if (st.exists()) st.get() else (0L, 0L)
          rows.foreach { r => n += 1; s += r._2 }
          st.update((n, s))
          Iterator.single((key, n, s))
        }
      }
    grouped.transformWithState(processor, TimeMode.None(),
      OutputMode.Append())
  }

  /** q294's drift report as a pure function of the (k, n, sum) counter
    * table: latest row per key via the monotone n (see the class note
    * on why `max(sum)` would be wrong), rebuild (label, pos, s) and
    * (label, n_vecs), then run the shared exact tail.
    */
  def assembleDrift(counts0: DataFrame, scaleBits: Int = 14): DataFrame = {
    val latest = counts0.groupBy(col("k"))
      .agg(max(struct(col("n"), col("s"))).as("m"))
      .select(col("k"), col("m.n").as("n"), col("m.s").as("s"))
      .transform(graft.core.Caching.persist)
    val cent = latest.where(col("k").startsWith("c|"))
      .select(split(col("k"), "\\|", 3).getItem(1).cast("long")
          .as("label"),
        split(col("k"), "\\|", 3).getItem(2).cast("int").as("pos"),
        col("s"))
    val counts = latest.where(col("k").startsWith("n|"))
      .select(split(col("k"), "\\|", 2).getItem(1).cast("long")
          .as("label"),
        col("n").as("n_vecs"))
    graft.llm.Similarity.centroidDriftFromSums(cent, counts,
      math.pow(2.0, scaleBits))
  }
}
