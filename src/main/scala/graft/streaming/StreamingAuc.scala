package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming face of q249's tie-aware ROC AUC: a continuously updated
  * "does this cheap score separate the classes" monitor over an
  * unbounded labeled stream.
  *
  * Same decomposition as `StreamingActives.wauDeltas`: the STATEFUL
  * half is trivially mergeable — per-SCORE (n_pos, n_neg) counters,
  * keyed and distributed by score value, two longs of state per
  * distinct score (the score domain is bounded: token counts, quantized
  * quality grades, …) — and the AUC assembly runs consumer-side over
  * that bounded counter table with exactly q249's math (doubled
  * Mann–Whitney numerator over ordered score pairs, half-credit ties,
  * one final division). Nothing corpus-sized is ever held or shuffled:
  * state is Σ|distinct scores| longs and the assembly input has one row
  * per distinct score.
  *
  * Exactness contract (spec-verified): after any prefix of batches, the
  * assembled AUC equals batch q249 run over the same prefix — counter
  * merging is addition, and AUC is a pure function of the counter
  * table. The input must be effectively-once (Structured Streaming's
  * checkpointed delivery; an at-least-once source needs an upstream
  * `dropDuplicatesWithinWatermark` on the document id, as in
  * `StreamingActives.dau`).
  */
object StreamingAuc {

  /** rows: (score, isPositive). Emits each score's updated
    * (score, n_pos, n_neg) whenever a batch touches it.
    */
  def scoreCounts(grouped: KeyValueGroupedDataset[Long, (Long, Boolean)])(
      implicit stEnc: Encoder[(Long, Long)],
      outEnc: Encoder[(Long, Long, Long)]): Dataset[(Long, Long, Long)] = {

    val processor =
      new StatefulProcessor[Long, (Long, Boolean), (Long, Long, Long)] {
        @transient private var st: ValueState[(Long, Long)] = _

        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          st = getHandle.getValueState[(Long, Long)](
            "posneg", stEnc, TTLConfig.NONE)

        override def handleInputRows(key: Long,
            rows: Iterator[(Long, Boolean)],
            timers: TimerValues): Iterator[(Long, Long, Long)] = {
          var (np, nn) = if (st.exists()) st.get() else (0L, 0L)
          rows.foreach { r => if (r._2) np += 1 else nn += 1 }
          st.update((np, nn))
          Iterator.single((key, np, nn))
        }
      }

    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** q249's assembly over any (sv, np, nn) per-score counter table —
    * the consumer-side half. Bounded: |distinct scores|² pair terms,
    * exact decimal until the one division.
    */
  def aucOf(counts: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val a = counts.select(col("sv").as("sa"), col("np").as("npa"))
    val b = counts.select(col("sv").as("sb"), col("nn").as("nnb"))
    val gt = a.join(broadcast(b), col("sa") > col("sb"))
      .agg(sum(dec(col("npa")) * col("nnb")).as("u"))
    val eq = counts.agg(sum(dec(col("np")) * col("nn")).as("e"))
    val tots = counts.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn"))
    gt.crossJoin(broadcast(eq)).crossJoin(broadcast(tots))
      .select(col("tp").cast("long").as("n_pos"),
        col("tn").cast("long").as("n_neg"),
        ((lit(2) * coalesce(col("u"), lit(0).cast("decimal(38,0)"))
          + col("e")).cast("double")
          / (lit(2) * dec(col("tp")) * col("tn")).cast("double")).as("auc"))
  }
}
