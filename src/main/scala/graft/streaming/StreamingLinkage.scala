package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DeletionBandExpr

/** Online record linkage: a stream of arriving records matched against
  * a STATIC reference corpus through the same ≤2-deletion band the
  * batch linkage family (q166/q175) blocks on.
  *
  * Shape: the reference side is banded ONCE (id, blockCols..., band
  * hash — the `Linkage.candidatePairs` key table, precomputed exactly
  * like an LSH index build) and the stream side bands each arriving
  * record inside its micro-batch; the match is a stream-static
  * equi-join, which Structured Streaming executes STATELESSLY per batch
  * — no watermark, no state store, the reference index is just a
  * broadcast/shuffle build side. Exact Levenshtein + the integer-cents
  * band then confirm candidates, so completeness for lev ≤ 2 carries
  * over from the batch argument verbatim.
  *
  * This is the streaming face the Fellegi–Sunter pipeline actually
  * deploys: the corpus is matched offline (batch q166), NEW records
  * link online as they arrive. Emitted links for a stream prefix equal
  * the batch cross-linkage of (prefix × reference) — the spec's claim.
  */
object StreamingLinkage {

  /** Precompute the reference side's band index: (blockCols..., band,
    * ref_id, ref_name, ref_cents). Persist/write this once per corpus
    * version, like any LSH index.
    */
  def referenceIndex(ref: DataFrame, idCol: String, nameCol: String,
                     centsCol: String, blockCols: Seq[String]): DataFrame =
    ref.select(blockCols.map(col) :+ col(idCol).as("ref_id") :+
        col(nameCol).as("ref_name") :+ col(centsCol).as("ref_cents"): _*)
      .withColumn("band", explode(DeletionBandExpr(col("ref_name"))))

  /** Link a record frame against a prebuilt reference index. Drive the
    * streaming form via `foreachBatch(b => sink(link(b, index, …)))`:
    * each stream record is processed in exactly one micro-batch, so
    * per-batch linking is stateless and complete, and the in-batch
    * `dropDuplicates` (collapsing multi-band candidate hits) never
    * needs cross-batch state. (A naive streaming `dropDuplicates` in
    * the plan would grow unbounded pair state — exactly what this
    * shape avoids.) Emits one row per confirmed link:
    * (id, ref_id, lev, score) with q166's scoring rule.
    */
  def link(stream: DataFrame, index: DataFrame, idCol: String,
           nameCol: String, centsCol: String,
           blockCols: Seq[String]): DataFrame = {
    val banded = stream
      .select(blockCols.map(col) :+ col(idCol).as("id") :+
        col(nameCol).as("name") :+ col(centsCol).as("cents"): _*)
      .withColumn("band", explode(DeletionBandExpr(col("name"))))
    banded.join(index, blockCols :+ "band")
      .where(col("id") =!= col("ref_id"))
      .select(col("id"), col("ref_id"), col("name"), col("ref_name"),
        col("cents"), col("ref_cents"))
      .dropDuplicates("id", "ref_id")
      .withColumn("lev", levenshtein(col("name"), col("ref_name")))
      .withColumn("score",
        when(col("lev") <= 2, lit(2)).otherwise(lit(0)) +
        when(abs(col("cents") - col("ref_cents")) < 50000L, lit(1))
          .otherwise(lit(0)))
      .where(col("score") >= 2)
      .select(col("id"), col("ref_id"), col("lev"), col("score"))
  }
}
