package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingestion face of the PQ index (q320 /
  * [[graft.llm.Pq]]) — the 37th twin: a PQ index is trained ONCE
  * (coarse quantizer + per-subspace codebooks — both bounded, both
  * shipping as task-binary literals), then vectors keep arriving; each
  * arrival coarse-assigns against the FIXED quantizer
  * ([[StreamingIvfLists.assignExpr]] — the batch tie rule) and
  * PQ-encodes against the FIXED codebooks ([[graft.llm.Pq.encodeLists]]
  * — integer-grid argmin, ties to the lower code, Σ‖c‖² precomputed),
  * appending (cid, member, codes, pnrm2) rows to the serving lists.
  *
  * Shape: the encode is a STATELESS narrow projection — arriving
  * vectors never shuffle and never join; the only stateful piece is
  * the per-list monotone counters twin #31 already maintains (state
  * bounded by the list count), so ADC serving stays continuously
  * consistent with what a batch re-encode would produce.
  *
  * Exactness contract (spec-verified on RocksDB): after any stream
  * prefix, the accumulated encoded rows equal
  * `Pq.encodeLists(ivfBuildWith(prefix).lists, cb)` row for row —
  * same assignment ties, same code ties, same exact integer norms.
  */
object StreamingPqEncode {

  /** Coarse-assign + PQ-encode arriving vectors under fixed
    * quantizer/codebooks — the batch [[graft.llm.Pq.encodeLists]] row
    * contract, as one narrow map over the stream.
    */
  def encodeArrivals(vecs: DataFrame, idCol: String, vecCol: String,
                     quantizer: Seq[(Long, Seq[Double])],
                     cb: Seq[(Int, Int, Seq[Long])]): DataFrame =
    graft.llm.Pq.encodeLists(
      vecs.select(
        StreamingIvfLists.assignExpr(
          col(vecCol).cast("array<double>"), quantizer).as("cid"),
        col(idCol).cast("long").as("member"),
        col(vecCol).cast("array<double>").as("mv")),
      cb)
}
