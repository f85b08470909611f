package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: assign documents to fixed
  * token-budget chunks (the standard concat-and-chunk formulation — docs
  * are laid out in a deterministic order and cut every `tokenBudget`
  * tokens, so chunk membership is a pure function of the corpus).
  *
  * Scale design: packing is inherently sequential WITHIN a stream of
  * documents, so the corpus is sharded first — (lang, doc_id % shards) —
  * and each shard packs independently. Shard count scales with corpus
  * size; the per-shard running sum is one window over a hash-partitioned,
  * locally-sorted shard (Spark's window sort spills), never a global sort.
  * Downstream loaders consume (lang, shard, chunk_id) groups.
  */
object Packing {

  /** One row per doc: (doc_id, lang, shard, tok_count, chunk_id).
    * chunk_id = which `tokenBudget`-sized chunk the document STARTS in,
    * per (lang, shard), docs ordered by id.
    */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
                 langCol: String, tokenBudget: Int, shards: Int): DataFrame = {
    require(tokenBudget > 0 && shards > 0)
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        TextFunctions.tokenCount(col(textCol)).as("tok_count"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("chunk_id",
        floor((sum(col("tok_count")).over(w) - col("tok_count"))
          / lit(tokenBudget.toLong)))
  }
}
