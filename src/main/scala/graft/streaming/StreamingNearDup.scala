package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Streaming MinHash-LSH near-duplicate detection — the streaming face of
  * [[graft.llm.Dedup.nearDuplicatePairs]]'s bucket self-join, for dedup
  * against everything already ingested rather than within one batch.
  *
  * Each arriving document is banded with the SAME column expressions as
  * the batch path (`Dedup.bandMembership`, a narrow map — the only
  * shuffle is the keyBy that routes band rows to their bucket's state
  * partition), and every LSH bucket keeps a roster of resident doc ids in
  * MapState. A new arrival emits one candidate pair per resident, then
  * joins the roster.
  *
  * Bounded state on an unbounded stream: rosters cap at `maxBucket`. An
  * over-full bucket pairs each newcomer against the bucket's min-id
  * REPRESENTATIVE only and does not grow — the [[graft.llm.LshGuard]]
  * star-cap semantics carried to streams, so per-bucket state is
  * O(maxBucket) forever and a degenerate bucket (boilerplate flood)
  * cannot accumulate quadratic emission or unbounded storage.
  *
  * Emits (doc_a, doc_b), doc_a < doc_b, at-least-once: a pair sharing
  * several bands emits once per shared band, and replayed batches can
  * re-emit (candidates are idempotent facts — exactly-once consumers
  * dedupe downstream, e.g. `dropDuplicatesWithinWatermark`). Exact
  * Jaccard confirmation stays downstream of candidate generation, as in
  * batch.
  */
object StreamingNearDup {

  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, k: Int = 8, bands: Int = 4,
                     maxBucket: Int = 10000): Dataset[(Long, Long)] =
    candidatePairsFromBands(
      Dedup.bandMembership(docs, idCol, textCol, shingleN, k, bands)
        .withColumn("bucket", col("bucket").cast("string")),
      idCol, maxBucket)

  /** Streaming near-dup over EMBEDDING streams: the same bounded bucket
    * rosters, fed by hyperplane band buckets
    * ([[graft.llm.Similarity.hyperplaneBandBuckets]]) instead of minhash
    * bands — dedup a vector stream against everything already ingested.
    */
  def embeddingCandidatePairs(emb: DataFrame, idCol: String, vecCol: String,
                              bands: Int, planesPerBand: Int, dims: Int,
                              maxBucket: Int = 10000): Dataset[(Long, Long)] = {
    import graft.llm.Similarity
    val banded = emb
      .select(col(idCol).as("doc_id"),
        posexplode(Similarity.hyperplaneBandBuckets(
          col(vecCol).cast("array<double>"), bands, planesPerBand, dims)))
      .toDF("doc_id", "band", "bucket")
      .withColumn("bucket", col("bucket").cast("string"))
    candidatePairsFromBands(banded, idCol, maxBucket)
  }

  /** Core of both fronts: (doc_id, band, bucket) membership rows — from
    * ANY banding that is narrow/streaming-safe — keyed to per-bucket
    * roster state. `idCol` names the ORIGINAL id column (for the
    * integral-type check); the membership frame itself must already call
    * it `doc_id`.
    */
  def candidatePairsFromBands(membership: DataFrame, idCol: String,
                              maxBucket: Int): Dataset[(Long, Long)] = {
    require(maxBucket >= 1)
    // integral ids only: a silent cast("long") would turn e.g. UUID
    // strings into NULLs and kill the query inside the tuple encoder
    // mid-stream — fail the contract at construction instead
    locally {
      import org.apache.spark.sql.types._
      membership.schema("doc_id").dataType match {
        case LongType | IntegerType | ShortType | ByteType => ()
        case other => throw new IllegalArgumentException(
          s"StreamingNearDup needs an integral id column; $idCol is $other")
      }
    }
    val spark = membership.sparkSession
    import spark.implicits._
    val banded = membership
      .select(col("doc_id").cast("long"), col("band").cast("int"),
        col("bucket"))
      .as[(Long, Int, String)]
    val grouped = banded.groupByKey(r => (r._2, r._3))
    KeyedStateOps.processWithMapState[(Int, String), (Long, Int, String),
        Long, Long, (Long, Long)](grouped) { (_, rows, ms) =>
      val resident = scala.collection.mutable.TreeSet.empty[Long]
      ms.keys().foreach(resident += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      // sorted slice: emission order (and which doc becomes the capped
      // bucket's last resident) is deterministic per batch
      rows.map(_._1).toArray.distinct.sorted.foreach { d =>
        if (!resident.contains(d)) {
          if (resident.size < maxBucket) {
            resident.foreach(r =>
              out += ((math.min(r, d), math.max(r, d))))
            resident += d
            ms.put(d, 1L)
          } else {
            val rep = resident.head
            out += ((math.min(rep, d), math.max(rep, d)))
          }
        }
      }
      out.iterator
    }
  }
}
