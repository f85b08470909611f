package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.llm.Domains

/** Streaming URL-level dedup — the streaming face of q285's
  * canonicalize→first-occurrence pass, and the natural ingestion face
  * of an incremental crawl: as pages arrive, each CANONICAL URL
  * ([[graft.llm.Domains.canonicalUrl]] — case, www, default ports,
  * fragments, trailing slashes, percent-escapes, tracking params,
  * param order) is kept iff it has never been seen before, so re-crawls
  * and byte-different spellings of one URL never enter the corpus
  * twice.
  *
  * Canonicalization is the SAME narrow column expression as the batch
  * path — no pre-shuffle; the only shuffle is the keyBy routing
  * canonical URLs to their state partition. Per-key state is ONE long
  * (the keeper's doc_id), so total state is one entry per DISTINCT
  * canonical URL — the honest cost of global first-occurrence
  * semantics, backed by RocksDB at scale exactly like the chunk-dedup
  * twin ([[StreamingChunkDedup]]). URLs with no parseable host
  * (canonical null) cannot be deduped by URL and are emitted kept with
  * a null canon — the caller's content-level dedup stages cover them.
  *
  * Replay-stable: the keeper is pinned in state, so a re-delivered
  * micro-batch re-emits the SAME kept flags; agreement with the batch
  * min-doc_id marking holds at every prefix when ingestion follows
  * doc_id order (the StreamingUrlDedupSpec contract).
  */
object StreamingUrlDedup {

  /** (doc_id, canon) for every arriving doc (canon null when the URL
    * has no parseable host).
    */
  def events(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      Domains.canonicalUrl(col(urlCol)).as("canon"))

  /** (doc_id, canon, kept) for every arriving doc. */
  def markUrls(docs: DataFrame, idCol: String, urlCol: String)
      : Dataset[(Long, String, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ev = events(docs, idCol, urlCol)
      .as[(Long, Option[String])]
    // null canon -> not URL-dedupable, always kept. Keyed on a SALTED
    // sentinel (NUL + doc_id mod 1024 — a real canonical URL always
    // starts with its scheme letter, never NUL) so a crawl's
    // unparseable-URL mass
    // spreads over 1024 state keys instead of hot-spotting one
    // partition; the sentinel branch never touches state
    val grouped = ev.groupByKey {
      case (id, None) => "\u0000" + (id % 1024)
      case (_, Some(c)) => c
    }
    KeyedStateOps.processWithMapState[String, (Long, Option[String]),
        Int, Long, (Long, String, Boolean)](grouped) { (canon, rows, ms) =>
      if (canon.startsWith("\u0000")) {
        rows.map { case (id, _) => (id, null: String, true) }
      } else {
        var keeper = ms.get(0)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, Boolean)]
        // min-doc_id-first within the slice: the keeper of a
        // multi-arrival batch is a pure function of the data, matching
        // the batch marking's min() when the batch IS the corpus
        rows.toArray.sortBy(_._1).foreach { case (id, _) =>
          val kept = keeper match {
            case None => ms.put(0, id); keeper = Some(id); true
            case Some(k) => k == id // replayed keeper row stays kept
          }
          out += ((id, canon, kept))
        }
        out.iterator
      }
    }
  }

  /** Batch twin of the marking over a delivered prefix: kept iff the
    * doc has the MIN doc_id of its canonical bucket (null canon always
    * kept) — what q285's canonicalize→first-occurrence recipe marks
    * ([[graft.llm.Domains.urlDedupMark]], shared with the
    * TrainingDataPipeline stage 0u).
    */
  def batchMark(docs: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    Domains.urlDedupMark(docs, idCol, urlCol)
}
