package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import graft.llm.{Domains, TextFunctions}

/** Streaming face of the q287 per-domain document caps (the 26th
  * twin): as documents arrive, each registrable domain keeps at most
  * `k` docs — the k SMALLEST hash priorities seen so far. Bounded
  * top-k is a mergeable semilattice, so per-domain state is exactly k
  * (prio, doc) pairs regardless of ingest volume or arrival order;
  * a smaller priority arriving later EVICTS a previously-kept doc,
  * which is why the consumer reads the latest snapshot (version-max
  * assembly) rather than trusting per-arrival verdicts.
  *
  * Contract notes: snapshot emission is cumulative per touching batch
  * (the [[StreamingLm]] pattern — assembly equals the batch top-k at
  * every prefix); exact re-delivery dedupes inside the merge (the
  * (prio, doc) pair set is idempotent).
  */
object StreamingDomainCaps {

  /** (domain, doc_id, prio) events; docs with no registrable domain
    * (IPs, public-suffix hosts) are exempt from caps and carry no
    * event. Priority is the q287 formula (portableHash of the id).
    */
  def events(docs: DataFrame, idCol: String, hostCol: String,
             seed: Int = 23): DataFrame =
    docs.select(
        Domains.registrableDomain(col(hostCol)).as("domain"),
        col(idCol).cast("long").as("doc_id"),
        TextFunctions.portableHash(col(idCol).cast("string"), seed)
          .as("prio"))
      .where(col("domain").isNotNull)

  /** Keyed bounded top-k processor: slots 1..k hold priorities,
    * k+1..2k the doc ids, slot 0 a monotone version. Emits the FULL
    * updated snapshot, version-tagged, whenever a batch touches the
    * domain: (domain, doc_id, prio, rnk, version).
    */
  def caps(grouped: KeyValueGroupedDataset[String, (String, Long, Long)],
           k: Int)(
      implicit mkEnc: Encoder[Int], mvEnc: Encoder[Long],
      outEnc: Encoder[(String, Long, Long, Long, Long)])
      : Dataset[(String, Long, Long, Long, Long)] = {
    require(k >= 1, s"cap must be >= 1: $k")
    KeyedStateOps.processWithMapState[String, (String, Long, Long),
        Int, Long, (String, Long, Long, Long, Long)](grouped) {
      (domain, rows, ms) =>
        val cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var i = 1
        var done = false
        while (i <= k && !done) {
          ms.get(i) match {
            case Some(p) => cur += ((p, ms.get(k + i).get)); i += 1
            case None => done = true
          }
        }
        rows.foreach { case (_, doc, prio) => cur += ((prio, doc)) }
        val top = cur.distinct.sorted.take(k)
        var j = 1
        top.foreach { case (p, d) =>
          ms.put(j, p); ms.put(k + j, d); j += 1
        }
        val ver = ms.get(0).getOrElse(0L) + 1L
        ms.put(0, ver)
        top.iterator.zipWithIndex.map { case ((p, d), idx) =>
          (domain, d, p, (idx + 1).toLong, ver)
        }
    }
  }

  /** Latest snapshot per domain — equals the batch per-domain top-k
    * (q287's marking) over everything delivered so far.
    */
  def assembleKept(snapshots: DataFrame): DataFrame = {
    val latest = snapshots.groupBy(col("domain"))
      .agg(max(col("version")).as("version"))
    // distinct: the state merge is idempotent but an at-least-once
    // output sink can re-deliver the SAME version's snapshot rows —
    // without it the assembly duplicates (domain, doc_id) pairs
    snapshots.join(latest, Seq("domain", "version"))
      .select(col("domain"), col("doc_id"), col("prio"), col("rnk"))
      .distinct()
  }
}
