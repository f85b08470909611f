package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifetime for the intermediate tables graft operators persist
  * (VERDICT r7 #4).
  *
  * Several operators MATERIALIZE an intermediate before a self-join —
  * LSH signature tables, deletion-band tables, candidate shingle
  * subsets — because recomputing it per join side is the measured
  * dominant cost. Inside the Verify/Bench harnesses those caches are
  * released by the harness-level `clearCache` contract; a long-lived
  * production session composing operators would instead accumulate
  * them. `scoped { ... }` makes the contract self-enforcing: every
  * operator persist acquired while the scope is active is unpersisted
  * when it exits, success or failure.
  *
  * {{{
  * val clusters = Caching.scoped {
  *   Dedup.nearDuplicatePairs(docs, "id", "text").collect()
  * } // ← all band/signature caches released here
  * }}}
  *
  * The scope body must FULLY CONSUME its results (collect/write/count):
  * a lazy DataFrame evaluated after the scope exits recomputes the
  * released intermediates — still correct, no longer cached. Without an
  * active scope, `persist` is exactly `df.persist(MEMORY_AND_DISK)`:
  * the harness contract is unchanged. Scopes nest (inner scopes release
  * only their own acquisitions) and are process-wide, not per-thread:
  * one driver-side orchestration thread is the supported shape, same as
  * the harnesses'.
  */
object Caching {

  private val scopes =
    new java.util.ArrayDeque[scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** `df.persist(MEMORY_AND_DISK)`, registered with the innermost
    * active `scoped` block (no-op registration when none is active —
    * then the session-level `clearCache` contract applies, as in
    * Verify/Bench).
    */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    synchronized { if (!scopes.isEmpty) scopes.peek() += p }
    p
  }

  /** [[persist]] + EAGER cache fill (one count pass at full cluster
    * parallelism) — for intermediates consumed by BOTH sides of a
    * self-join. AQE submits the two join-side map stages concurrently,
    * and both find the cache cold: each recomputes the full input
    * pipeline (measured on q166: two concurrent ~3.7 s fill jobs where
    * one ~1.9 s fill + two cheap cache reads do the same work). The
    * count is the fill; everything downstream reads the cache.
    */
  def materialize(df: DataFrame): DataFrame = {
    val p = persist(df)
    p.count()
    p
  }

  /** Run `body`, then unpersist every operator cache acquired inside
    * it (in a `finally` — failures release too). Returns `body`'s
    * result.
    */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer[DataFrame]()
    synchronized { scopes.push(buf) }
    try body
    finally {
      // pop, not remove(buf): ArrayBuffer equality is STRUCTURAL, so
      // equality-based removal of (say) two empty nested scopes relies
      // on scan order to hit the right one — pop states the LIFO
      // contract directly and cannot mis-target (try/finally nesting
      // guarantees LIFO exits on the single orchestration thread)
      synchronized {
        val popped = scopes.pop()
        require(popped eq buf,
          "Caching.scoped exits must be LIFO on one thread")
      }
      buf.foreach(_.unpersist(blocking = false))
    }
  }
}
