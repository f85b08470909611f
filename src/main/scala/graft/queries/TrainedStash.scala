package graft.queries

/** Rule lists trained DRIVER-SIDE by a query run, stashed for the
  * oracle builder. The production-scale trainer queries (q326/q328)
  * learn 1000+ merges with [[graft.llm.FastTrainers]] at query time;
  * their DuckDB oracles re-run the APPLY + economics independently but
  * take the trained rule list as input (the same contract as every
  * external-merges apply oracle — q310/q318 embed a fixed list, these
  * embed the list the query just learned). Verify dumps
  * `oracle_sql.json` AFTER running the queries, and
  * `CurationQueries.oracles` is a `def`, so the stash is always
  * populated when the oracle SQL is built. Trainer correctness itself
  * is NOT taken on faith: FastTrainerSpec pins the fast trainers
  * rule-for-rule (counts and scores included) to the distributed
  * trainers, which q316/q323 oracle-gate round by round.
  */
object TrainedStash {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private val p =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  def putRules(name: String, rules: Seq[(String, String)]): Unit =
    m.put(name, rules)

  /** The stashed rule list, or None if the query never ran in this
    * JVM (a prefix-restricted Verify that excluded it). The oracle
    * builder then emits a 0-row placeholder: if the driver's full run
    * ever hit this path the compare would fail LOUDLY on a row-count
    * mismatch — never a silent pass.
    */
  def rules(name: String): Option[Seq[(String, String)]] =
    Option(m.get(name)).filter(_.nonEmpty)

  def putPieces(name: String, pieces: Set[String]): Unit =
    p.put(name, pieces)

  def pieces(name: String): Option[Set[String]] =
    Option(p.get(name)).filter(_.nonEmpty)

  /** The placeholder oracle for a stash that was never populated. */
  val notRun: String =
    "SELECT NULL AS query_did_not_run_in_this_jvm WHERE 1 = 0"
}
