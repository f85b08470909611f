package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-round BPE merge training — the tokenizer-training inner loop
  * (q223 ran exactly one census; this runs `rounds` of them with the
  * merged symbol re-entering the pair table, which is where BPE's
  * actual behavior lives: round r's best pair depends on every merge
  * before it).
  *
  * Shape per round (the distributed-trainer standard):
  *  1. adjacent-pair census over the VOCAB (word → weight collapsed in
  *     the first aggregate — corpus-sized data is touched once, before
  *     round 1; every round after is bounded by |vocab|);
  *  2. argmax pair by (count DESC, x, y) — a ONE-ROW collect. This is
  *     the one deliberate driver action: the merge rule is a scalar
  *     the next round's rewrite expression needs as a literal (same
  *     charter as q259's driver-side power iteration on ≤64 rows);
  *  3. greedy left-to-right merge of that pair inside every word's
  *     symbol sequence — a pure per-row fold (`aggregate`) that
  *     appends each symbol unless the accumulator's LAST symbol is x
  *     and the incoming one is y. The fold naturally gives BPE's
  *     non-overlapping greedy semantics: "aaaa" + (a,a) → [aa, aa],
  *     and a freshly merged symbol never re-merges in its own round
  *     (it no longer equals x).
  *
  * Exactness: counts are exact long sums of long weights; the argmax
  * order is total; symbols are whitespace-free (tokens() splits on
  * whitespace) so the space-joined fold accumulator is unambiguous.
  * Char mass Σ weight·Σ|symbol| is invariant under every merge round
  * (symbols concatenate, characters are never created or destroyed) —
  * the property spec pins that.
  */
object Bpe {

  /** Character-level vocab with corpus word frequencies:
    * (weight, s: array<string> of single chars).
    */
  def charVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))
      // rule-less applyMerges = the codepoint splitter: keeps EVERY
      // splitter in the family codepoint-based (split(w, "") is UTF-16
      // units — an astral char would become two lone surrogates and
      // diverge from the oracle's string_split, which is codepoint)
      .select(col("weight"), applyMerges(col("w"), Nil).as("s"))

  /** Greedy left-to-right merge of the literal pair (x, y) over the
    * symbol array column `s` — the per-row fold described above.
    */
  def mergePair(s: org.apache.spark.sql.Column, x: String, y: String)
      : org.apache.spark.sql.Column = {
    val merged = x + y
    when(size(s) <= 1, s).otherwise(
      split(aggregate(slice(s, lit(2), size(s)), element_at(s, 1),
        (acc, sy) =>
          when(substring_index(acc, " ", -1) === lit(x) && sy === lit(y),
            concat(acc.substr(lit(1), length(acc) - lit(x.length)),
              lit(merged)))
            .otherwise(concat(acc, lit(" "), sy))), " "))
  }

  /** The PRODUCTION trainer's census: one weight per distinct GPT-2
    * SEGMENT ([[PreTokenize.gptSegments]] — case preserved, each word
    * carrying its leading space) with the byte-level base alphabet
    * ([[applyMergesBytes]]'s remap) — exactly the input a real GPT-2/HF
    * tokenizer train consumes, so [[trainFromVocab]] over this census
    * learns Ġ-prefixed merges a lowercase word census never could.
    * Same two-aggregate shape as [[charVocab]]: the corpus collapses
    * once, every training round after is bounded by |segments|.
    */
  def segmentVocabBytes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(PreTokenize.gptSegments(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))
      .select(col("weight"), applyMergesBytes(col("w"), Nil).as("s"))

  /** Train `rounds` merge rules; returns one row per executed round:
    * (merge_round, x, y, pair_n, mass_after) where pair_n is the
    * weighted adjacent-pair count that won the round and mass_after is
    * Σ weight·|symbols| after applying the merge. Stops early if the
    * pair table goes empty (every word fully merged).
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    trainFromVocab(charVocab(docs, textCol), rounds)

  /** [[train]] from an already-built word-frequency vocabulary table
    * (weight, s: array<string>) — the entry point the streaming
    * vocabulary-census twin assembles through: the stream maintains
    * per-word counters (bounded by the vocabulary), and retraining on
    * the accumulated census IS the batch train over the prefix.
    */
  def trainFromVocab(wv: DataFrame, rounds: Int): DataFrame = {
    val spark = wv.sparkSession
    import spark.implicits._
    trainRules(wv, rounds, withMass = true)
      .toDF("merge_round", "x", "y", "pair_n", "mass_after")
  }

  /** The driver-side loop behind [[train]]/[[encodeStats]]. With
    * `withMass = false` the per-round mass aggregate (an extra action
    * per round that only the q272 report needs) is skipped and
    * mass_after is −1.
    */
  private def trainRules(v0: DataFrame, rounds: Int,
                         withMass: Boolean)
      : Seq[(Long, String, String, Long, Long)] = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16] (each round is a full vocab pass): $rounds")
    val spark = v0.sparkSession
    import spark.implicits._
    var v = v0.transform(graft.core.Caching.persist)
    var prev: DataFrame = null
    val rules =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var done = false
    var r = 1
    while (r <= rounds && !done) {
      val top = v.where(size(col("s")) >= 2)
        .select(col("weight"),
          explode(transform(sequence(lit(1), size(col("s")) - 1), i =>
            struct(element_at(col("s"), i).as("x"),
              element_at(col("s"), i + lit(1)).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("weight")).cast("long").as("n"))
        .orderBy(col("n").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (x, y, n) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        val nv = v.select(col("weight"), mergePair(col("s"), x, y).as("s"))
          .transform(graft.core.Caching.persist)
        val mass =
          if (withMass)
            nv.agg(sum(col("weight") * size(col("s"))).cast("long"))
              .as[Long].head()
          else -1L
        rules += ((r.toLong, x, y, n, mass))
        if (prev != null) prev.unpersist()
        prev = v
        v = nv
        r += 1
      }
    }
    if (prev != null) prev.unpersist()
    v.unpersist()
    rules.toSeq
  }

  /** Collect a (weight, s) vocabulary census driver-side — the
    * production trainer's one deliberate collect. The census is
    * content-bounded (one row per DISTINCT word/segment regardless of
    * corpus volume — the same scale as the merges.txt artifact every
    * pipeline already holds at the driver), and [[FastTrainers]]'s
    * own row/symbol caps fail loudly on a mistaken corpus-scale input.
    */
  def collectVocab(wv: DataFrame): Seq[(Long, IndexedSeq[String])] = {
    val spark = wv.sparkSession
    import spark.implicits._
    wv.select(col("weight").cast("long"), col("s"))
      .as[(Long, Seq[String])].collect()
      .iterator.map { case (w, s) => (w, s.toIndexedSeq) }.toSeq
  }

  /** PRODUCTION-SCALE training ([[FastTrainers.trainBpe]]): collect
    * the content-bounded census ONCE, then run the merge loop driver
    * side with per-merge delta updates — 1k–50k merges in seconds
    * where [[trainFromVocab]] schedules one distributed census per
    * round. Pinned rule-for-rule equal to [[trainFromVocab]] on the
    * same census by FastTrainerSpec; returns (x, y) pairs in rank
    * order — exactly what [[applyMerges]]/[[encodeIdsWith]]/
    * [[rulesToFile]] consume.
    */
  def trainFastFromVocab(wv: DataFrame, rounds: Int): Seq[(String, String)] =
    FastTrainers.trainBpe(collectVocab(wv), rounds)
      .rules.map(r => (r.x, r.y))

  /** [[trainFromVocab]]'s exact output (merge_round, x, y, pair_n,
    * mass_after) computed by the fast driver-side trainer: ONE census
    * collect replaces the per-round distributed census + mass aggregate
    * (2·rounds jobs). Value-identical by FastTrainerSpec's
    * rule-for-rule (and mass-for-mass) pin; the distributed
    * [[trainFromVocab]] stays as the spec's reference implementation.
    */
  def trainFromVocabFast(wv: DataFrame, rounds: Int): DataFrame = {
    val spark = wv.sparkSession
    import spark.implicits._
    FastTrainers.trainBpe(collectVocab(wv), rounds)
      .rules.map(r => (r.round, r.x, r.y, r.n, r.massAfter))
      .toDF("merge_round", "x", "y", "pair_n", "mass_after")
  }

  /** [[train]] through the fast driver-side trainer (same output,
    * one census collect instead of 2·rounds distributed jobs).
    */
  def trainFast(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    trainFromVocabFast(charVocab(docs, textCol), rounds)

  /** The merge-depth compression curve — the vocab-size tuning
    * readout: after r = 0..`rounds` trained merges, the corpus-wide
    * symbol mass and symbols/word fertility. Each point is one bounded
    * aggregate over the distinct-word vocab (the corpus collapses into
    * the word-weight table once); state r applies the first r merges
    * natively per word on that bounded table, so the whole curve costs
    * rounds+1 bounded-vocab passes after training and zero extra
    * corpus scans. Rows: (round, n_words, n_symbols,
    * symbols_per_word) — the knee of this curve is where extra merges
    * stop buying compression.
    */
  def compressionCurve(docs: DataFrame, textCol: String, rounds: Int)
      : DataFrame = {
    // state r = one native min-rank apply of the first r trained rules
    // over the persisted word-weight vocab (≡ replaying them in order,
    // BpeSpec's drop-in contract) — each curve point is a FLAT plan
    // instead of an r-deep fold chain (~4^r expression nodes). Early
    // stop (rules.length < rounds) still emits rounds+1 points: r past
    // the executed merges takes the full list — a fully-merged corpus
    // stays fully merged (the cross-engine contract with the oracle's
    // LEFT JOIN keep-vocab fallback).
    val wv = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))
      .transform(graft.core.Caching.persist)
    // fast driver-side trainer over the SAME persisted census the curve
    // aggregates read (rule-for-rule = the distributed trainer,
    // FastTrainerSpec): the corpus collapses once, training is one
    // bounded collect instead of `rounds` census jobs
    val rules = trainFastFromVocab(
      wv.select(col("weight"), applyMerges(col("w"), Nil).as("s")),
      rounds)
    (0 to rounds).map { r =>
      val rs = rules.take(math.min(r, rules.length))
      wv.agg(sum(col("weight")).cast("long").as("n_words"),
          sum(col("weight") * size(applyMerges(col("w"), rs)))
            .cast("long").as("n_symbols"))
        .select(lit(r.toLong).as("round"), col("n_words"),
          col("n_symbols"),
          (col("n_symbols").cast("double") / col("n_words").cast("double"))
            .as("symbols_per_word"))
    }.reduce(_ unionAll _)
  }

  /** Apply learned merge rules (in order) and report per-`byCol`
    * tokenizer stats: word/char/symbol counts and the two ratios every
    * tokenizer build quotes — chars per symbol (compression) and
    * symbols per word (fertility). The merges replay over the DISTINCT
    * word table only (8 chained per-row folds, no corpus pass), then
    * join back to per-(group, word) instance counts — so corpus-sized
    * data is touched exactly twice (vocab build + instance count), both
    * map-side-combined aggregates.
    */
  def encodeStats(docs: DataFrame, textCol: String, byCol: String,
                  rounds: Int): DataFrame = {
    val sw = docs.select(col(byCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("nsw"))
      .transform(graft.core.Caching.persist)
    // the word census IS sw re-aggregated over groups (Σ nsw per word =
    // charVocab's count), so the corpus collapses ONCE and the fast
    // driver-side trainer (rule-for-rule = the distributed trainer,
    // FastTrainerSpec) replaces `rounds` census jobs with one bounded
    // collect over the already-persisted table
    val rules = trainFastFromVocab(
      sw.groupBy(col("w")).agg(sum(col("nsw")).cast("long").as("weight"))
        .select(col("weight"), applyMerges(col("w"), Nil).as("s")),
      rounds)
    // one native min-rank apply instead of `rounds` chained folds —
    // identical for trained rule lists (BpeSpec's drop-in contract)
    // and it keeps the plan tree flat (the fold chain was ~4^rounds
    // expression nodes)
    val enc = sw.select(col("w")).distinct()
      .select(col("w"),
        size(applyMerges(col("w"), rules)).cast("long").as("n_sym"))
    sw.join(enc, "w")
      .groupBy(col("grp"))
      .agg(sum(col("nsw")).cast("long").as("n_words"),
        sum(col("nsw") * length(col("w"))).cast("long").as("n_chars"),
        sum(col("nsw") * col("n_sym")).cast("long").as("n_symbols"))
      .select(col("grp").as(byCol), col("n_words"), col("n_chars"),
        col("n_symbols"),
        (col("n_chars").cast("double") / col("n_symbols").cast("double"))
          .as("chars_per_symbol"),
        (col("n_symbols").cast("double") / col("n_words").cast("double"))
          .as("symbols_per_word"))
  }

  /** Materialize the per-document token-id sequence — the pretraining
    * handoff artifact (what actually ships to the trainer). Merges
    * train as in [[train]]; ids come from the POST-MERGE vocabulary
    * (distinct surviving symbols, sorted, 1-based) — bounded by
    * |alphabet| + `rounds`, so the id table is a driver-side literal
    * array (the q259 bounded-collect charter) and id assignment is a
    * per-row `array_position`, no join. Per-doc assembly: one
    * posexplode + one hash join on the DISTINCT-word encode table +
    * one per-doc aggregate; the shuffled payload is id arrays, and
    * blocks of `blockTokens` ids (the training micro-batch boundary)
    * are derived arithmetically from the sequence.
    *
    * @return (doc_id, n_words, n_symbols, n_blocks, ids) — `ids` is
    *         the full ordered id sequence; empty docs drop (no words).
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                rounds: Int, blockTokens: Int = 64): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1: $blockTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    // fast driver-side trainer (rule-for-rule = the distributed one,
    // FastTrainerSpec): one bounded census collect instead of `rounds`
    // distributed census jobs
    val rules = trainFastFromVocab(charVocab(docs, textCol), rounds)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
    // native min-rank apply ≡ the foldLeft replay for trained rules
    // (BpeSpec) — flat plan instead of a ~4^rounds expression tree
    val enc = toks.select(explode(col("t")).as("w")).distinct()
      .select(col("w"), applyMerges(col("w"), rules).as("s"))
      .transform(graft.core.Caching.persist)
    // bounded vocabulary: alphabet + <= rounds merged symbols
    val vocab = enc.select(explode(col("s")).as("sym")).distinct()
      .orderBy(col("sym")).as[String].collect()
    val vlit = array(vocab.toIndexedSeq.map(lit): _*)
    val encIds = enc.select(col("w"),
      transform(col("s"), sy => array_position(vlit, sy)).as("wids"))
    toks.select(col("doc_id"), posexplode(col("t")))
      .join(encIds, col("col") === col("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sort_array(collect_list(struct(col("pos"), col("wids")))).as("ws"))
      .select(col("doc_id"), col("n_words"),
        flatten(col("ws.wids")).as("ids"))
      .select(col("doc_id"), col("n_words"),
        size(col("ids")).cast("long").as("n_symbols"),
        expr(s"CAST((size(ids) + ${blockTokens - 1}) div $blockTokens " +
          "AS BIGINT)").as("n_blocks"),
        col("ids"))
  }

  /** Load a merge list from a file in the standard tokenizer
    * `merges.txt` format (HF/GPT-2 lineage): one `x y` pair per line
    * in rank order, `#...` comment/version headers and blank lines
    * skipped. Driver-side bounded collect — a 100k-merge vocabulary is
    * ~2 MB of text, and [[BpeApplyExpr]] ships the rank map with the
    * task binary. Hard cap 1M rules so a mistaken path fails loudly.
    * Lines that are not exactly two space-separated symbols raise
    * (half-parsed vocabularies silently mis-tokenize everything).
    *
    * ORDER CONTRACT: line order IS rank order, which
    * `textFile(...).collect()` preserves only for a SINGLE file
    * (splits of one file are offset-ordered) — a directory or glob
    * would interleave files and silently scramble every rank, so the
    * path is required to resolve to exactly one regular file.
    */
  def rulesFromFile(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[(String, String)] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(hp)).getOrElse(Array.empty)
    require(matches.length == 1 && matches.head.isFile,
      s"merges path must be exactly one file (line order = rank order; " +
        s"a directory/glob would scramble ranks): '$path' matched " +
        s"${matches.length} entries")
    val lines = spark.read.textFile(path).collect()
    val rules = lines.iterator
      .map(l => Option(l).fold("")(_.trim))
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"malformed merges.txt line (want 'x y'): '$l'")
        (parts(0), parts(1))
      }
      .toSeq
    require(rules.size <= 1000000,
      s"merge list has ${rules.size} rules (cap 1M) — is this a merges file?")
    rules
  }

  /** Load a symbol→id vocabulary from a file in the standard tokenizer
    * `vocab.json` format (HF/GPT-2 lineage): ONE JSON object mapping
    * token string → integer id — the id space a pretraining checkpoint
    * actually loads, for [[encodeIdsWith]]'s `vocab` parameter. Read as
    * a single whole-file value (order is irrelevant for a map, unlike
    * [[rulesFromFile]]) and parsed with the Jackson shipped on the
    * Spark classpath. Driver-side bounded collect: a 50k-token vocab is
    * ~1 MB of JSON, hard-capped at 5M entries so a mistaken path fails
    * loudly. Ids must be distinct (the map must invert for decode).
    */
  def vocabFromFile(spark: org.apache.spark.sql.SparkSession,
                    path: String): Map[String, Long] = {
    // single-file contract like [[rulesFromFile]]: a directory/glob
    // would concatenate JSON documents and Jackson's readTree would
    // silently parse only the FIRST — reject loudly instead
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(hp)).getOrElse(Array.empty)
    require(matches.length == 1 && matches.head.isFile,
      s"vocab path must be exactly one file: '$path' matched " +
        s"${matches.length} entries")
    val txt = spark.read.option("wholetext", "true").textFile(path)
      .collect().mkString
    // STRICT_DUPLICATE_DETECTION: readTree silently keeps the LAST
    // value for a repeated key, so a corrupted vocab.json with the same
    // token twice would pass the distinct-ids check (ids differ) while
    // silently dropping a mapping — fail loudly at parse time instead
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .configure(com.fasterxml.jackson.core.JsonParser.Feature
        .STRICT_DUPLICATE_DETECTION, true)
      .readTree(txt)
    require(node != null && node.isObject,
      s"vocab.json must be a single JSON object: '$path'")
    require(node.size <= 5000000,
      s"vocab has ${node.size} entries (cap 5M) — is this a vocab.json?")
    val b = Map.newBuilder[String, Long]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      require(e.getValue.canConvertToLong,
        s"non-integer id for token '${e.getKey}': ${e.getValue}")
      b += e.getKey -> e.getValue.asLong()
    }
    val m = b.result()
    require(m.values.toSet.size == m.size,
      "vocab ids must be distinct (symbol<->id must invert for decode)")
    m
  }

  /** Write a merge list in the standard `merges.txt` format
    * ([[rulesFromFile]]'s inverse): a `#version` header then one
    * `x y` line per rule in rank order — so a tokenizer TRAINED here
    * ships as the artifact every GPT-2/HF-lineage loader consumes.
    * Driver-side single-file write (the merge list is bounded by the
    * training rounds); symbols must be whitespace-free (they are:
    * both census builders split on whitespace/segments).
    */
  def rulesToFile(rules: Seq[(String, String)], path: String): Unit = {
    // the reader ([[rulesFromFile]]) TRIMS lines and splits on ' ': any
    // whitespace-ish char — Java's isWhitespace OR the Unicode
    // White_Space property the pre-tokenizer uses (each covers chars
    // the other misses: 0x1C–0x1F vs U+00A0/U+202F) — would write
    // successfully yet reload trimmed or mis-split, silently changing
    // ranks. The writer's guard matches the reader's parsing exactly.
    require(rules.forall { case (x, y) =>
      x.nonEmpty && y.nonEmpty &&
        !(x + y).exists(c =>
          Character.isWhitespace(c) || PreTokenize.isWs(c.toInt))
    }, "merge symbols must be non-empty and whitespace-free")
    val sb = new StringBuilder("#version: 0.2\n")
    rules.foreach { case (x, y) => sb.append(x).append(' ').append(y)
      .append('\n') }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Write a symbol→id map in the standard one-object `vocab.json`
    * format ([[vocabFromFile]]'s inverse), ids ascending for a stable
    * diffable artifact. Jackson escapes quote/backslash symbols.
    */
  def vocabToFile(vocab: Map[String, Long], path: String): Unit = {
    require(vocab.values.toSet.size == vocab.size,
      "vocab ids must be distinct")
    val jmap = new java.util.LinkedHashMap[String, Long]()
    vocab.toSeq.sortBy(_._2).foreach { case (k, v) => jmap.put(k, v) }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      new com.fasterxml.jackson.databind.ObjectMapper()
        .writerWithDefaultPrettyPrinter().writeValueAsString(jmap)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Apply an EXTERNALLY SUPPLIED merge list to a word — the
    * production-tokenizer apply path. [[encodeIds]] replays its own
    * trained rules as a foldLeft of per-rule projections, which caps
    * out around the trainer's 16 rounds (expression-tree depth grows
    * with the rule count); a real pretraining vocabulary is 32k–100k
    * merges. This runs the standard BPE apply loop instead — repeatedly
    * merge the LOWEST-RANK adjacent pair present (greedy left-to-right
    * within a pass) until none remains — inside ONE native expression
    * whose rank map ships with the task binary, so cost per word is
    * O(len²) hash probes independent of vocabulary size, zero joins.
    *
    * For a TRAINED merge list the result is identical to the in-order
    * foldLeft replay (a later rule's output can never create an
    * earlier rule's pair, because earlier rules cannot reference
    * later outputs) — BpeSpec pins that equivalence; for arbitrary
    * rule lists the min-rank semantics is the contract.
    */
  def applyMerges(word: Column, rules: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(
      BpeApplyExpr(ColumnBridge.toExpression(word), rules))
  }

  /** [[applyMerges]] over the GPT-2 BYTE-LEVEL base alphabet: the
    * word's UTF-8 bytes, each remapped through the standard
    * bytes_to_unicode bijection ([[ByteLevel.byteToChar]]) — the
    * symbol space real GPT-2/HF-lineage `merges.txt` artifacts are
    * trained over, so [[rulesFromFile]] + this is the byte-faithful
    * production apply (codepoint-level rules would never match a
    * byte-level vocabulary on non-ASCII text). Same min-rank loop,
    * same zero-join/zero-shuffle shape; char mass is preserved in
    * BYTES: `ByteLevel.decode(concat(symbols)) == word`.
    */
  def applyMergesBytes(word: Column,
                       rules: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(BpeApplyExpr(
      ColumnBridge.toExpression(word), rules, byteLevel = true))
  }

  /** Map each symbol to its id under a FIXED vocabulary (broadcast
    * hash map inside the expression — O(1)/symbol at any vocab size,
    * where an `array_position` literal scan is O(|vocab|)). Unknown
    * symbols map to -1 (callers building the vocab from observed
    * symbols never see one).
    */
  def symbolIds(symbols: Column, vocab: Map[String, Long]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(
      SymbolIdsExpr(ColumnBridge.toExpression(symbols), vocab))
  }

  /** [[encodeIds]] with an externally supplied merge list (the
    * production artifact — see [[applyMerges]]): same distinct-word
    * replay shape and output schema, but the per-word encode is the
    * one-expression min-rank apply, so 32k–100k-merge vocabularies are
    * in reach. Ids keep the [[encodeIds]] contract (observed post-merge
    * symbols, sorted, 1-based — bounded by |alphabet| + |rules|, a
    * documented driver-side collect) assigned via the O(1) hash-map
    * expression rather than a literal-array scan. With
    * `byteLevel = true` the base alphabet is the GPT-2 byte remap
    * ([[applyMergesBytes]]) — pass it when `rules` come from a
    * byte-level `merges.txt`.
    *
    * With `preTokenize = true` the per-doc units are the GPT-2
    * pre-tokenizer's segments ([[PreTokenize.gptSegments]] — case
    * preserved, each word carrying its single leading space, whitespace
    * runs kept) instead of lowercase whitespace-split words: combined
    * with `byteLevel = true` and a real `merges.txt` this is the
    * DOCUMENT-faithful production encode (segments partition the text,
    * so `ByteLevel.decode(concat(symbols)) == text` corpus-wide —
    * q311's gate). `n_words` then counts segments. The distinct-unit
    * replay shape is unchanged: segments repeat heavily (words carry
    * one canonical " word" spelling), so the encode table stays
    * content-bounded.
    *
    * With `vocab = Some(map)` (a published `vocab.json` id space —
    * [[vocabFromFile]]) ids come from the external map instead of the
    * observed-sorted 1-based assignment, making the artifact
    * loader-compatible with the tokenizer checkpoint the merges came
    * from. Unknown-symbol policy: a real vocab.json is CLOSED over its
    * merge rules (every possible post-merge symbol has an id), so an
    * unmapped symbol maps to the loud -1 sentinel ([[SymbolIdsExpr]]'s
    * contract) rather than silently renumbering — a -1 anywhere flips
    * every downstream hash, which is the point.
    *
    * With `specialTokens` (requires `preTokenize = true`) the encode is
    * SPECIAL-TOKEN-FAITHFUL, the full HF/GPT-2 added-token contract:
    * occurrences of any listed token in the TEXT are segmented out
    * before the pre-tokenizer ([[PreTokenize.gptSegmentsSpecial]] —
    * leftmost match, longest special at a position) and bypass BPE
    * entirely, each mapping to its own single symbol (its vocab.json
    * id under an external `vocab`; an observed id otherwise). Without
    * this, a document that merely MENTIONS `<|endoftext|>` would BPE
    * the literal as ordinary punctuation and diverge from a production
    * encoding. `n_words` counts specials as one unit each.
    */
  def encodeIdsWith(docs: DataFrame, idCol: String, textCol: String,
                    rules: Seq[(String, String)],
                    blockTokens: Int = 64,
                    byteLevel: Boolean = false,
                    preTokenize: Boolean = false,
                    vocab: Option[Map[String, Long]] = None,
                    specialTokens: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty, "empty merge list")
    require(blockTokens >= 1, s"blockTokens must be >= 1: $blockTokens")
    require(specialTokens.isEmpty || preTokenize,
      "specialTokens require preTokenize = true (the special split " +
        "runs before the GPT-2 pre-tokenizer, not the whitespace split)")
    val spark = docs.sparkSession
    import spark.implicits._
    val units =
      if (specialTokens.nonEmpty)
        PreTokenize.gptSegmentsSpecial(col(textCol), specialTokens)
      else if (preTokenize) PreTokenize.gptSegments(col(textCol))
      else TextFunctions.tokens(col(textCol))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        units.as("t"))
      .where(size(col("t")) > 0)
    val applyOrdinary =
      if (byteLevel) applyMergesBytes(col("w"), rules)
      else applyMerges(col("w"), rules)
    // a special unit is UNSPLITTABLE: its symbol list is itself (one
    // symbol), so the id lookup maps it straight to its vocab id
    val apply0 =
      if (specialTokens.isEmpty) applyOrdinary
      else when(col("w").isin(specialTokens: _*), array(col("w")))
        .otherwise(applyOrdinary)
    val enc = toks.select(explode(col("t")).as("w")).distinct()
      .select(col("w"), apply0.as("s"))
      .transform(graft.core.Caching.persist)
    val idMap = vocab.getOrElse {
      val observed = enc.select(explode(col("s")).as("sym")).distinct()
        .orderBy(col("sym")).as[String].collect()
      observed.iterator.zipWithIndex
        .map { case (sym, i) => sym -> (i + 1L) }.toMap
    }
    val encIds = enc.select(col("w"), symbolIds(col("s"), idMap).as("wids"))
    assembleIds(toks, encIds, blockTokens)
  }

  /** The shared per-doc id assembly behind [[encodeIdsWith]] and the
    * WordPiece/unigram family encoders: `toks` is (doc_id, t:
    * array<string> of units), `encIds` the DISTINCT-unit encode table
    * (w, wids: array<bigint>) — one posexplode + one hash join + one
    * per-doc aggregate; the shuffled payload is id arrays only.
    */
  private[llm] def assembleIds(toks: DataFrame, encIds: DataFrame,
                               blockTokens: Int): DataFrame =
    toks.select(col("doc_id"), posexplode(col("t")))
      .join(encIds, col("col") === col("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sort_array(collect_list(struct(col("pos"), col("wids")))).as("ws"))
      .select(col("doc_id"), col("n_words"),
        flatten(col("ws.wids")).as("ids"))
      .select(col("doc_id"), col("n_words"),
        size(col("ids")).cast("long").as("n_symbols"),
        expr(s"CAST((size(ids) + ${blockTokens - 1}) div $blockTokens " +
          "AS BIGINT)").as("n_blocks"),
        col("ids"))

  /** Split an id sequence into `blockTokens`-sized training blocks
    * (tail block truncates) — the pack boundary the loader consumes.
    */
  def idBlocks(ids: org.apache.spark.sql.Column, blockTokens: Int)
      : org.apache.spark.sql.Column = {
    require(blockTokens >= 1, s"blockTokens must be >= 1: $blockTokens")
    // integer ceil-div, and an explicit empty guard: sequence(0, -1)
    // would default its step to -1 and fabricate phantom blocks
    val nb = floor((size(ids) + lit(blockTokens - 1))
      .cast("long") / lit(blockTokens.toLong)).cast("int")
    when(size(ids) > 0,
      transform(sequence(lit(0), nb - 1), b =>
        slice(ids, b * lit(blockTokens) + 1, lit(blockTokens))))
      .otherwise(array().cast("array<array<bigint>>"))
  }
}

/** Native BPE apply (see [[Bpe.applyMerges]]): word → post-merge symbol
  * array under a fixed rank map. The loop is the GPT-2/fast-tokenizer
  * standard: find the lowest-rank adjacent pair present, merge ALL its
  * occurrences greedy left-to-right (a fresh merge never re-merges in
  * its own pass — the concatenated symbol no longer equals x), repeat
  * until no pair is ranked. Duplicate pairs in the list keep their
  * first rank. Whitespace never appears inside symbols
  * ([[TextFunctions.tokens]] splits on it), so symbols are exactly the
  * character-run concatenations of the input word.
  */
case class BpeApplyExpr(child: Expression, rules: Seq[(String, String)],
                        byteLevel: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // two-level map: a probe is two hash lookups with ZERO allocation
  // (a concatenated "x\ny" key would allocate a string per adjacent
  // pair per iteration — measured 15% on the 8-rule bench queries)
  @transient private lazy val rank
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m =
      new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var i = 0
    rules.foreach { case (x, y) =>
      m.computeIfAbsent(x, _ => new java.util.HashMap[String, Integer]())
        .putIfAbsent(y, Integer.valueOf(i)) // duplicates keep FIRST rank
      i += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(in: UTF8String): ArrayData = {
    val w = in.toString
    var syms = new java.util.ArrayList[String](w.length)
    if (byteLevel) {
      // GPT-2 byte-level base alphabet: the word's UTF-8 bytes, each
      // remapped through the standard bytes_to_unicode bijection — the
      // symbol space real merges.txt artifacts are trained over
      val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        syms.add(ByteLevel.byteToChar(bytes(i) & 0xFF))
        i += 1
      }
    } else {
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms.add(w.substring(i, i + n))
        i += n
      }
    }
    var done = syms.size < 2
    while (!done) {
      // lowest-rank adjacent pair present
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val byX = rank.get(syms.get(j))
        if (byX != null) {
          val r = byX.get(syms.get(j + 1))
          if (r != null && r.intValue() < best) best = r.intValue()
        }
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val (x, y) = rules(best)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == x && syms.get(k + 1) == y) {
            out.add(x + y); k += 2 // greedy LTR, non-overlapping
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
        done = syms.size < 2
      }
    }
    val arr = new Array[Any](syms.size)
    var a = 0
    while (a < syms.size) { arr(a) = UTF8String.fromString(syms.get(a)); a += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this,
      classOf[BpeApplyExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeApplyExpr = copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}

/** The GPT-2 byte↔unicode bijection (public bytes_to_unicode
  * algorithm): the 188 "printable" bytes (33–126, 161–172, 174–255)
  * map to their own codepoint; the remaining 68 map to 256+k in
  * ascending byte order, so every byte gets a VISIBLE single-codepoint
  * symbol and byte-level merge rules are plain strings.
  */
object ByteLevel {
  val byteToChar: Array[String] = {
    val arr = new Array[String](256)
    var k = 0
    (0 until 256).foreach { b =>
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) arr(b) = new String(Character.toChars(b))
      else { arr(b) = new String(Character.toChars(256 + k)); k += 1 }
    }
    arr
  }

  private val charToByte: Map[Int, Byte] =
    byteToChar.zipWithIndex.map { case (s, b) =>
      s.codePointAt(0) -> b.toByte
    }.toMap

  /** [[decode]] as a native column expression — the corpus-wide
    * detokenizer face (q311's encode→decode round-trip gate). Same
    * throw-on-foreign-codepoint contract.
    */
  def decodeCol(symbols: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(
      ByteLevelDecodeExpr(ColumnBridge.toExpression(symbols)))
  }

  /** Invert a remapped symbol string back to UTF-8 text (the
    * detokenizer's last step). Throws on a codepoint outside the
    * bijection — such a string was never produced by the encoder.
    */
  def decode(symbols: String): String = {
    val bytes = new Array[Byte](symbols.codePointCount(0, symbols.length))
    var i = 0
    var j = 0
    while (i < symbols.length) {
      val cp = symbols.codePointAt(i)
      bytes(j) = charToByte.getOrElse(cp,
        throw new IllegalArgumentException(
          s"codepoint ${cp.toHexString} is not in the byte-level alphabet"))
      i += Character.charCount(cp)
      j += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** Native byte-level detokenize (see [[ByteLevel.decodeCol]]): a
  * remapped-symbol string → the original UTF-8 text.
  */
case class ByteLevelDecodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(in: UTF8String): UTF8String =
    UTF8String.fromString(ByteLevel.decode(in.toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blDecode", this,
      classOf[ByteLevelDecodeExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ByteLevelDecodeExpr = copy(child = newChild)

  override def prettyName: String = "bytelevel_decode"
}

/** Native symbol→id map lookup (see [[Bpe.symbolIds]]): array<string>
  * → array<bigint> under a fixed vocabulary hash map; unknown symbols
  * → -1.
  */
case class SymbolIdsExpr(child: Expression, vocab: Map[String, Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val ids: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (s, i) => m.put(s, java.lang.Long.valueOf(i)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = in.getUTF8String(i)
      val v = if (s == null) null else ids.get(s.toString)
      out(i) = if (v == null) -1L else v.longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("symIds", this,
      classOf[SymbolIdsExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SymbolIdsExpr = copy(child = newChild)

  override def prettyName: String = "symbol_ids"
}
