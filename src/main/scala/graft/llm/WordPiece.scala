package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece — the THIRD published tokenizer family (BERT lineage),
  * beside BPE (q316) and unigram-LM (q321). Training is BPE-shaped but
  * ranks candidate pairs by the PUBLISHED WordPiece score
  * count(xy) / (count(x) · count(y)) — likelihood gain instead of raw
  * frequency — so it prefers pairs whose parts rarely occur apart.
  * The apply is GREEDY LONGEST-MATCH-FIRST over a piece vocabulary
  * with `##` continuation prefixes; a position with no matching piece
  * makes the whole word `[UNK]` (the BERT behavior).
  *
  * Determinism (mirrored verbatim in the q323/q324 oracles): pair and
  * unit counts are exact long sums; the score is ONE double division
  * of exact integers (< 2^53 — correctly rounded identically on both
  * engines), ordered (score DESC, x, y); the greedy scan's only choice
  * is the longest match, a pure set probe.
  *
  * Scale shape: the corpus collapses once into the word-weight census;
  * every training round is two bounded-vocab aggregates + a 1-row
  * argmax collect (the q272 trainer charter); the apply vocabulary is
  * a bounded content-sized collect shipping with one codegen'd
  * expression — zero joins, zero shuffles at apply time.
  */
object WordPiece {

  /** Train `rounds` merges by the WordPiece score over the lowercase
    * word census; returns one row per executed round:
    * (merge_round, x, y, pair_n, score). Stops early when no pair
    * remains.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainRules(Bpe.charVocab(docs, textCol), rounds)._1
      .toDF("merge_round", "x", "y", "pair_n", "score")
  }

  /** [[train]] plus the APPLY VOCABULARY the trained state implies:
    * every word-initial final symbol as itself and every continuation
    * symbol `##`-prefixed — the piece set the greedy tokenizer probes.
    */
  def trainWithVocab(docs: DataFrame, textCol: String, rounds: Int)
      : (Seq[(Long, String, String, Long, Double)], Set[String]) = {
    val (rules, v) = trainRules(Bpe.charVocab(docs, textCol), rounds)
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = v.select(posexplode(col("s")))
      .select(when(col("pos") === 0, col("col"))
        .otherwise(concat(lit("##"), col("col"))).as("piece"))
      .distinct().as[String].collect().toSet
    v.unpersist()
    require(pieces.size <= 5000000,
      s"apply vocabulary out of range: ${pieces.size}")
    (rules, pieces)
  }

  /** [[train]] from an already-built word-frequency table
    * (w, weight) — the streaming twin's assembly point (#36): the
    * stream maintains one counter per DISTINCT word (bounded by the
    * vocabulary), and retraining on the accumulated census IS the
    * batch train over the prefix — rule for rule, score for score
    * (the score's unit counts are census-derived too).
    */
  def trainFromWords(words: DataFrame, rounds: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val (rules, v) = trainRules(
      words.select(col("weight"),
        Bpe.applyMerges(col("w"), Nil).as("s")), rounds)
    v.unpersist()
    rules.toDF("merge_round", "x", "y", "pair_n", "score")
  }

  /** [[train]]'s exact output computed by the fast driver-side trainer
    * ([[FastTrainers.trainWordPiece]]): ONE census collect replaces the
    * per-round distributed pair+unit censuses. Value-identical by
    * FastTrainerSpec's rule-for-rule (and score-for-score) pin; the
    * distributed [[train]] stays as the spec's reference implementation.
    */
  def trainFast(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    FastTrainers.trainWordPiece(
        Bpe.collectVocab(Bpe.charVocab(docs, textCol)), rounds)
      .rules.map(r => (r.round, r.x, r.y, r.n, r.score))
      .toDF("merge_round", "x", "y", "pair_n", "score")
  }

  /** PRODUCTION-SCALE training ([[FastTrainers.trainWordPiece]]):
    * collect the content-bounded census once ([[Bpe.collectVocab]]),
    * run the score-argmax merge loop driver-side with per-merge delta
    * updates — 1k+ merges in seconds where [[train]] schedules two
    * distributed censuses per round. Pinned rule-for-rule equal to
    * [[train]] on the same census by FastTrainerSpec. Returns the
    * rules and the implied greedy-apply piece vocabulary (the
    * [[trainWithVocab]] shape, derived from the trainer's final
    * symbol state).
    */
  def trainFastWithVocab(wv: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long, Double)], Set[String]) = {
    val t = FastTrainers.trainWordPiece(Bpe.collectVocab(wv), rounds)
    val pieces = t.finalSymbols.iterator.flatMap { ss =>
      ss.iterator.zipWithIndex.map { case (sym, i) =>
        if (i == 0) sym else "##" + sym
      }
    }.toSet
    require(pieces.size <= 5000000,
      s"apply vocabulary out of range: ${pieces.size}")
    (t.rules.map(r => (r.round, r.x, r.y, r.n, r.score)), pieces)
  }

  /** The driver loop: per round, the adjacent-pair census AND the unit
    * census over the bounded vocab, argmax by (score DESC, x, y), then
    * the greedy LTR rewrite ([[Bpe.mergePair]]). Returns the rules and
    * the FINAL persisted vocab table (caller unpersists).
    */
  private def trainRules(v0: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long, Double)], DataFrame) = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16]: $rounds")
    var v = v0.transform(graft.core.Caching.persist)
    var prev: DataFrame = null
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Double)]
    var done = false
    var r = 1
    while (r <= rounds && !done) {
      val pairs = v.where(size(col("s")) >= 2)
        .select(col("weight"),
          explode(transform(sequence(lit(1), size(col("s")) - 1), i =>
            struct(element_at(col("s"), i).as("x"),
              element_at(col("s"), i + lit(1)).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("weight")).cast("long").as("n"))
      val units = v.select(col("weight"), explode(col("s")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("weight")).cast("long").as("m"))
      val top = pairs
        .join(units.select(col("sym").as("x"), col("m").as("mx")), "x")
        .join(units.select(col("sym").as("y"), col("m").as("my")), "y")
        .select(col("x"), col("y"), col("n"),
          (col("n").cast("double")
            / (col("mx") * col("my")).cast("double")).as("score"))
        .orderBy(col("score").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val row = top.head
        val (x, y) = (row.getAs[String]("x"), row.getAs[String]("y"))
        rules += ((r.toLong, x, y, row.getAs[Long]("n"),
          row.getAs[Double]("score")))
        val nv = v.select(col("weight"),
            Bpe.mergePair(col("s"), x, y).as("s"))
          .transform(graft.core.Caching.persist)
        if (prev != null) prev.unpersist()
        prev = v
        v = nv
        r += 1
      }
    }
    if (prev != null) prev.unpersist()
    (rules.toSeq, v)
  }

  /** Write a piece vocabulary in the standard BERT `vocab.txt` format:
    * one piece per line, LINE ORDER = ID ORDER (callers pass the order
    * they want ids assigned in; [[trainWithVocab]]'s set is unordered —
    * sort it deterministically first). Pieces must be non-empty and
    * free of line-breaking whitespace (the reader splits on lines).
    */
  def vocabToFile(pieces: Seq[String], path: String): Unit = {
    require(pieces.nonEmpty && pieces.distinct.size == pieces.size,
      "pieces must be non-empty and distinct (line order = id order)")
    require(pieces.forall(p => p.nonEmpty &&
      !p.exists(c => c == '\n' || c == '\r')),
      "pieces must be non-empty and line-break-free")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (pieces.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load a `vocab.txt` piece list ([[vocabToFile]]'s inverse; also
    * reads real BERT vocab files). Single-file contract like
    * [[Bpe.rulesFromFile]] — line order IS id order, and a dir/glob
    * would interleave splits; 5M cap so a mistaken path fails loudly.
    * Blank lines are rejected (a real vocab.txt has none and a silent
    * skip would shift every id after it).
    */
  def vocabFromFile(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(hp)).getOrElse(Array.empty)
    require(matches.length == 1 && matches.head.isFile,
      s"vocab.txt path must be exactly one file (line order = id " +
        s"order): '$path' matched ${matches.length} entries")
    val lines = spark.read.textFile(path).collect().toSeq
    val pieces = if (lines.nonEmpty && lines.last.isEmpty)
      lines.init else lines // a single trailing newline is the format
    require(pieces.nonEmpty && pieces.size <= 5000000,
      s"piece list has ${pieces.size} lines (cap 5M)")
    require(pieces.forall(_.nonEmpty),
      "blank vocab.txt line would silently shift every later id")
    require(pieces.distinct.size == pieces.size,
      "duplicate pieces in vocab.txt")
    pieces
  }

  /** Greedy longest-match tokenize of a word column under a fixed
    * piece set (word-initial pieces plain, continuations `##`-prefixed;
    * no match at any position → the single piece `[UNK]`). Words longer
    * than `maxInputChars` codepoints are `[UNK]` outright — the HF
    * WordPiece `max_input_chars_per_word` contract (BERT default 100).
    */
  def applyGreedy(word: Column, vocab: Set[String],
                  maxInputChars: Int = 100): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(WordPieceApplyExpr(
      ColumnBridge.toExpression(word), vocab, maxInputChars))
  }

  /** Per-document token-id sequences under the greedy apply — the
    * [[Bpe.encodeIdsWith]] shape for the WordPiece family (the
    * pipeline's `tokenizerFamily = wordpiece` terminal): lowercase
    * word units, the greedy longest-match piece split over DISTINCT
    * words only, ids from the supplied vocab.txt line-order map
    * (`[UNK]` must be mapped — dead-ended words emit it). Output
    * schema = (doc_id, n_words, n_symbols, n_blocks, ids).
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: Set[String], ids: Map[String, Long],
                blockTokens: Int = 64): DataFrame = {
    require(ids.contains("[UNK]"),
      "the id map must cover [UNK] (dead-ended words emit it)")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
    val enc = toks.select(explode(col("t")).as("w")).distinct()
      .select(col("w"),
        Bpe.symbolIds(applyGreedy(col("w"), vocab), ids).as("wids"))
    Bpe.assembleIds(toks, enc, blockTokens)
  }

  /** Per-`byCol` tokenizer economics under the greedy apply — the
    * q317/q322 report for the WordPiece family: word/piece/UNK counts
    * and the ordered piece-sequence hash sum, computed over DISTINCT
    * words only (content-bounded) and joined back to instance counts.
    */
  def applyStats(docs: DataFrame, textCol: String, byCol: String,
                 vocab: Set[String]): DataFrame = {
    val sw = docs.select(col(byCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("nsw"))
      .transform(graft.core.Caching.persist)
    val enc = sw.select(col("w")).distinct()
      .select(col("w"), applyGreedy(col("w"), vocab).as("p"))
      .select(col("w"), size(col("p")).cast("long").as("np"),
        (element_at(col("p"), 1) === "[UNK]").cast("long").as("unk"),
        TextFunctions.portableHash(array_join(col("p"), "\u0001"), 59)
          .as("h"))
    sw.join(enc, "w")
      .groupBy(col("grp"))
      .agg(sum(col("nsw")).cast("long").as("n_words"),
        sum(col("nsw") * col("np")).cast("long").as("n_pieces"),
        sum(col("nsw") * col("unk")).cast("long").as("n_unk"),
        sum(col("nsw") * col("h")).cast("long").as("piece_hash_sum"))
      .select(col("grp").as(byCol), col("n_words"), col("n_pieces"),
        col("n_unk"), col("piece_hash_sum"))
  }
}

/** Native greedy longest-match WordPiece apply (see
  * [[WordPiece.applyGreedy]]): word → piece array ([[UNK]] alone when
  * any position dead-ends, or when the word exceeds `maxInputChars`
  * codepoints — HF's `max_input_chars_per_word`, BERT default 100).
  * Codepoint positions; probe cost O(len · maxPieceLen) hash lookups.
  * The probe length bound is the longest RAW piece (not its
  * `##`-stripped core): HF's word-initial lookup is a raw-substring
  * probe, so a vocab piece that literally begins with `##` (e.g. from
  * markdown heading text) must stay reachable at position 0 even when
  * it is longer than every continuation core.
  */
case class WordPieceApplyExpr(child: Expression, vocab: Set[String],
                              maxInputChars: Int = 100)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxInputChars >= 1, s"maxInputChars >= 1: $maxInputChars")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val voc: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  // longest probe we could ever need, in codepoints: the raw piece
  // length bounds word-initial probes (HF probes the raw substring at
  // position 0 — a piece literally starting with "##" matches there),
  // and core length bounds continuation probes; raw >= core always, so
  // one bound covers both (over-probing a continuation position by the
  // two ## codepoints just misses the set — no false matches).
  @transient private lazy val maxProbe: Int =
    vocab.iterator.map(p => p.codePointCount(0, p.length)).max

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(in: UTF8String): ArrayData = {
    val w = in.toString
    val n = w.codePointCount(0, w.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n > maxInputChars)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString("[UNK]")))
    val offs = new Array[Int](n + 1)
    var o = 0
    var i = 0
    while (i < n) { offs(i) = o; o += Character.charCount(w.codePointAt(o)); i += 1 }
    offs(n) = w.length
    val out = new java.util.ArrayList[String](n)
    var pos = 0
    var unk = false
    while (pos < n && !unk) {
      var l = math.min(maxProbe, n - pos)
      var hit: String = null
      var hl = 0
      while (hit == null && l >= 1) {
        val core = w.substring(offs(pos), offs(pos + l))
        val cand = if (pos == 0) core else "##" + core
        if (voc.contains(cand)) { hit = cand; hl = l }
        else l -= 1
      }
      if (hit == null) unk = true
      else { out.add(hit); pos += hl }
    }
    val arr: Array[Any] =
      if (unk) Array(UTF8String.fromString("[UNK]"))
      else {
        val a = new Array[Any](out.size)
        var k = 0
        while (k < out.size) { a(k) = UTF8String.fromString(out.get(k)); k += 1 }
        a
      }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpApply", this,
      classOf[WordPieceApplyExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceApplyExpr = copy(child = newChild)

  override def prettyName: String = "wordpiece_apply"
}
