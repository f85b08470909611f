package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenizer trainer — the second
  * published tokenizer family beside BPE (q316): a SUBSTRING seed
  * vocabulary over the GPT-2 segment census, then hard-EM rounds where
  * the E-step VITERBI-segments every distinct segment under the
  * current piece scores and the M-step re-estimates scores from the
  * winning pieces' counts (pieces that win nowhere drop; single
  * characters never drop — the coverage guarantee every unigram
  * tokenizer keeps so segmentation is always total).
  *
  * Determinism (mirrored verbatim in the q321 oracle): piece scores
  * are SCALED-INTEGER LOG PROBABILITIES — L(n) = round-half-up(ln(n)·
  * 10⁶) as a long — so the Viterbi DP sums and compares exact longs;
  * ties break to the SMALLEST split point (the longest last piece).
  * The only float op is ln(count) of a small-integer count, identical
  * across engines at 6 scaled decimals.
  *
  * Scale shape (the repo's bounded-census charter): the corpus
  * collapses once into the distinct-segment weight table; the seed
  * census, every E-step, and the M-step are bounded by CONTENT
  * (distinct segments × piece positions / the piece vocabulary), never
  * by corpus volume. The driver holds only the piece→score map (the
  * same artifact scale as a merges.txt — capped), and the Viterbi is
  * one codegen'd per-row expression, zero joins.
  */
object Unigram {

  val LogScale = 1000000L

  /** round-half-up(ln(n)·10⁶) — the scaled-integer log. */
  def scaledLog(n: Long): Long = {
    require(n >= 1, s"scaledLog needs n >= 1: $n")
    math.floor(math.log(n.toDouble) * LogScale.toDouble + 0.5).toLong
  }

  /** Viterbi-segment a string column under a fixed piece→score map
    * (ships with the task binary — O(len·maxPieceLen) hash probes per
    * row, zero joins). Every single character of the input must be in
    * the map (the coverage guarantee) or the expression throws.
    */
  def segmentWith(text: Column, scores: Map[String, Long],
                  maxPieceLen: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(UnigramSegmentExpr(
      ColumnBridge.toExpression(text), scores, maxPieceLen))
  }

  /** The GPT-2 segment weight census (segments longer than `maxSegLen`
    * codepoints are excluded on both engines — the oracle's DP unroll
    * bound; fixture segments are all far shorter).
    */
  def segmentCensus(docs: DataFrame, textCol: String,
                    maxSegLen: Int): DataFrame =
    docs.select(explode(PreTokenize.gptSegments(col(textCol))).as("w"))
      .where(length(col("w")) <= maxSegLen)
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))

  /** All (piece, weighted occurrence count) substrings of the census,
    * lengths 1..maxPieceLen — the seed statistics. Pure Column code
    * (codepoint substr, matching DuckDB), one bounded aggregate.
    */
  def seedCensus(census: DataFrame, maxPieceLen: Int): DataFrame =
    census.select(col("weight"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          filter(transform(sequence(lit(1), lit(maxPieceLen)), l =>
            when(i + l - lit(1) <= length(col("w")),
              col("w").substr(i, l))), x => x.isNotNull))))
        .as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("weight")).cast("long").as("cnt"))

  /** Train `rounds` hard-EM rounds and return the FINAL vocabulary as
    * a DataFrame (piece, n_cnt, score): seed scores from the substring
    * census (kept if count ≥ minCount or single-char), rounds−1
    * E+M rounds driver-side (each a bounded collect of the ≤|vocab|
    * count table — the q259 charter), and the LAST round computed
    * distributed so the output plan carries the exact integer
    * arithmetic end to end.
    */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
            minCount: Long = 2L, rounds: Int = 2,
            maxSegLen: Int = 12,
            targetVocab: Option[Int] = None): DataFrame =
    trainFromCensus(segmentCensus(docs, textCol, maxSegLen),
      maxPieceLen, minCount, rounds, targetVocab)

  /** [[train]] from an already-built segment census table
    * (w, weight) — the streaming twin's assembly point (#35): the
    * stream maintains one counter per DISTINCT segment, and retraining
    * on the accumulated census IS the batch train over the prefix.
    */
  def trainFromCensus(census0: DataFrame, maxPieceLen: Int,
                      minCount: Long, rounds: Int,
                      targetVocab: Option[Int] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8]: $rounds")
    require(targetVocab.forall(_ >= 1),
      s"targetVocab must be >= 1: $targetVocab")
    val spark = census0.sparkSession
    import spark.implicits._
    val census = census0.transform(graft.core.Caching.persist)
    val seed = seedCensus(census, maxPieceLen)
      .where(col("cnt") >= minCount || length(col("piece")) === 1)
      .as[(String, Long)].collect().toMap
    require(seed.nonEmpty && seed.size <= 5000000,
      s"seed vocabulary out of range: ${seed.size} (cap 5M — the " +
        "merges.txt artifact scale)")
    val singles = seed.keySet
      .filter(p => p.codePointCount(0, p.length) == 1)
    def weights(kept: Map[String, Long]): Map[String, Long] = {
      val total = kept.values.sum
      kept.map { case (p, c) => p -> (scaledLog(c) - scaledLog(total)) }
    }
    def mStep(cnt: Map[String, Long]): Map[String, Long] =
      cnt.filter(_._2 > 0) ++
        singles.filterNot(cnt.contains).map(_ -> 1L)
    // SentencePiece-style size pruning (hard-EM, exact-integer
    // variant): single-char pieces NEVER drop (the coverage floor);
    // multi-char pieces rank by (count DESC, piece ASC in UTF-8 byte
    // order — Spark/DuckDB string order) and only the top
    // k − |singles| survive. Real SPM ranks candidates by the EM
    // likelihood loss of removal; the count rank is its hard-EM
    // stand-in (documented divergence — loss needs a per-piece
    // alternative-segmentation Viterbi), with the same shrink
    // schedule: intermediate rounds prune to max(target, 3·|V|/4)
    // (the published shrinking_factor = 0.75, exact integer), the
    // final round cuts to the target exactly.
    def prune(m: Map[String, Long], k: Int): Map[String, Long] = {
      val (sing, multi) = m.partition { case (p, _) =>
        p.codePointCount(0, p.length) == 1
      }
      val nMulti = math.max(0, k - sing.size)
      val kept = multi.toSeq.sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb
        else TextFunctions.utf8Ordering.lt(pa, pb)
      }.take(nMulti)
      sing ++ kept
    }
    var wgt = weights(seed)
    (1 until rounds).foreach { _ =>
      val cnt = census.select(col("weight"),
          explode(segmentWith(col("w"), wgt, maxPieceLen)).as("piece"))
        .groupBy(col("piece"))
        .agg(sum(col("weight")).cast("long").as("cnt"))
        .as[(String, Long)].collect().toMap
      val m = mStep(cnt)
      val kept = targetVocab match {
        case Some(t) => prune(m, math.max(t, (m.size.toLong * 3L / 4L).toInt))
        case None => m
      }
      wgt = weights(kept)
    }
    // the final round, distributed: E-step counts + coverage singles +
    // (optional) exact-size prune + in-plan scaled-log scores
    // (L(cnt) − L(total))
    val em = census.select(col("weight"),
        explode(segmentWith(col("w"), wgt, maxPieceLen)).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("weight")).cast("long").as("cnt"))
      .transform(graft.core.Caching.persist)
    val singlesDf = census.select(explode(transform(
        sequence(lit(1), length(col("w"))), i =>
          col("w").substr(i, lit(1)))).as("piece")).distinct()
    val voc0 = em.unionByName(
      singlesDf.join(em, Seq("piece"), "left_anti")
        .select(col("piece"), lit(1L).as("cnt")))
    val voc = targetVocab match {
      case None => voc0
      case Some(t) =>
        // two bounded actions on the ≤|vocab| table (the q259 charter):
        // the surviving-singles count sizes the multi quota, and the
        // top-k cut is a TakeOrdered under the same total order
        val vp = voc0.transform(graft.core.Caching.persist)
        val nSingles = vp.where(length(col("piece")) === 1).count()
        val nMulti = math.max(0L, t.toLong - nSingles).toInt
        vp.where(length(col("piece")) === 1).unionByName(
          vp.where(length(col("piece")) > 1)
            .orderBy(col("cnt").desc, col("piece")).limit(nMulti))
    }
    def sl(c: Column): Column =
      floor(log(c.cast("double")) * lit(LogScale.toDouble) + lit(0.5))
        .cast("long")
    voc.crossJoin(broadcast(
        voc.agg(sum(col("cnt")).cast("long").as("t"))))
      .select(col("piece"), col("cnt").as("n_cnt"),
        (sl(col("cnt")) - sl(col("t"))).as("score"))
  }
  /** Write a trained unigram vocabulary in the `spm_export_vocab`
    * shape (the SentencePiece dump every published pipeline consumes):
    * one `piece<TAB>score` line per piece, scores as FLOAT natural-log
    * probabilities — exactly what a real `spm_export_vocab` dump
    * carries, so an external spm-shaped consumer reads the scores in
    * the units it expects. The trainer's scaled-integer score
    * ([[scaledLog]] units, ln·10⁶) divides out exactly: it is written
    * as the 6-decimal fixed-point value score/10⁶, and
    * [[modelFromFile]] recovers the integer bit-for-bit
    * (movePointRight(6) of a 6-decimal literal is exact — no float
    * round-trip anywhere). Pieces must be tab/newline-free (the
    * reader splits on them).
    */
  def modelToFile(vocab: Seq[(String, Long)], path: String): Unit = {
    require(vocab.nonEmpty &&
      vocab.map(_._1).distinct.size == vocab.size,
      "pieces must be non-empty and distinct")
    require(vocab.forall { case (p, _) => p.nonEmpty &&
      !p.exists(c => c == '\t' || c == '\n' || c == '\r') },
      "pieces must be non-empty and tab/newline-free")
    val sb = new StringBuilder
    vocab.foreach { case (p, s) =>
      sb.append(p).append('\t')
        .append(java.math.BigDecimal.valueOf(s, 6).toPlainString)
        .append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load an [[modelToFile]]-format piece/score table back into
    * scaled-integer units. The score format is detected PER FILE, not
    * per line: if ANY score in the file carries a decimal point or
    * exponent, the whole file is float natural-log units (the spm
    * shape — real SentencePiece dumps always have fractional scores
    * somewhere, and C++ float formatting may print an individual
    * integral score as `-7`, which a per-line rule would misscale by
    * 10⁶); every score then rescales to [[scaledLog]] units, rounding
    * half-up past 6 decimals. A file with ONLY bare integers is this
    * trainer's pre-float legacy dump, already in scaled units.
    * Single-file contract (order preserved though scores, not order,
    * carry the model); 5M cap; malformed lines raise.
    */
  def modelFromFile(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[(String, Long)] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(hp)).getOrElse(Array.empty)
    require(matches.length == 1 && matches.head.isFile,
      s"model path must be exactly one file: '$path' matched " +
        s"${matches.length} entries")
    val lines = spark.read.textFile(path).collect().toSeq
      .filter(_.nonEmpty)
    require(lines.nonEmpty && lines.size <= 5000000,
      s"model has ${lines.size} lines (cap 5M)")
    val split = lines.map { l =>
      val i = l.indexOf('\t')
      require(i > 0 && i < l.length - 1 && l.indexOf('\t', i + 1) < 0,
        s"malformed model line (want 'piece<TAB>score'): '$l'")
      (l.substring(0, i), l.substring(i + 1))
    }
    val floatFile = split.exists(_._2
      .exists(c => c == '.' || c == 'e' || c == 'E'))
    val vocab = split.map { case (piece, raw) =>
      val score = try {
        if (floatFile)
          new java.math.BigDecimal(raw).movePointRight(6)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        else raw.toLong // legacy all-integer dump: already scaled
      } catch {
        case _: NumberFormatException | _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"unparseable score in model line: '$piece\t$raw'")
      }
      (piece, score)
    }
    require(vocab.map(_._1).distinct.size == vocab.size,
      "duplicate pieces in model file")
    vocab
  }

  /** Per-document token-id sequences under a TRAINED score map — the
    * [[Bpe.encodeIdsWith]] shape for the unigram family (the
    * pipeline's `tokenizerFamily = unigram` terminal): GPT-2 segment
    * units, the Viterbi split over DISTINCT segments only, ids from
    * the supplied spm-model line-order map. `maxSegLen` must be the
    * TRAINING census bound ([[segmentCensus]]'s): segments past it are
    * excluded here exactly as they were from training — they are
    * outside the trained domain, and one containing a char that never
    * appears in any in-bound segment would break the Viterbi coverage
    * guarantee (the [[applyStats]] discipline). Output schema =
    * (doc_id, n_words, n_symbols, n_blocks, ids).
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                scores: Map[String, Long], maxPieceLen: Int,
                ids: Map[String, Long], maxSegLen: Int,
                blockTokens: Int = 64): DataFrame = {
    require(maxSegLen >= 1, s"maxSegLen >= 1: $maxSegLen")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        filter(PreTokenize.gptSegments(col(textCol)),
          s => length(s) <= maxSegLen).as("t"))
      .where(size(col("t")) > 0)
    val enc = toks.select(explode(col("t")).as("w")).distinct()
      .select(col("w"), Bpe.symbolIds(
        segmentWith(col("w"), scores, maxPieceLen), ids).as("wids"))
    Bpe.assembleIds(toks, enc, blockTokens)
  }

  /** Per-`byCol` segmentation economics under a TRAINED score map —
    * the q317 report for the unigram family: segment/char/piece counts,
    * chars per piece (compression), and the ordered piece-sequence
    * hash sum (one wrong Viterbi split anywhere flips it). The Viterbi
    * runs over DISTINCT segments only (content-bounded), then joins
    * back to per-(group, segment) instance counts — corpus-sized data
    * is touched exactly twice, both map-side-combined aggregates.
    */
  def applyStats(docs: DataFrame, textCol: String, byCol: String,
                 scores: Map[String, Long], maxPieceLen: Int,
                 maxSegLen: Int): DataFrame = {
    val sw = docs.select(col(byCol).as("grp"),
        explode(PreTokenize.gptSegments(col(textCol))).as("w"))
      .where(length(col("w")) <= maxSegLen)
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("nsw"))
      .transform(graft.core.Caching.persist)
    val enc = sw.select(col("w")).distinct()
      .select(col("w"),
        segmentWith(col("w"), scores, maxPieceLen).as("p"))
      .select(col("w"), size(col("p")).cast("long").as("np"),
        TextFunctions.portableHash(array_join(col("p"), "\u0001"), 53)
          .as("h"))
    sw.join(enc, "w")
      .groupBy(col("grp"))
      .agg(sum(col("nsw")).cast("long").as("n_segments"),
        sum(col("nsw") * length(col("w"))).cast("long").as("n_chars"),
        sum(col("nsw") * col("np")).cast("long").as("n_pieces"),
        sum(col("nsw") * col("h")).cast("long").as("piece_hash_sum"))
      .select(col("grp").as(byCol), col("n_segments"), col("n_chars"),
        col("n_pieces"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"),
        col("piece_hash_sum"))
  }
}

/** Native Viterbi segmentation (see [[Unigram.segmentWith]]): string →
  * array<string> of vocabulary pieces maximizing the summed
  * scaled-integer scores; ties break to the smallest split point
  * (longest last piece). Codepoint positions throughout (matching
  * Spark substring and DuckDB substr).
  */
case class UnigramSegmentExpr(child: Expression,
                              scores: Map[String, Long],
                              maxPieceLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxPieceLen >= 1, s"maxPieceLen >= 1: $maxPieceLen")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val wgt: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](scores.size * 2)
    scores.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(in: UTF8String): ArrayData = {
    val s = in.toString
    // codepoint boundaries: offs(i) = UTF-16 offset of codepoint i
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    var o = 0
    var i = 0
    while (i < n) { offs(i) = o; o += Character.charCount(s.codePointAt(o)); i += 1 }
    offs(n) = s.length
    val best = new Array[Long](n + 1)
    val defined = new Array[Boolean](n + 1)
    val back = new Array[Int](n + 1)
    defined(0) = true
    i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (defined(j)) {
          val w = wgt.get(s.substring(offs(j), offs(i)))
          if (w != null) {
            val sc = best(j) + w.longValue()
            if (!defined(i) || sc > best(i)) { // strict: ties keep the
              best(i) = sc; back(i) = j       // smallest j seen first
              defined(i) = true
            }
          }
        }
        j += 1
      }
      if (!defined(i))
        throw new IllegalArgumentException(
          s"no vocabulary piece ends at codepoint $i of '$s' — the " +
            "coverage guarantee (all single chars in vocab) is broken")
      i += 1
    }
    val out = new java.util.ArrayList[String](n)
    var pos = n
    while (pos > 0) { out.add(s.substring(offs(back(pos)), offs(pos))); pos = back(pos) }
    val arr = new Array[Any](out.size)
    var a = 0
    while (a < out.size) {
      arr(a) = UTF8String.fromString(out.get(out.size - 1 - a)); a += 1
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", this,
      classOf[UnigramSegmentExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramSegmentExpr = copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}
