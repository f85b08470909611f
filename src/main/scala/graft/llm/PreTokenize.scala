package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 pre-tokenizer (the published `gpt2.py` split pattern):
  *
  * {{{ 's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+ }}}
  *
  * applied as a left-to-right leftmost-first scan, producing the
  * segment list every GPT-2/HF-lineage tokenizer feeds to byte-level
  * BPE. The segments PARTITION the input — `concat(segments) == text`
  * exactly — so case is preserved, a word keeps its single leading
  * space (the Ġ prefix after the byte remap), contractions split off
  * (`don't` → `don`, `'t`), letter/digit/punctuation runs separate,
  * and a whitespace run of n before a non-space yields the first n−1
  * chars as one segment with the last space attaching to the next word
  * (the `(?!\S)` backtrack).
  *
  * Implementation: a hand-rolled scanner (zero regex machinery in the
  * hot path, one pass, no backtracking) pinned value-identical to
  * `java.util.regex` running the published pattern under
  * `UNICODE_CHARACTER_CLASS` by PreTokenizeSpec (vectors + seeded
  * fuzz). Character classes follow that flag: `\p{L}` =
  * `Character.isLetter`, `\p{N}` = general categories Nd/Nl/No, `\s` =
  * the Unicode White_Space property. (DuckDB/RE2's `\s` is
  * ASCII-only — the q309 oracle equivalence is exercised on
  * ASCII-whitespace text; full-Unicode whitespace is pinned by the
  * regex-equivalence spec instead.)
  *
  * Scale shape: a pure per-row codegen'd expression — segmentation
  * adds zero joins and zero shuffles at any corpus size, exactly like
  * [[BpeApplyExpr]] downstream of it.
  */
object PreTokenize {

  /** GPT-2 segment array of a text column (empty array for ""). */
  def gptSegments(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(
      GptPreTokenizeExpr(ColumnBridge.toExpression(text)))
  }

  /** [[gptSegments]] with ADDED SPECIAL TOKENS (the HF/GPT-2
    * `AddedVocabulary` contract): occurrences of any special token are
    * segmented out FIRST — leftmost match wins, longest special wins at
    * the same position — as unsplittable segments, and each text chunk
    * BETWEEN occurrences runs through the pre-tokenizer independently
    * (a space before a special is a trailing whitespace run of its own
    * chunk, never attached across the special). Segments still
    * partition the text: `concat(segments) == text` exactly.
    *
    * This is what makes an encode faithful on documents whose TEXT
    * contains the literal token (crawl text about LLMs does): without
    * it, `<|endoftext|>` would be BPE'd as ordinary punctuation and
    * the ids would diverge from a production tokenizer's.
    */
  def gptSegmentsSpecial(text: Column, specials: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(
      GptPreTokenizeExpr(ColumnBridge.toExpression(text), specials))
  }

  /** Unicode White_Space property — what `\s` means under Java's
    * UNICODE_CHARACTER_CLASS (and Python's `\s` on str), NOT
    * `Character.isWhitespace` (which adds 0x1C–0x1F and drops the
    * non-breaking spaces).
    */
  def isWs(cp: Int): Boolean =
    (cp >= 0x9 && cp <= 0xD) || cp == 0x20 || cp == 0x85 || cp == 0xA0 ||
      cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 ||
      cp == 0x2029 || cp == 0x202F || cp == 0x205F || cp == 0x3000

  /** `\p{N}` = Nd | Nl | No (Character.isDigit is Nd only). */
  def isNum(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  /** The scanner behind [[gptSegments]], exposed for specs. */
  def segments(s: String): Seq[String] = toSeq(segmentList(s))

  /** The scanner behind [[gptSegmentsSpecial]], exposed for specs. */
  def segmentsSpecial(s: String, specials: Seq[String]): Seq[String] =
    toSeq(segmentListSpecial(s, sortedSpecials(specials)))

  private def toSeq(out: java.util.ArrayList[String]): Seq[String] = {
    val b = Seq.newBuilder[String]
    var i = 0
    while (i < out.size) { b += out.get(i); i += 1 }
    b.result()
  }

  /** Longest-first probe order; validates the list once. */
  private[llm] def sortedSpecials(specials: Seq[String]): Array[String] = {
    require(specials.nonEmpty && specials.forall(_.nonEmpty),
      "special tokens must be non-empty strings")
    require(specials.distinct.size == specials.size,
      s"duplicate special tokens: $specials")
    specials.sortBy(t => (-t.length, t)).toArray
  }

  /** Special-aware scan: at each position, the longest matching
    * special token wins (scanning left to right gives leftmost-first);
    * the chunks between matches pre-tokenize independently through
    * [[segmentList]].
    */
  private[llm] def segmentListSpecial(s: String,
      byLen: Array[String]): java.util.ArrayList[String] = {
    val n = s.length
    val out = new java.util.ArrayList[String](n / 4 + 4)
    var start = 0
    var i = 0
    while (i < n) {
      var hit: String = null
      var j = 0
      while (hit == null && j < byLen.length) {
        if (s.startsWith(byLen(j), i)) hit = byLen(j)
        j += 1
      }
      if (hit != null) {
        if (i > start) out.addAll(segmentList(s.substring(start, i)))
        out.add(hit)
        i += hit.length
        start = i
      } else i += 1
    }
    if (start < n) out.addAll(segmentList(s.substring(start, n)))
    out
  }

  private[llm] def segmentList(s: String): java.util.ArrayList[String] = {
    val n = s.length
    val out = new java.util.ArrayList[String](n / 4 + 4)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var matched = false
      // 1. contractions — exact LOWERCASE ASCII, leftmost-first like
      // the pattern's alternation ("CAN'T" does NOT split 't — the
      // published pattern's documented case quirk)
      if (c == '\'' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        val len =
          if ((c1 == 'r' || c1 == 'v') && i + 2 < n && s.charAt(i + 2) == 'e') 3
          else if (c1 == 'l' && i + 2 < n && s.charAt(i + 2) == 'l') 3
          else if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') 2
          else 0
        if (len > 0) {
          out.add(s.substring(i, i + len)); i += len; matched = true
        }
      }
      if (!matched) {
        // 2–4. ` ?\p{L}+` / ` ?\p{N}+` / ` ?[^\s\p{L}\p{N}]+`: an
        // optional single LITERAL space attaches to the run after it
        var k = -1
        if (c == ' ' && i + 1 < n && !isWs(s.codePointAt(i + 1))) k = i + 1
        else if (!isWs(s.codePointAt(i))) k = i
        if (k >= 0) {
          val cp0 = s.codePointAt(k)
          var e = k
          if (Character.isLetter(cp0)) {
            while (e < n && Character.isLetter(s.codePointAt(e)))
              e += Character.charCount(s.codePointAt(e))
          } else if (isNum(cp0)) {
            while (e < n && isNum(s.codePointAt(e)))
              e += Character.charCount(s.codePointAt(e))
          } else {
            var stop = false
            while (e < n && !stop) {
              val cp = s.codePointAt(e)
              if (isWs(cp) || Character.isLetter(cp) || isNum(cp)) stop = true
              else e += Character.charCount(cp)
            }
          }
          out.add(s.substring(i, e)); i = e
        } else {
          // 5–6. whitespace: a run before a non-space gives up its
          // last char (the `(?!\S)` backtrack — it attaches to the
          // next segment when it is a literal space); a trailing run
          // and a single non-space-attachable char match whole
          var e = i
          while (e < n && isWs(s.codePointAt(e)))
            e += Character.charCount(s.codePointAt(e))
          if (e >= n) { out.add(s.substring(i, e)); i = e }
          else if (e - i >= 2) {
            // ws chars are BMP (single chars) — e-1 is a char boundary
            out.add(s.substring(i, e - 1)); i = e - 1
          } else { out.add(s.substring(i, e)); i = e }
        }
      }
    }
    out
  }
}

/** Native GPT-2 pre-tokenize (see [[PreTokenize]]): string →
  * array<string> of segments that partition the input. With a
  * non-empty `specials` list, the special-aware scan
  * ([[PreTokenize.segmentListSpecial]]) runs instead — same pure
  * per-row zero-shuffle shape; the probe list ships with the task
  * binary.
  */
case class GptPreTokenizeExpr(child: Expression,
                              specials: Seq[String] = Nil)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val byLen: Array[String] =
    if (specials.isEmpty) Array.empty
    else PreTokenize.sortedSpecials(specials)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(in: UTF8String): ArrayData = {
    val segs =
      if (specials.isEmpty) PreTokenize.segmentList(in.toString)
      else PreTokenize.segmentListSpecial(in.toString, byLen)
    val arr = new Array[Any](segs.size)
    var i = 0
    while (i < segs.size) {
      arr(i) = UTF8String.fromString(segs.get(i)); i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gptPreTok", this,
      classOf[GptPreTokenizeExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : GptPreTokenizeExpr = copy(child = newChild)

  override def prettyName: String = "gpt_pretokenize"
}
