package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native ≤2-deletion banding: string → sorted distinct xxhash64 values
  * (seed 42, Spark's SQL `xxhash64` convention) of every string
  * reachable by deleting at most 2 CODE POINTS from the banded slice —
  * the complete blocking key set for Levenshtein ≤ 2 that
  * `Linkage.candidatePairs` joins on.
  *
  * The banded slice is the first (or, with `fromEnd`, last) min(L,
  * `prefix`) code points — SymSpell's prefix trick. Capping bounds the
  * variant fan-out at 1 + P + P(P−1)/2 keys per value REGARDLESS of
  * string length (a 100-char title pays the same ~200 keys as a name,
  * not ~5,000), and completeness for lev ≤ 2 on the FULL strings is
  * preserved: take an optimal alignment of a and b (≤ 2 edit ops) and
  * keep the matched pairs whose positions fall inside BOTH length-P
  * slices. From each slice one must delete its unmatched characters
  * (≤ #dels + #subs on that side) plus the matched characters whose
  * partner falls outside the other slice — and those boundary crossers
  * are bounded by the OTHER side's insertion count (the position offset
  * |i − j| of any matched pair is at most the inserts minus deletes so
  * far). So each side deletes ≤ dels + subs + ins = total edits ≤ 2
  * characters to reach the common matched-prefix string: the slices
  * share a ≤2-deletion variant. Edits beyond the slice never REMOVE a
  * shared key (they only add candidates, which exact scoring rejects).
  * `fromEnd` is the reversal-symmetric form (lev is invariant under
  * reversing both strings) for corpora whose key entropy is
  * suffix-loaded; pick the slice that carries the field's entropy or a
  * shared low-entropy slice degrades toward one giant band bucket
  * (`LshGuard` star-capping is the backstop, as everywhere).
  *
  * Deletions are by CODE POINT on both paths, matching Spark's
  * `substr`/`levenshtein` semantics (so the HOF twin
  * `Linkage.deletionBand` agrees on supplementary characters too — the
  * multibyte path iterates `codePoints()`, not UTF-16 units). Exists
  * because the HOF formulation was the dominant cost of the linkage
  * family at sf0.1: here one scan writes each variant into a reusable
  * scratch buffer and hashes it in place — zero allocation per variant
  * on the ASCII fast path, one small String per variant on the
  * multibyte path. `LinkageSpec`/`ArithmeticProps` pin hash-set
  * equality with the HOF form on arbitrary (incl. astral) input.
  */
case class DeletionBandExpr(child: Expression, prefix: Int, fromEnd: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)

  // bounds the variant array at ~500k entries — far beyond any sane
  // banding slice, and keeps 1 + n + n(n−1)/2 safely inside Int (an
  // uncapped 64 Ki-char input used to overflow the size computation)
  require(prefix >= 1 && prefix <= DeletionBandExpr.MaxPrefix,
    s"deletion-band prefix must be in [1, ${DeletionBandExpr.MaxPrefix}], got $prefix")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private val seed = 42L

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** The whole-stage path calls this directly on the child's generated
    * UTF8String — no CodegenFallback, so no per-row InternalRow
    * materialization and no interpreted eval dispatch; the variant
    * enumeration itself (hundreds of hashes per row) stays one JVM
    * method the JIT owns.
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out =
      if (bytes.length == s.numChars()) { // pure ASCII: code point == byte
        val n = math.min(bytes.length, prefix)
        asciiVariants(bytes, if (fromEnd) bytes.length - n else 0, n)
      } else {
        val cps = s.toString.codePoints().toArray
        val n = math.min(cps.length, prefix)
        cpVariants(cps, if (fromEnd) cps.length - n else 0, n)
      }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted hash list
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deletionBand", this,
      classOf[DeletionBandExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  private def hashBytes(b: Array[Byte], len: Int): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, seed)

  /** Variants of the byte slice b[off, off+n). */
  private def asciiVariants(b: Array[Byte], off: Int, n: Int): Array[Long] = {
    val out = new Array[Long](1 + n + n * (n - 1) / 2)
    var idx = 0
    val scratch = new Array[Byte](if (n > 0) n else 1)
    System.arraycopy(b, off, scratch, 0, n)
    out(idx) = hashBytes(scratch, n); idx += 1
    var i = 0
    while (i < n) { // delete position i: shift the suffix left over it
      System.arraycopy(b, off + i + 1, scratch, i, n - i - 1)
      out(idx) = hashBytes(scratch, n - 1); idx += 1
      var j = i + 1
      while (j < n) { // delete i and j: shift the middle left once more
        // scratch currently holds the slice minus position i; removing
        // position j (at scratch index j−1) yields the 2-deletion form
        System.arraycopy(scratch, j, scratch, j - 1, n - 1 - j)
        out(idx) = hashBytes(scratch, n - 2); idx += 1
        // restore the single-deletion scratch for the next j
        System.arraycopy(b, off + j, scratch, j - 1, n - j)
        j += 1
      }
      // restore the full slice before the next i
      System.arraycopy(b, off + i, scratch, i, n - i)
      i += 1
    }
    out
  }

  /** Variants of the code-point slice cps[off, off+n) — deletions by
    * code point, so astral characters count (and delete) as one.
    */
  private def cpVariants(cps: Array[Int], off: Int, n: Int): Array[Long] = {
    val out = new Array[Long](1 + n + n * (n - 1) / 2)
    var idx = 0
    val sb = new java.lang.StringBuilder(2 * n)
    def hashSkipping(skip1: Int, skip2: Int): Long = {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t != skip1 && t != skip2) sb.appendCodePoint(cps(off + t))
        t += 1
      }
      val u = UTF8String.fromString(sb.toString)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
    }
    out(idx) = hashSkipping(-1, -1); idx += 1
    var i = 0
    while (i < n) {
      out(idx) = hashSkipping(i, -1); idx += 1
      var j = i + 1
      while (j < n) {
        out(idx) = hashSkipping(i, j); idx += 1
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): DeletionBandExpr =
    copy(child = newChild)

  override def prettyName: String = "deletion_band_hashes"
}

object DeletionBandExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Hard ceiling on the banded slice (variant count is quadratic in
    * it; 1000 → ≤ ~500k hashes/row, still Int-safe).
    */
  val MaxPrefix = 1000

  /** Default banding slice: long enough that short key fields (names,
    * SKUs — incl. the 18-char fixture names) band on their FULL value,
    * while unboundedly long inputs pay at most 1 + 20 + 190 = 211 keys.
    */
  val DefaultPrefix = 20

  def apply(col: Column): Column = apply(col, DefaultPrefix, fromEnd = false)

  def apply(col: Column, prefix: Int, fromEnd: Boolean): Column =
    ColumnBridge.toColumn(
      DeletionBandExpr(ColumnBridge.toExpression(col), prefix, fromEnd))

  def apply(child: Expression): DeletionBandExpr =
    DeletionBandExpr(child, DefaultPrefix, fromEnd = false)
}
