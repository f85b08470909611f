package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram census: lowercased text → (n_grams,
  * n_distinct) in ONE scan, the two numbers the q215 compressibility
  * filter needs.
  *
  * Semantics identical to the Column composition over `low = lower(text)`:
  * `size(transform(sequence(1, length(low) − n + 1), i → low.substr(i, n)))`
  * and `size(array_distinct(...))` — lowercasing via UTF8String (what
  * Spark's `lower()` runs) and windows over CODE POINTS (what `substr`
  * counts). Exists because the HOF form was the slowest query in the
  * whole bench (~9 s at sf0.1): ~L substr allocations per row through
  * the lambda interpreter plus a string-set distinct. Here the common
  * BMP-only case packs each n≤4-gram's code points into one long
  * (bijective — 4×16 bits — so the distinct count is EXACT, no
  * hashing) and dedupes with a sort over a primitive array; text with
  * supplementary characters falls back to a string set.
  */
case class CharNgramStatsExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)

  require(n >= 1 && n <= 4, "long-packing supports n-grams up to 4 chars")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Whole-stage codegen calls this directly on the child's generated
    * UTF8String (see [[doGenCode]]) — the census loop is one JIT-owned
    * method either way; what codegen removes is the CodegenFallback
    * row-boxing boundary around it.
    */
  def compute(input: UTF8String): InternalRow = {
    val text = input.toLowerCase.toString
    val cps = text.codePoints().toArray
    val total = cps.length - n + 1
    if (total <= 0) return InternalRow(0L, 0L)
    var bmp = true
    var i = 0
    while (i < cps.length && bmp) { if (cps(i) > 0xFFFF) bmp = false; i += 1 }
    val distinct =
      if (bmp) {
        val packs = new Array[Long](total)
        var j = 0
        while (j < total) {
          var p = 0L
          var t = 0
          while (t < n) { p = (p << 16) | cps(j + t); t += 1 }
          packs(j) = p
          j += 1
        }
        java.util.Arrays.sort(packs)
        var d = 1
        var k = 1
        while (k < total) { if (packs(k) != packs(k - 1)) d += 1; k += 1 }
        d.toLong
      } else {
        val seen = new java.util.HashSet[String](total * 2)
        var j = 0
        while (j < total) { seen.add(new String(cps, j, n)); j += 1 }
        seen.size.toLong
      }
    InternalRow(total.toLong, distinct)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgramStats", this,
      classOf[CharNgramStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_stats"
}

object CharNgramStatsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(col: Column, n: Int): Column =
    ColumnBridge.toColumn(CharNgramStatsExpr(ColumnBridge.toExpression(col), n))
}
