package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: text → distinct n-gram array.
  *
  * Semantics identical to the Column composition
  * `array_distinct(transform(seq, j -> concat_ws(' ', slice(tokens, j, n))))`
  * over `tokens = filter(split(lower(trim(text)), "\\s+"), _ != "")`
  * (whitespace = `\s` = space, \t, \n, \x0B, \f, \r) — one scan, no
  * intermediate arrays. First-occurrence order preserved like
  * array_distinct.
  */
case class ShinglesExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Whole-stage codegen entry point (see [[doGenCode]]). */
  def compute(input: UTF8String): ArrayData = {
    val text = input.toLowerCase.toString
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens += text.substring(start, i)
    }
    if (tokens.length < n) new GenericArrayData(Array.empty[Any])
    else if (distinct) {
      val seen = new java.util.LinkedHashSet[String](tokens.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= tokens.length - n) {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(tokens(j + t))
          t += 1
        }
        seen.add(sb.toString)
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    } else {
      // occurrence mode (frequency analysis wants multiplicity): every
      // n-gram in order, one scan, no set
      val out = new Array[Any](tokens.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= tokens.length - n) {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(tokens(j + t))
          t += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object ShinglesExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(col: Column, n: Int): Column =
    ColumnBridge.toColumn(ShinglesExpr(ColumnBridge.toExpression(col), n))
  /** Occurrence-mode (non-distinct) n-grams, e.g. for frequency scoring. */
  def occurrences(col: Column, n: Int): Column =
    ColumnBridge.toColumn(
      ShinglesExpr(ColumnBridge.toExpression(col), n, distinct = false))
}
