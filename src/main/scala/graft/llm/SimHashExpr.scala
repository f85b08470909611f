package graft.llm

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash over a token array: one md5 digest per token, `bits`
  * majority counters updated in a single pass. Semantically identical to
  * the Column form (`Dedup.simhashHof`) — token hash = first 8 hex chars of
  * md5("0|" + token) as unsigned 32-bit, bit b of the result set iff more
  * than half the tokens have bit b set — but ~`bits`× cheaper: the HOF
  * composition re-evaluates the token-hash transform inside every bit term.
  *
  * `bits` up to 64: widths ≤ 32 keep the historical 32-bit token hash
  * (md5 bytes 0-3); wider hashes take md5 bytes 0-7 big-endian, so bit b
  * of a 64-bit simhash is NOT bit b of the 32-bit one. 64-bit is the
  * near-dup banding width: 16-bit pigeonhole bands give 65,536 buckets per
  * band instead of the 256 an 8-bit band of a 32-bit hash allows.
  */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  require(bits >= 1 && bits <= 64)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val prefix = "0|".getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Whole-stage codegen entry point (see [[doGenCode]]). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var total = 0
    var j = 0
    while (j < n) {
      val tok = arr.getUTF8String(j)
      if (tok != null) {
        total += 1
        md.reset()
        md.update(prefix)
        md.update(tok.getBytes)
        val dig = md.digest()
        val h =
          if (bits <= 32)
            ((dig(0) & 0xFF).toLong << 24) | ((dig(1) & 0xFF) << 16) |
              ((dig(2) & 0xFF) << 8) | (dig(3) & 0xFF)
          else {
            var v = 0L
            var i = 0
            while (i < 8) { v = (v << 8) | (dig(i) & 0xFF); i += 1 }
            v
          }
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > total) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(col: Column, bits: Int): Column =
    ColumnBridge.toColumn(SimHashExpr(ColumnBridge.toExpression(col), bits))
}
