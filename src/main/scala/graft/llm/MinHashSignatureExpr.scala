package graft.llm

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression.
  *
  * Semantically identical to the composed higher-order-function form
  * (`transform(sequence(0,k-1), i -> array_min(transform(sh, s ->
  * substr(md5(concat(i/4,'|',s)), (i%4)*8+1, 8))))`) — and to the DuckDB
  * oracle SQL — but ~20× faster: ONE pass over the shingle array per row,
  * one reused MessageDigest instance, minima tracked as unsigned 32-bit
  * ints (hex-string lexicographic order == unsigned numeric order), hex
  * formatting only for the k final winners. The HOF form allocates a
  * UTF8String per (shingle × hash) and re-parses the digest; this computes
  * ⌈k/4⌉ digests per shingle and nothing else.
  *
  * The inner digest loop dominates (measured: signature stage 25s → ~1s
  * at sf0.1); `doGenCode` additionally keeps the call inside whole-stage
  * codegen instead of paying the CodegenFallback row-boxing boundary.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  require(k > 0, "k must be positive")
  private val numDigests = (k + 3) / 4

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numDigests).map(s => s"$s|".getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Whole-stage codegen calls this directly on the generated child
    * array (see [[doGenCode]]) — the hand-written digest loop already
    * dominated; codegen removes the CodegenFallback row boxing around it.
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(-1) // unsigned max (0xFFFFFFFF)
    var hasAny = false
    var j = 0
    while (j < n) {
      val shingle = arr.getUTF8String(j)
      if (shingle != null) {
        hasAny = true
        val sb = shingle.getBytes
        var d = 0
        while (d < numDigests) {
          md.reset()
          md.update(seedPrefixes(d))
          md.update(sb)
          val dig = md.digest()
          var slice = 0
          val slices = math.min(4, k - d * 4)
          while (slice < slices) {
            val v = ((dig(slice * 4) & 0xFF) << 24) |
              ((dig(slice * 4 + 1) & 0xFF) << 16) |
              ((dig(slice * 4 + 2) & 0xFF) << 8) |
              (dig(slice * 4 + 3) & 0xFF)
            val idx = d * 4 + slice
            if (java.lang.Integer.compareUnsigned(v, mins(idx)) < 0) mins(idx) = v
            slice += 1
          }
          d += 1
        }
      }
      j += 1
    }
    if (!hasAny) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      mins.map(v => UTF8String.fromString(f"${v & 0xFFFFFFFFL}%08x"): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignatureExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignatureExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(col: Column, k: Int): Column =
    ColumnBridge.toColumn(MinHashSignatureExpr(ColumnBridge.toExpression(col), k))
}
