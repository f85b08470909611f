package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token-window chunking + hashing: token array → array of
  * (ctoks, chash) structs in ONE pass, the hot path under every
  * chunk-granular operator (q232/q262/q268–q271/q276/q280/q281 and the
  * chunk-based streaming twins).
  *
  * Semantics identical to the Column composition
  * `transform(sequence(0, nw-1), i -> struct(size(slice(t, i*stride+1,
  * c)), portableHash(concat_ws(' ', slice(t, i*stride+1, c)), seed)))`
  * — but the per-chunk `slice` array copy and `concat_ws` string
  * materialization are gone: the md5 digest streams the token bytes
  * (with single-space joins and the `"$seed|"` prefix) directly, so
  * each chunk costs one digest and zero intermediate allocations.
  * `stride == c` gives the non-overlapping chunking, `stride < c` the
  * sliding RAG windows; the window-count formula
  * (n ≤ c → 1, else ceil((n−c)/stride)+1) reduces to ceil(n/c) at
  * stride = c, so ONE expression serves both faces. Empty arrays chunk
  * to empty arrays (the `sequence(0,−1)` guard is structural here).
  *
  * The hash is the portable 32-bit value every oracle reproduces:
  * first 4 md5 bytes of `"$seed|" + tokens.mkString(" ")` as an
  * unsigned big-endian int (= `TextFunctions.portableHash`).
  */
case class ChunkStructsExpr(child: Expression, c: Int, stride: Int,
                            seed: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(c >= 1, s"chunk size must be >= 1, got $c")
  require(stride >= 1 && stride <= c,
    s"stride must be in [1, $c], got $stride")

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ctoks", LongType, nullable = false),
    StructField("chash", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  @transient private lazy val seedPrefix: Array[Byte] =
    s"$seed|".getBytes(StandardCharsets.UTF_8)

  @transient private lazy val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Whole-stage codegen entry point (see [[doGenCode]]). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nw =
      if (n <= c) 1
      else (n - c + stride - 1) / stride + 1
    val out = new Array[Any](nw)
    val md = localMd5.get()
    val space = ' '.toByte
    var w = 0
    while (w < nw) {
      val st = w * stride
      val en = math.min(st + c, n)
      md.reset()
      md.update(seedPrefix)
      var j = st
      var wrote = false
      while (j < en) {
        // concat_ws parity: null elements contribute neither bytes nor
        // a separator, but still count toward ctoks (= size(slice)).
        if (!arr.isNullAt(j)) {
          if (wrote) md.update(space)
          md.update(arr.getUTF8String(j).getBytes)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(w) = InternalRow((en - st).toLong, h)
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunker", this,
      classOf[ChunkStructsExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ChunkStructsExpr = copy(child = newChild)

  override def prettyName: String = "chunk_structs"
}

object ChunkStructsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(tokens: Column, c: Int, stride: Int, seed: Int): Column =
    ColumnBridge.toColumn(
      ChunkStructsExpr(ColumnBridge.toExpression(tokens), c, stride, seed))
}
