package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact distributed Gram accumulator for the PCA pass (q259): one
  * corpus scan folds each quantized d-vector into a fixed
  * `1 + d + d²`-long buffer — row count, per-coordinate sums, and the
  * d×d outer-product cell sums — with ZERO row amplification. Replaces
  * the declarative form that posexploded `flatten(transform(transform))`
  * into d² = 4096 materialized rows per vector (the r9 bench's hottest
  * line at 22.4 s: the shuffle was already bounded by map-side partial
  * aggregation, but every input row paid 4096× amplification through
  * the codegen pipeline before the hash aggregate could collapse it).
  *
  * Exactness: inputs are 2^14-grid longs (|q| ≲ 2^15, see
  * `KMeans.Scale`), so each product fits in 2^30 and every sum is an
  * exact long until ~2^33 rows reach ONE buffer; all additions go
  * through `Math.addExact`, so past that bound the aggregate fails
  * loudly instead of wrapping. Callers bound the per-buffer row count
  * by hash-splitting the corpus into G groups (q259 uses G = 64; the
  * ≤G result rows then combine in DECIMAL downstream), which pushes
  * the loud-failure horizon to G·2^33 rows — re-shard G upward long
  * before a 100 TB corpus approaches it.
  *
  * Buffer layout: `[0]` = n, `[1, d]` = Σq_i, `[1+d, d²)` = Σ q_i·q_j
  * row-major. Output struct `(n, s, p)` mirrors that layout.
  */
case class GramMatrixAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // d = 512 ⇒ a ~2.1 MB long buffer per GROUP; the caller owns keeping
  // groups × (1+d+d²) × 8 B inside executor memory (q259: 64 groups ×
  // d=64 ≈ 2 MB total). The previous 4096 bound allowed ~134 MB per
  // group — a handful of groups OOMed the hash aggregate long before
  // addExact could trip.
  require(d >= 1 && d <= 512, s"dimension must be in [1, 512], got $d")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("p", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + d + d * d)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf // null vectors contribute no rows (posexplode parity)
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == d,
      s"expected $d-dim quantized vector, got ${arr.numElements()}")
    val q = arr.toLongArray()
    buf(0) = Math.addExact(buf(0), 1L)
    var i = 0
    while (i < d) {
      val qi = q(i)
      buf(1 + i) = Math.addExact(buf(1 + i), qi)
      val base = 1 + d + i * d
      var j = 0
      while (j < d) {
        buf(base + j) = Math.addExact(buf(base + j), qi * q(j))
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) = Math.addExact(buf(i), other(i))
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = InternalRow(
    buf(0),
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + d)),
    new GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 1 + d, 1 + d + d * d)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : GramMatrixAgg = copy(child = newChild)
  override def prettyName: String = "gram_matrix"
}

object GramMatrixAgg {
  /** Aggregate Column over a quantized `array<long>` vector column:
    * one struct `(n, s: array<long>[d], p: array<long>[d·d])` per group.
    */
  def gram(vec: Column, d: Int): Column = ColumnBridge.toColumn(
    GramMatrixAgg(ColumnBridge.toExpression(vec), d).toAggregateExpression())
}
