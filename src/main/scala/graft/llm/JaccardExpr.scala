package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native exact Jaccard similarity |A ∩ B| / |A ∪ B| over two arrays,
  * treated as sets (elements deduplicated; two NULL elements compare
  * equal, matching `array_intersect`/`array_distinct` SQL semantics).
  *
  * For the pre-distinct shingle arrays every call site feeds it, this
  * is value-identical (incl. the final double division, computed the
  * same way) to the HOF form it replaced —
  * `size(array_intersect(a,b)) / (size(a)+size(b)−size(array_intersect))`
  * — but runs ONE hash-set pass instead of materializing the
  * intersection array, and, as a single named Catalyst node, is a shape
  * [[graft.plans.JaccardSizeRatioRule]] can recognize to attach the
  * free size-ratio prefilter to `jaccard_sim(a,b) >= t` predicates
  * (reference point: FLINK.NET ships no similarity operators at all —
  * this backs the dedup/linkage extension family, q43/q140/q214).
  *
  * Element comparison uses the catalyst values' own equals/hashCode
  * (UTF8String, boxed numerics) — correct for atomic element types,
  * which is all the shingle/token pipelines produce.
  */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      // ATOMIC elements only: the hash-set pass compares catalyst
      // values with their own equals/hashCode, which is well-defined
      // for atomics (UTF8String, boxed numerics) but REPRESENTATION-
      // dependent for nested types (UnsafeArrayData vs GenericArrayData
      // never compare equal) — the same reason Spark bans maps as
      // grouping keys. Reject at analysis instead of silently scoring 0.
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r &&
            org.apache.spark.sql.catalyst.util.TypeUtils
              .typeWithProperEquals(l) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "jaccard_sim needs two arrays of the same ATOMIC element type " +
            s"(nested element types have no stable value equality), got $l / $r")
    }
  }

  @transient private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Whole-stage codegen calls this directly on the generated child
    * arrays (see [[doGenCode]]) — no CodegenFallback row boxing in the
    * exact-verify join stage this expression gates.
    */
  def compute(aa: ArrayData, bb: ArrayData): Double = {
    val sa = new java.util.HashSet[Any]()
    var aNull = false
    var i = 0
    while (i < aa.numElements()) {
      if (aa.isNullAt(i)) aNull = true else sa.add(aa.get(i, elemType))
      i += 1
    }
    var inter = 0
    var bNull = false
    val seenB = new java.util.HashSet[Any]()
    var j = 0
    while (j < bb.numElements()) {
      if (bb.isNullAt(j)) bNull = true
      else {
        val v = bb.get(j, elemType)
        if (seenB.add(v) && sa.contains(v)) inter += 1
      }
      j += 1
    }
    val na = sa.size + (if (aNull) 1 else 0)
    val nb = seenB.size + (if (bNull) 1 else 0)
    val interAll = inter + (if (aNull && bNull) 1 else 0)
    val union = na + nb - interAll
    if (union == 0) 0.0 else interAll.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccard", this, classOf[JaccardExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sim"
}

object JaccardExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      JaccardExpr(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
