package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two array<double> columns: dot product and
  * both norms accumulate in ONE loop over primitive doubles — versus three
  * separate interpreted `zip_with`/`aggregate` passes (each allocating a
  * boxed intermediate array) for the Column-composed form. Same value
  * (IEEE, same accumulation order); the spec asserts equality.
  *
  * Implements `doGenCode` (not CodegenFallback): the exact-scoring stage of
  * every similarity query stays inside whole-stage codegen — no per-row
  * virtual eval call, no InternalRow boxing — with the generated loop
  * mirroring the interpreted one statement-for-statement.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $a.getDouble($i);
          double $yv = $b.getDouble($i);
          $dot += $xv * $yv;
          $nx += $xv * $xv;
          $ny += $yv * $yv;
        }
        double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        if ($denom == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / $denom;
        }
      """
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarityExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      CosineSimilarityExpr(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
