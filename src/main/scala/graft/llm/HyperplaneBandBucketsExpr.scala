package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native banded hyperplane-LSH buckets: ALL `bands × planesPerBand` plane
  * dot products in ONE pass over the input vector, returning the per-band
  * sign-pattern bucket ids as `array<bigint>` (index = band).
  *
  * Semantically identical to the Column-composed form
  * (`Similarity.hyperplaneBandBucketsHof`: per plane a
  * `aggregate(zip_with(vec, weights, *), 0, +) > 0` term) and to the DuckDB
  * oracle — same md5-derived plane weights, same index-order double
  * accumulation, so the IEEE result is bit-identical to the HOF form. The
  * HOF composition allocates a zipped array and runs two lambda passes PER
  * PLANE (16 planes ⇒ 32 array traversals/row); this walks the vector once
  * per plane with no allocation, weights resolved to a flat primitive
  * array at plan time.
  *
  * Implements `doGenCode` (the weight matrix rides along as a codegen
  * reference object), so the band-derivation stage stays inside
  * whole-stage codegen like the cosine scorer — as do, since r8, all
  * the other native expressions (shingles/minhash/simhash/deletion-band
  * /char-ngram/jaccard, each via a direct reference-object call).
  */
case class HyperplaneBandBucketsExpr(child: Expression, bands: Int,
                                     planesPerBand: Int, dims: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  require(bands > 0 && planesPerBand > 0 && planesPerBand <= 63)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // plane-major flat weight matrix, derived once per plan from the same
  // portable md5 hash the oracle uses (Similarity.planeWeights)
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](bands * planesPerBand * dims)
    var p = 0
    while (p < bands * planesPerBand) {
      val pw = Similarity.planeWeights(p, dims)
      var i = 0
      while (i < dims) { w(p * dims + i) = pw(i); i += 1 }
      p += 1
    }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dims)
    val out = new Array[Long](bands)
    var band = 0
    var p = 0
    while (band < bands) {
      var bucket = 0L
      var j = 0
      while (j < planesPerBand) {
        val base = p * dims
        var dot = 0.0
        var i = 0
        while (i < n) { dot += arr.getDouble(i) * weights(base + i); i += 1 }
        if (dot > 0) bucket |= (1L << j)
        p += 1
        j += 1
      }
      out(band) = bucket
      band += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val w = ctx.addReferenceObj("planeWeights", weights, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val band = ctx.freshName("band")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        int $n = java.lang.Math.min($arr.numElements(), $dims);
        long[] $out = new long[$bands];
        int $p = 0;
        for (int $band = 0; $band < $bands; $band++) {
          long $bucket = 0L;
          for (int $j = 0; $j < $planesPerBand; $j++) {
            int $base = $p * $dims;
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dot += $arr.getDouble($i) * $w[$base + $i];
            }
            if ($dot > 0) $bucket |= (1L << $j);
            $p++;
          }
          $out[$band] = $bucket;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandBucketsExpr =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_band_buckets"
}

object HyperplaneBandBucketsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(col: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    ColumnBridge.toColumn(
      HyperplaneBandBucketsExpr(ColumnBridge.toExpression(col), bands, planesPerBand, dims))
}
