package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native ≤2-deletion banding: string → sorted distinct xxhash64 values
  * (seed 42, Spark's SQL `xxhash64` convention) of every string
  * reachable by deleting at most 2 characters — the complete blocking
  * key set for Levenshtein ≤ 2 that `Linkage.candidatePairs` joins on.
  *
  * Exists because the HOF formulation
  * (`array_distinct(transform(concat(array(c), del1, del2), xxhash64))`
  * with del2 a flatten of nested transforms of three `substr` slices)
  * was the dominant cost of the linkage family at sf0.1 — each variant
  * paid several UTF8String allocations through the lambda pyramid. Here
  * one scan writes each variant into a reusable scratch buffer and
  * hashes it in place: zero allocation per variant on the ASCII fast
  * path, one small String on the multibyte path (deletions are by
  * CHARACTER, matching the `substr` semantics, so multibyte text cannot
  * take the byte shortcut). `LinkageSpec` pins hash-set equality with
  * the HOF form on arbitrary (incl. multibyte) input.
  */
case class DeletionBandExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private val seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val out =
      if (bytes.length == s.numChars()) asciiVariants(bytes)
      else charVariants(s.toString)
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

  private def hashBytes(b: Array[Byte], len: Int): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, seed)

  private def asciiVariants(b: Array[Byte]): Array[Long] = {
    val n = b.length
    val out = new Array[Long](1 + n + n * (n - 1) / 2)
    var idx = 0
    out(idx) = hashBytes(b, n); idx += 1
    val scratch = new Array[Byte](if (n > 0) n else 1)
    var i = 0
    while (i < n) { // delete position i
      System.arraycopy(b, 0, scratch, 0, i)
      System.arraycopy(b, i + 1, scratch, i, n - i - 1)
      out(idx) = hashBytes(scratch, n - 1); idx += 1
      var j = i + 1
      while (j < n) { // delete i and j: shift the middle left once more
        // scratch currently holds b minus position i; removing b(j)
        // (at scratch index j−1) yields the two-deletion variant
        System.arraycopy(scratch, j, scratch, j - 1, n - 1 - j)
        out(idx) = hashBytes(scratch, n - 2); idx += 1
        // restore the single-deletion scratch for the next j
        System.arraycopy(b, j, scratch, j - 1, n - j)
        j += 1
      }
      i += 1
    }
    out
  }

  private def charVariants(str: String): Array[Long] = {
    val n = str.length
    val out = new Array[Long](1 + n + n * (n - 1) / 2)
    var idx = 0
    def hashOf(v: String): Long = {
      val u = UTF8String.fromString(v)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
    }
    out(idx) = hashOf(str); idx += 1
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(str, 0, i).append(str, i + 1, n)
      out(idx) = hashOf(sb.toString); idx += 1
      var j = i + 1
      while (j < n) {
        sb.setLength(0)
        sb.append(str, 0, i).append(str, i + 1, j).append(str, j + 1, n)
        out(idx) = hashOf(sb.toString); idx += 1
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
  def apply(col: Column): Column =
    ColumnBridge.toColumn(DeletionBandExpr(ColumnBridge.toExpression(col)))
}
