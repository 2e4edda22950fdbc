package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Deterministic orthogonal rotation of a float/double vector — the
  * OPQ-style pre-transform for product quantization:
  *
  *   y = (1/√d) · H_d · (D ⊙ x)
  *
  * where `H_d` is the Walsh-Hadamard matrix (d a power of two) and
  * `D` a ±1 sign diagonal derived from `seed` by a splitmix64 hash.
  * The transform is exactly orthogonal (norms and inner products are
  * preserved, so cosine RANKINGS in rotated space equal those in the
  * original space) while spreading each input coordinate's energy
  * across ALL output coordinates — PQ sub-codebooks then quantize
  * balanced, decorrelated subspaces instead of whatever the raw
  * coordinate blocks happened to hold. This is the classic
  * randomized-Hadamard surrogate for learned OPQ rotations: no SVD,
  * no training, bit-reproducible across runs and engines.
  *
  * Cost is O(d·log d) per row in one primitive loop (the in-place
  * butterfly below), run as a pure projection over the scan; a
  * materialized-matrix rotation would be O(d²) and a composed
  * expression tree would be d² Catalyst nodes (the analysis-time
  * blowup the PQ kernels already ruled out).
  */
case class HadamardRotate(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hadamard_rotate"

  // analysis-time type gate: without it a non-array child surfaces as
  // a ClassCastException from elemIsFloat mid-execution (or codegen)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, " +
        s"got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    HadamardRotate.rotate(v.asInstanceOf[ArrayData], seed, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.HadamardRotate.rotate($v, ${seed}L, $elemIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HadamardRotate {

  /** The ±1 sign diagonal as values — what an external oracle embeds
    * to re-derive the rotation independently (the Hadamard matrix
    * itself is re-derivable from bit_count(i & j)). */
  def signs(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => if (signBit(seed, i)) 1 else -1)

  /** splitmix64 finalizer — the sign diagonal: bit 0 of mix(seed+i). */
  private def signBit(seed: Long, i: Int): Boolean = {
    var z = seed + 0x9E3779B97F4A7C15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 1L) == 1L
  }

  /** Runtime kernel shared by interpreted and generated paths. */
  def rotate(v: ArrayData, seed: Long, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    require(n > 0 && (n & (n - 1)) == 0,
      s"hadamard_rotate needs a power-of-two dim, got $n")
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      buf(i) = if (signBit(seed, i)) x else -x
      i += 1
    }
    // in-place fast Walsh-Hadamard butterfly, O(n log n)
    var h = 1
    while (h < n) {
      var b = 0
      while (b < n) {
        var j = b
        while (j < b + h) {
          val a = buf(j); val c = buf(j + h)
          buf(j) = a + c; buf(j + h) = a - c
          j += 1
        }
        b += 2 * h
      }
      h *= 2
    }
    val s = 1.0 / math.sqrt(n.toDouble)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = buf(i) * s; i += 1 }
    new GenericArrayData(out)
  }
}
