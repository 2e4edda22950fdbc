package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Scalar-quantization round trip over a float/double vector: each
  * dimension `i` is quantized to an 8-bit code against per-dimension
  * corpus bounds `[lo_i, hi_i]` and immediately reconstructed:
  *
  *   code_i  = floor((x_i - lo_i) * 255 / (hi_i - lo_i) + 0.5)
  *   recon_i = lo_i + code_i * (hi_i - lo_i) / 255
  *
  * (hi_i == lo_i degenerates to recon_i = lo_i.) This is the scoring
  * kernel of SQ-compressed ANN: at scale the corpus stores only the
  * codes (4× less scan IO than float32), and search ranks against the
  * reconstruction. Quantize-then-reconstruct in one pass keeps the
  * operator a pure projection over the scan.
  *
  * A composed-builtins twin (`VecFns.sqReconstructComposed`) exists as
  * the semantic reference; like the LSH signature before it, the hot
  * path must not run interpreted higher-order functions over every
  * corpus row, so this expression compiles to a primitive loop.
  * floor(+0.5) instead of round() keeps the code decision re-derivable
  * bit-identically by any engine (the DuckDB oracle re-runs the same
  * formula from scratch).
  */
case class SqReconstruct(child: Expression, lo: Seq[Double], hi: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_reconstruct"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val loArr = lo.toArray
  @transient private lazy val hiArr = hi.toArray

  override def nullSafeEval(v: Any): Any =
    SqReconstruct.recon(v.asInstanceOf[ArrayData], loArr, hiArr, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", loArr, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hiArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.SqReconstruct.recon($v, $loRef, $hiRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqReconstruct {
  /** Runtime kernel shared by interpreted and generated paths. */
  def recon(v: ArrayData, lo: Array[Double], hi: Array[Double],
            isFloat: Boolean): ArrayData = {
    // a dim mismatch must fail loudly, not silently drop trailing dims
    require(v.numElements() == lo.length,
      s"sq_reconstruct: vector dim ${v.numElements()} != bounds dim ${lo.length}")
    val n = lo.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val l = lo(i); val h = hi(i)
      out(i) =
        if (h == l) l
        else {
          // clamp: values outside [lo, hi] (an appended vector scored
          // against frozen bounds) saturate at the lattice ends rather
          // than extrapolating — matching what the stored byte code
          // (SqEncode) can actually represent
          val code = math.min(255.0,
            math.max(0.0, math.floor((x - l) * 255.0 / (h - l) + 0.5)))
          l + code * (h - l) / 255.0
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}
