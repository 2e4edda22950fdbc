package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Scalar-quantization ENCODE: each dimension of a float/double vector
  * becomes its 8-bit code against per-dimension bounds `[lo_i, hi_i]`:
  *
  *   code_i = floor((x_i - lo_i) * 255 / (hi_i - lo_i) + 0.5)
  *
  * stored OFFSET-BINARY (code − 128) so the 0..255 lattice fits
  * Spark's signed ByteType — one byte per dimension on disk, 4× less
  * than float32. [[SqDecode]] inverts the offset and reconstructs;
  * encode∘decode equals [[SqReconstruct]]'s one-pass round trip
  * (test-asserted), so everything proven about the in-flight kernel
  * carries over to the persisted form. */
case class SqEncode(child: Expression, lo: Seq[Double], hi: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "sq_encode"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val loArr = lo.toArray
  @transient private lazy val hiArr = hi.toArray

  override def nullSafeEval(v: Any): Any =
    SqEncode.encode(v.asInstanceOf[ArrayData], loArr, hiArr, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", loArr, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hiArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.SqEncode.encode($v, $loRef, $hiRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqEncode {
  /** Runtime kernel shared by interpreted and generated paths. */
  def encode(v: ArrayData, lo: Array[Double], hi: Array[Double],
             isFloat: Boolean): ArrayData = {
    // a dim mismatch must fail loudly, not silently drop trailing dims
    require(v.numElements() == lo.length,
      s"sq_encode: vector dim ${v.numElements()} != bounds dim ${lo.length}")
    val n = lo.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val l = lo(i); val h = hi(i)
      val code =
        if (h == l) 0
        // clamp: out-of-range values (frozen bounds, new data) must
        // saturate, not wrap through the signed byte
        else math.min(255, math.max(0,
          math.floor((x - l) * 255.0 / (h - l) + 0.5).toInt))
      out(i) = (code - 128).toByte
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Scalar-quantization DECODE: offset-binary byte codes back to the
  * reconstructed double vector, recon_i = lo_i + code_i·(hi_i−lo_i)/255
  * (hi == lo degenerates to the constant lo). */
case class SqDecode(child: Expression, lo: Seq[Double], hi: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_decode"

  @transient private lazy val loArr = lo.toArray
  @transient private lazy val hiArr = hi.toArray

  override def nullSafeEval(v: Any): Any =
    SqDecode.decode(v.asInstanceOf[ArrayData], loArr, hiArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", loArr, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hiArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.SqDecode.decode($v, $loRef, $hiRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqDecode {
  /** Runtime kernel shared by interpreted and generated paths. */
  def decode(codes: ArrayData, lo: Array[Double],
             hi: Array[Double]): ArrayData = {
    require(codes.numElements() == lo.length,
      s"sq_decode: code dim ${codes.numElements()} != bounds dim ${lo.length}")
    val n = lo.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val l = lo(i); val h = hi(i)
      out(i) =
        if (h == l) l
        else l + (codes.getByte(i) + 128).toDouble * (h - l) / 255.0
      i += 1
    }
    new GenericArrayData(out)
  }
}
