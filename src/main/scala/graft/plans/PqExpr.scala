package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization cell assignment over a float/double vector:
  * for each of the `m` codebook subspaces, the index of the centroid
  * minimizing L2 distance to that slice of the vector, computed as
  * argmax of (x_sub · c − ||c||²/2) with ties to the smallest index.
  *
  * The composed-builtins formulation (greatest over m×ksub struct
  * expressions, each wrapping a slice + dot) is semantically identical
  * but builds an expression tree Catalyst spends tens of seconds
  * analyzing; this kernel is ONE expression node with the codebooks
  * as a referenced object, and the inner loop is primitive Java.
  * Accumulation order matches the composed twin (ascending dimension,
  * sum-of-squares then halve), so assignments are bit-identical —
  * test-asserted like SqReconstruct and VecDot before it.
  */
case class PqAssign(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    PqAssign.assign(v.asInstanceOf[ArrayData], books, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PqAssign.assign($v, $booksRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAssign {
  /** Runtime kernel shared by interpreted and generated paths. */
  def assign(v: ArrayData, books: Array[Array[Array[Double]]],
             isFloat: Boolean): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val sub = book(0).length
      var bestJ = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var dot = 0.0
        var sq = 0.0
        var i = 0
        while (i < sub) {
          val x =
            if (isFloat) v.getFloat(off + i).toDouble else v.getDouble(off + i)
          dot += x * c(i)
          sq += c(i) * c(i)
          i += 1
        }
        val score = dot - sq / 2.0
        // strict > with ascending j == ties break to the smallest index
        if (score > bestScore) { bestScore = score; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** The PQ decode: codes (array<int>, one per subspace) looked up in
  * the codebooks and concatenated into the reconstructed vector. One
  * expression node for the same reason as [[PqAssign]]. */
case class PqReconstruct(child: Expression,
                         books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(v: Any): Any =
    PqReconstruct.recon(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PqReconstruct.recon($v, $booksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqReconstruct {
  /** Runtime kernel shared by interpreted and generated paths. */
  def recon(codes: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    var n = 0
    var s = 0
    while (s < m) { n += books(s)(0).length; s += 1 }
    val out = new Array[Any](n)
    var k = 0
    s = 0
    while (s < m) {
      val c = books(s)(codes.getInt(s))
      var i = 0
      while (i < c.length) { out(k) = c(i); k += 1; i += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }
}
