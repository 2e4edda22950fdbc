package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Residual product-quantization ENCODE — the IVF-PQ coding FAISS
  * actually ships: the vector is assigned to its nearest coarse
  * centroid (max cosine, ties to the smallest cell — identical rule
  * to `Similarity.cellOf`), and PQ codes are taken over the RESIDUAL
  * `x − centroid(x)`, which has far less energy than x itself, so the
  * same code budget reconstructs with less error.
  *
  * Output layout: `[cell, code_0, …, code_{m-1}]` — one array<int>
  * column carries the whole coarse+fine coding, and
  * [[ResidualPqDecode]] inverts it. One expression node for the same
  * Catalyst-analysis-cost reason as [[PqAssign]].
  */
case class ResidualPqEncode(child: Expression,
                            cents: Array[Array[Double]],
                            books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "residual_pq_encode"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    ResidualPqEncode.encode(v.asInstanceOf[ArrayData], cents, books,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("rpqCents", cents, "double[][]")
    val booksRef = ctx.addReferenceObj("rpqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.ResidualPqEncode.encode($v, $centsRef, $booksRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ResidualPqEncode {
  /** Coarse assignment: argmax over cells of (v·c)/||c|| (the cosine
    * argmax — same rule as Similarity.cellOf, zero-norm cell scores
    * 0), ties to the smallest cell. */
  def coarseCell(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var cell = 0
    while (cell < cents.length) {
      val c = cents(cell)
      var dot = 0.0
      var sq = 0.0
      var i = 0
      while (i < c.length) { dot += x(i) * c(i); sq += c(i) * c(i); i += 1 }
      val n = math.sqrt(sq)
      val score = if (n == 0.0) 0.0 else dot * (1.0 / n)
      if (score > bestScore) { bestScore = score; best = cell }
      cell += 1
    }
    best
  }

  /** Runtime kernel shared by interpreted and generated paths. */
  def encode(v: ArrayData, cents: Array[Array[Double]],
             books: Array[Array[Array[Double]]],
             isFloat: Boolean): ArrayData = {
    val dim = cents(0).length
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val cell = coarseCell(x, cents)
    val cvec = cents(cell)
    val m = books.length
    val out = new Array[Any](m + 1)
    out(0) = cell
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
        var k = 0
        while (k < sub) {
          val r = x(off + k) - cvec(off + k) // the residual
          dot += r * c(k)
          sq += c(k) * c(k)
          k += 1
        }
        val score = dot - sq / 2.0
        if (score > bestScore) { bestScore = score; bestJ = j }
        j += 1
      }
      out(s + 1) = bestJ
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Inverts [[ResidualPqEncode]]: recon = centroid(cell) + decoded
  * residual codes, concatenated across subspaces. */
case class ResidualPqDecode(child: Expression,
                            cents: Array[Array[Double]],
                            books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "residual_pq_decode"

  override def nullSafeEval(v: Any): Any =
    ResidualPqDecode.decode(v.asInstanceOf[ArrayData], cents, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("rpqCents", cents, "double[][]")
    val booksRef = ctx.addReferenceObj("rpqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.ResidualPqDecode.decode($v, $centsRef, $booksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ResidualPqDecode {
  /** Runtime kernel shared by interpreted and generated paths. */
  def decode(codes: ArrayData, cents: Array[Array[Double]],
             books: Array[Array[Array[Double]]]): ArrayData = {
    val cvec = cents(codes.getInt(0))
    val m = books.length
    val out = new Array[Any](cvec.length)
    var k = 0
    var s = 0
    while (s < m) {
      val c = books(s)(codes.getInt(s + 1))
      var i = 0
      while (i < c.length) { out(k) = cvec(k) + c(i); k += 1; i += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }
}
