package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** A ∩ B for two SORTED-ascending distinct long arrays, returned as a
  * sorted long array — the triangle-closing kernel of
  * [[graft.operators.Graph.triangleCounts]].
  *
  * Why native: `array_intersect` builds a fresh hash set per ROW — on
  * the m-sized oriented-edge table that is m hash-set allocations
  * over √m-sized neighbor lists (measured 17 s of GC per bench run at
  * sf1, ~40% of the operator's CPU). Adjacency lists come out of
  * `sort_array(collect_list(...))` already sorted, so the
  * intersection is one allocation-free merge pass; the only
  * allocation is the exact-size result (usually empty or tiny — it
  * IS the triangle list). Callers must guarantee sortedness;
  * elements need not be unique, but duplicates pair up positionally
  * (for sets — the only graft use — the result is the set
  * intersection).
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_long_intersect"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersect.inter(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedLongIntersect.inter($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [a, b, (A ∩ B)...] for two SORTED-ascending distinct long arrays —
  * or the EMPTY array when the intersection is empty. The fused
  * triangle-contribution kernel of
  * [[graft.operators.Graph.triangleCounts]]: one merge pass per
  * oriented edge yields the edge's endpoints AND its closing nodes in
  * a single array, so ONE projection + posexplode replaces the former
  * two-branch union (endpoint counts ∪ closer explode) that re-ran
  * the adjacency probes and the merge pass TWICE per edge. Position
  * decodes the contribution: pos ≤ 1 (the endpoints) weigh |A ∩ B|
  * = size-2 triangles each; pos ≥ 2 (the closers) weigh 1. Sortedness
  * contract and duplicate semantics are [[SortedLongIntersect]]'s. */
case class SortedLongIntersectPacked(a: Expression, b: Expression,
                                     na: Expression, nb: Expression)
    extends QuaternaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = na
  override def fourth: Expression = nb

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_long_intersect_packed"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (a.dataType == LongType && b.dataType == LongType &&
        arr(na.dataType) && arr(nb.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (bigint, bigint, array<bigint>, " +
        s"array<bigint>), got ${Seq(a, b, na, nb)
          .map(_.dataType.catalogString).mkString(", ")}")
  }

  override protected def nullSafeEval(av: Any, bv: Any,
                                      nav: Any, nbv: Any): Any =
    SortedLongIntersect.interPacked(av.asInstanceOf[Long],
      bv.asInstanceOf[Long], nav.asInstanceOf[ArrayData],
      nbv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, nav, nbv) =>
      s"${ev.value} = graft.plans.SortedLongIntersect" +
        s".interPacked($av, $bv, $nav, $nbv);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(a = newFirst, b = newSecond, na = newThird, nb = newFourth)
}

object SortedLongIntersect {
  private val EMPTY =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)

  /** Runtime kernel shared by interpreted and generated paths: one
    * merge pass, one exact-size result array. */
  def inter(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return EMPTY
    val buf = new Array[Long](if (na < nb) na else nb)
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { buf(k) = x; k += 1; i += 1; j += 1 }
    }
    if (k == 0) EMPTY
    else {
      val out = if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  /** [[SortedLongIntersectPacked]]'s kernel: the merge pass of
    * [[inter]] writing into a buffer whose first two slots carry the
    * edge endpoints — EMPTY when no element intersects, so a
    * posexplode drops triangle-less edges for free. */
  def interPacked(av: Long, bv: Long, a: ArrayData, b: ArrayData)
      : ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return EMPTY
    val buf = new Array[Long]((if (na < nb) na else nb) + 2)
    buf(0) = av; buf(1) = bv
    var i = 0; var j = 0; var k = 2
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { buf(k) = x; k += 1; i += 1; j += 1 }
    }
    if (k == 2) EMPTY
    else {
      val out = if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }
}
