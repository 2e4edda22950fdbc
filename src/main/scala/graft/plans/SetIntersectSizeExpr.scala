package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two string-array SETS (distinct elements) — the
  * n-gram overlap kernel of the Jaccard/containment verify stages.
  *
  * Why native: `size(array_intersect(a, b))` materializes the whole
  * intersection ARRAY only to take its length, and the sibling
  * `size(array_union(a, b))` builds a second hash table and a second
  * throwaway array — and because the threshold predicate gets pushed
  * into the pair-join condition while the score is also projected,
  * those allocations run TWICE per surviving pair. This kernel is one
  * hash build over the smaller set + one probe pass, no allocation;
  * |A ∪ B| falls out as |A| + |B| − |A∩B| from precomputed set sizes.
  */
case class SetIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetIntersectSize.inter(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SetIntersectSize.inter($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetIntersectSize {
  /** Runtime kernel shared by interpreted and generated paths.
    * Inputs are SETS (distinct elements) — each probe hit counts one
    * shared element. Builds an open-addressing table (linear probing,
    * no per-entry node allocation) over the smaller side. */
  def inter(a0: ArrayData, b0: ArrayData): Int = {
    val (a, b) =
      if (a0.numElements() <= b0.numElements()) (a0, b0) else (b0, a0)
    val na = a.numElements()
    if (na == 0) return 0
    // capacity: next power of two ≥ 2·na keeps load factor ≤ 0.5
    var cap = 4
    while (cap < na * 2) cap <<= 1
    val table = new Array[UTF8String](cap)
    val mask = cap - 1
    var i = 0
    while (i < na) {
      val s = a.getUTF8String(i)
      var idx = s.hashCode() & mask
      while (table(idx) != null && !table(idx).equals(s))
        idx = (idx + 1) & mask
      table(idx) = s
      i += 1
    }
    var c = 0
    val nb = b.numElements()
    var j = 0
    while (j < nb) {
      val s = b.getUTF8String(j)
      var idx = s.hashCode() & mask
      while (table(idx) != null && !table(idx).equals(s))
        idx = (idx + 1) & mask
      if (table(idx) != null) c += 1
      j += 1
    }
    c
  }
}
