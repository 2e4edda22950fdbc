package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, MapType}

/** Rotation densification for one-permutation MinHash: turns a sparse
  * (slot -> min-hash) map into a dense `perms`-long signature, each
  * empty slot borrowing from the next filled slot to its right
  * (cyclically).
  *
  * Expressed with builtins this is a transform whose lambda coalesces
  * over `perms` rotated map probes — perms² (4096) interpreted
  * lookups per document, which largely cancels OPH's one-hash-per-
  * shingle saving. This kernel is one O(perms) cyclic scan and
  * compiles into whole-stage codegen.
  */
case class DensifySlots(child: Expression, perms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "densify_slots"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case MapType(IntegerType, LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"densify_slots needs map<int,bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(m: Any): Any =
    DensifySlots.densify(m.asInstanceOf[MapData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m =>
      s"${ev.value} = graft.plans.DensifySlots.densify($m, $perms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DensifySlots {
  /** Runtime kernel shared by interpreted and generated paths. */
  def densify(m: MapData, perms: Int): ArrayData = {
    val vals = new Array[Long](perms)
    val has = new Array[Boolean](perms)
    val ks = m.keyArray(); val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      val k = ks.getInt(i)
      if (k >= 0 && k < perms) {
        val v = vs.getLong(i)
        if (!has(k) || v < vals(k)) { vals(k) = v; has(k) = true }
      }
      i += 1
    }
    // cyclic borrow-from-right in one backward scan over 2*perms:
    // `cur` always holds the nearest filled slot at index >= j
    val out = new Array[Long](perms)
    var cur = 0L
    var j = 2 * perms - 1
    while (j >= 0) {
      val idx = j % perms
      if (has(idx)) cur = vals(idx)
      if (j < perms) out(idx) = cur
      j -= 1
    }
    ArrayData.toArrayData(out)
  }
}
