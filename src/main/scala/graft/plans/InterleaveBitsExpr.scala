package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order key: interleaves the bits of two int columns into one long
  * (bit i of `left` lands at position 2i+1, of `right` at 2i), with
  * the sign bit flipped first so the interleaved key orders like the
  * signed inputs.
  *
  * Sorting by this key gives MULTI-dimension locality: rows close in
  * the Z-key are close in BOTH dimensions, so range-clustered files
  * (LakeWriter.clusteredWrite on the Z-key) carry tight min/max
  * statistics on both columns and a predicate on EITHER dimension
  * prunes files — single-column clustering can only serve one.
  *
  * Composing this from shiftleft/bitwiseOr builtins would be 128
  * expression nodes; this compiles to one primitive loop.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == org.apache.spark.sql.types.IntegerType &&
        right.dataType == org.apache.spark.sql.types.IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits needs (int, int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.InterleaveBits.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Runtime kernel shared by interpreted and generated paths. */
  def interleave(a: Int, b: Int): Long = {
    // flip sign bits: signed order becomes unsigned order
    val x = (a ^ Int.MinValue).toLong & 0xFFFFFFFFL
    val y = (b ^ Int.MinValue).toLong & 0xFFFFFFFFL
    var r = 0L
    var i = 0
    while (i < 32) {
      r |= ((x >>> i) & 1L) << (2 * i + 1)
      r |= ((y >>> i) & 1L) << (2 * i)
      i += 1
    }
    // the interleaved key is an UNSIGNED ordinal (bit 63 = left's
    // flipped sign bit); flip the long's own sign bit so it also
    // orders correctly under SIGNED long comparison — without this,
    // rows with negative left values sort after all others
    r ^ Long.MinValue
  }
}
