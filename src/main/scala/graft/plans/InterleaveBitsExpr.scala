package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order key: interleaves the bits of 2-4 int columns into one long
  * (round-robin, child 0 most significant), with each input's sign
  * bit flipped first so the interleaved key orders like the signed
  * inputs.
  *
  * With n dimensions each contributes its top `64/n` bits (32, 21 or
  * 16) — truncation of low bits is monotone, so the key stays jointly
  * order-preserving; callers that control the domain (zorderWrite)
  * scale values across the full int range first so no resolution is
  * wasted.
  *
  * Sorting by this key gives MULTI-dimension locality: rows close in
  * the Z-key are close in EVERY dimension, so range-clustered files
  * (LakeWriter.clusteredWrite on the Z-key) carry tight min/max
  * statistics on all columns and a predicate on ANY dimension prunes
  * files — single-column clustering can only serve one.
  *
  * Composing this from shiftleft/bitwiseOr builtins would be 64+
  * expression nodes per dimension; this compiles to one primitive
  * loop inside whole-stage codegen.
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2 || children.size > 4)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits takes 2-4 columns, got ${children.size}")
    else if (children.exists(_.dataType != IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits needs int inputs, got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Int](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Int]
      i += 1
    }
    InterleaveBits.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code).reduce(_ + _)
    val nullCond = evals.map(e => s"${e.isNull}").mkString(" || ")
    val args = evals.map(e => s"${e.value}").mkString(", ")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $nullCond;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.InterleaveBits.interleave($args);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object InterleaveBits {
  /** Runtime kernel shared by interpreted and generated paths: each
    * dimension's top `64/n` bits, sign-flipped to unsigned order,
    * interleaved round-robin (dimension 0 outranking at equal bit
    * position), then the long's own sign bit flipped so the key also
    * orders correctly under SIGNED long comparison. */
  def interleave(vals: Array[Int]): Long = {
    val n = vals.length
    val bits = 64 / n
    var r = 0L
    var d = 0
    while (d < n) {
      // flip sign bit: signed int order becomes unsigned order, then
      // keep the top `bits` bits (low-bit truncation is monotone)
      val x = ((vals(d) ^ Int.MinValue).toLong & 0xFFFFFFFFL) >>> (32 - bits)
      var i = 0
      while (i < bits) {
        r |= ((x >>> i) & 1L) << (i * n + (n - 1 - d))
        i += 1
      }
      d += 1
    }
    r ^ Long.MinValue
  }

  // fixed-arity entry points for generated code (the non-escaping
  // temp array is scalar-replaced by the JIT)
  def interleave(a: Int, b: Int): Long = interleave(Array(a, b))
  def interleave(a: Int, b: Int, c: Int): Long = interleave(Array(a, b, c))
  def interleave(a: Int, b: Int, c: Int, d: Int): Long =
    interleave(Array(a, b, c, d))
}
