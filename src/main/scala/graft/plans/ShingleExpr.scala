package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram shingles of a string, as a native
  * codegen'd expression.
  *
  * Why not `transform(sequence(...), ...)` + `array_distinct`? Spark
  * evaluates higher-order functions interpretively (no codegen), and
  * the shingle loop sits on the hot path of every MinHash/Jaccard
  * corpus scan — at 100 TB the interpreted lambda overhead dominates
  * the whole job. This expression emits a tight Java loop instead.
  *
  * Semantics (kept identical to the previous composed version):
  * strings shorter than n yield the whole string as the only shingle;
  * shingles preserve first-seen order; n is a literal parameter.
  */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.distinctShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.CharShingles.distinctShingles($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {
  /** Shared runtime kernel (called from both interpreted and generated
    * paths): distinct code-point n-grams, first-seen order. */
  def distinctShingles(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array[Any](s))
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(len, 1 << 12))
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}
