package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(norm)` — the 64-bit SimHash of an ALREADY-NORMALIZED
  * string as ONE scalar projection: for each whitespace token, add
  * ±1 per bit of its xxhash64 into 64 counters; bit b of the result
  * is set iff counter b ends positive.
  *
  * Bit-identical to the explode + 64-column sign-sum aggregate it
  * replaces (kept as `Dedup.simhashComposed`, property-spec'd equal):
  * a token's UTF8 bytes are the contiguous byte range between
  * single-space separators (normalizeText collapses every `\s+` run
  * to one ASCII space and trims, so splitting on 0x20 IS the
  * composed `split(trim(norm), "\\s+")` — no UTF8 continuation or
  * lead byte can equal 0x20), hashed in place with the same seed.
  * NULL propagates; callers coalesce to 0 to keep the composed
  * every-document-keeps-a-row convention.
  *
  * Why: the composed shape exploded one row per token through a
  * 64-aggregate hash exchange — after the fused MinHash kernel, the
  * largest remaining map cost of the dedup family. Here the whole
  * signature is computed in-register inside the scan's codegen span:
  * no explode, no shuffle, no aggregate. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.SimHash64.simhash($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val SEED = 42L // xxhash64's seed in Spark

  /** Shared runtime kernel. Empty / all-space input yields 0 (no
    * tokens — matches `tokens()`'s blank-to-empty-array rule). */
  def simhash(s: UTF8String): Long = {
    val t = s.trim() // tokens() trims before splitting (ASCII space)
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val nBytes = t.numBytes()
    if (nBytes == 0) return 0L
    val sums = new Array[Long](64)
    var start = 0
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || t.getByte(i) == 0x20) {
        if (i > start) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(base, off + start, i - start, SEED)
          var b = 0
          while (b < 64) {
            sums(b) += (((h >>> b) & 1L) * 2L) - 1L
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
