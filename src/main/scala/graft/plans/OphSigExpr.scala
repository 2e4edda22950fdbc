package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `oph_sig(norm, n, perms)` — the one-permutation MinHash signature
  * (Li/Owen/Zhang OPH with rotation densification) as ONE scalar
  * projection: each character n-gram hashes ONCE
  * (`pmod(xxhash64, 2⁶³−1)`), lands in bucket `h mod perms`, each
  * bucket keeps its minimum, and empty buckets borrow cyclically from
  * the right — the [[DensifySlots]] rule, inlined.
  *
  * Bit-identical to the explode → (doc, bucket) min-aggregate →
  * map_from_entries → densify_slots formulation (kept as
  * `Dedup.minhashSignaturesOPHComposed`, property-spec'd equal): min
  * per bucket is idempotent, so rolling every window occurrence
  * equals aggregating the distinct-shingle set, and the borrow scan
  * is copied verbatim. NULL text drops (callers filter), strings
  * shorter than n hash whole — the composed rules.
  *
  * This was already the documented 100 TB variant (one hash per
  * shingle); fused, it also sheds the explode, the (doc, bucket)
  * exchange, and the map materialization — like the classic-kernel
  * twin [[MinhashSigFromNorm]], the signature build becomes a pure
  * map inside whole-stage codegen. */
case class OphSigFromNorm(child: Expression, n: Int, perms: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle length must be >= 1, got $n")
  require(perms >= 1 && perms <= 4096, s"oph_sig perms out of range: $perms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "oph_sig"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    OphSigFromNorm.signature(input.asInstanceOf[UTF8String], n, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.OphSigFromNorm.signature($c, $n, $perms);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OphSigFromNorm {
  private val M = Long.MaxValue // 2^63 - 1
  private val SEED = 42L

  /** Shared runtime kernel. */
  def signature(s: UTF8String, n: Int, perms: Int): ArrayData = {
    val vals = new Array[Long](perms)
    val has = new Array[Boolean](perms)
    def update(rawHash: Long): Unit = {
      var h = rawHash % M
      if (h < 0) h += M
      val b = (h % perms).toInt
      if (!has(b) || h < vals(b)) { vals(b) = h; has(b) = true }
    }
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    val starts = new Array[Int](n + 1)
    var i = 0
    var c = 0
    var produced = false
    while (i < nBytes) {
      starts(c % (n + 1)) = i
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
      c += 1
      if (c >= n) {
        val st = starts((c - n) % (n + 1))
        update(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + st, i - st, SEED))
        produced = true
      }
    }
    if (!produced)
      update(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off, nBytes, SEED))
    // cyclic borrow-from-right in one backward scan over 2*perms —
    // DensifySlots.densify's rule verbatim
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
