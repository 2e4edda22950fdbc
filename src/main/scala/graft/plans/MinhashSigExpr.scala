package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig_norm(norm, n, perms)` — the FULL MinHash signature of
  * a document as ONE scalar projection over its normalized text:
  * sig[j] = min over the doc's character n-gram shingles of
  * ((a_j·h + b_j) mod P), h = pmod(xxhash64(shingle), P),
  * P = 2³¹−1, a_j = 2j+1, b_j = (j·0x9E3779B9 + 0x85EBCA6B) mod P.
  *
  * Bit-identical to the explode→shuffle→aggregate formulation it
  * replaces (kept as `Dedup.minhashSignaturesComposed`, the semantic
  * reference a property spec compares against), because
  *  - a shingle's UTF8 bytes are a contiguous byte RANGE of the
  *    normalized string (UTF8 is a prefix code), so hashing the range
  *    in place equals `xxhash64(substring)` — zero per-shingle
  *    allocations;
  *  - min is idempotent, so rolling every WINDOW OCCURRENCE equals
  *    aggregating the distinct-shingle set — the set machinery
  *    existed only to shrink the exploded row count, and here there
  *    are no rows to shrink.
  *
  * Why it matters at 100 TB: the signature build is a full-corpus
  * scan and was the hottest stage of the dedup family — explode
  * materialized one row PER SHINGLE (≈ one per character), shuffled
  * them into a hash aggregate, and allocated a UTF8String per
  * shingle. This expression turns all of it into a register-resident
  * loop inside whole-stage codegen: the signature stage needs no
  * exchange at all, and the scan parallelizes perfectly.
  *
  * Contract: one input row per document (the per-doc grouping that
  * the aggregate formulation performed is gone — every dedup caller
  * already feeds unique ids). Strings shorter than n hash as one
  * whole-string shingle; NULL input yields NULL (callers filter,
  * matching the old formulation where explode dropped the row). */
case class MinhashSigFromNorm(child: Expression, n: Int, perms: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle length must be >= 1, got $n")
  require(perms >= 1 && perms <= 256,
    s"minhash_sig_norm perms out of range: $perms")

  // element nullability true only for schema continuity with the
  // aggregate formulation (values are never null: every non-null
  // string yields at least one shingle)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig_norm"
  // null in -> null out: lets IsNotNull(kernel(x)) simplify to
  // IsNotNull(x) instead of re-running the kernel as a predicate
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashSigFromNorm.signature(input.asInstanceOf[UTF8String], n, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.MinhashSigFromNorm.signature($c, $n, $perms);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigFromNorm {
  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val SEED = 42L      // xxhash64's literal-free seed in Spark

  // (a_j, b_j) tables are pure functions of perms — computed once per
  // JVM per distinct perms value, shared across all tasks
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def coeffs(perms: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(perms, { p =>
      (Array.tabulate(p)(j => (j * 2 + 1).toLong),
        Array.tabulate(p)(j => math.floorMod(j * 0x9E3779B9L + 0x85EBCA6BL, P)))
    })

  /** Shared runtime kernel (interpreted and generated paths). */
  def signature(s: UTF8String, n: Int, perms: Int): ArrayData = {
    val (as, bs) = coeffs(perms)
    val buf = new Array[Long](perms)
    java.util.Arrays.fill(buf, Long.MaxValue)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    // rolling code-point window: starts(k mod n+1) = byte offset of
    // char k; window chars [c-n, c) spans bytes [starts(c-n), i)
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
        update(buf, as, bs, perms,
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(base, off + st, i - st, SEED))
        produced = true
      }
    }
    if (!produced)
      // shorter than n (empty included): the whole string is the
      // single shingle — same rule as CharShingles
      update(buf, as, bs, perms,
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off, nBytes, SEED))
    // primitive array straight through (UnsafeArrayData, zero
    // boxing): values are never null — every string yields at least
    // one shingle — so the declared element nullability is purely
    // schema continuity
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)
  }

  private def update(buf: Array[Long], as: Array[Long], bs: Array[Long],
                     perms: Int, rawHash: Long): Unit = {
    // pmod(xxhash64, P): Java % can be negative — normalize into [0, P)
    var h = rawHash % P
    if (h < 0) h += P
    var j = 0
    while (j < perms) {
      // a_j·h + b_j < 2⁴¹ for perms ≤ 256 ⇒ one Mersenne fold
      // (x mod P = (x & P) + (x >>> 31), folded) + one conditional
      // subtract is exact — zero divisions in the hot loop
      var x = as(j) * h + bs(j)
      x = (x & P) + (x >>> 31)
      if (x >= P) x -= P
      if (x < buf(j)) buf(j) = x
      j += 1
    }
  }
}
