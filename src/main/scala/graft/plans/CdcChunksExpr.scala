package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a string — the rsync/FastCDC boundary
  * rule that byte-level dedup and delta storage are built on: a chunk
  * boundary falls wherever a rolling hash of the trailing `W`-char
  * window is ≡ 0 (mod `divisor`), so an insertion early in a document
  * only reshapes the chunks it touches while every later boundary
  * (and therefore every later chunk hash) survives — unlike
  * fixed-width chunking, where one inserted byte shifts every
  * subsequent chunk.
  *
  * The hash is position-local (window W = 4, a degree-3 polynomial in
  * per-char mixed values), so an ANSI oracle re-derives every
  * boundary with plain window functions — no recursion. `minLen` /
  * `maxLen` bound chunk sizes for storage (a boundary inside the
  * first `minLen-1` chars of a chunk is suppressed; a chunk is force-
  * cut at `maxLen`); the constrained path is sequential-greedy and is
  * pinned by ScalaTest against an independent reimplementation, while
  * the driver oracle runs the unconstrained form (minLen=1,
  * maxLen=MaxValue) exactly.
  *
  * Why a native expression: the per-char rolling loop over whole
  * documents sits on a full-corpus scan; as builtins it would be a
  * char-explode (100 TB of text → 100 T rows) or an interpreted
  * higher-order lambda. This kernel is one tight O(n) Java loop per
  * row inside whole-stage codegen — no explode, no shuffle.
  *
  * Returns array<struct<start int (1-based code-point index),
  * chunk string>> in document order; blank input → empty array.
  */
case class CdcChunks(child: Expression, divisor: Int, minLen: Int,
                     maxLen: Int) extends UnaryExpression {

  require(divisor >= 2, s"divisor must be >= 2, got $divisor")
  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(maxLen >= minLen, s"maxLen ($maxLen) must be >= minLen ($minLen)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start", IntegerType, nullable = false),
      StructField("chunk", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String], divisor, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CdcChunks.chunks($c, $divisor, $minLen, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  /** Rolling window width (chars). Position-local by design: the hash
    * at i depends on chars [i-W+1, i] only. */
  final val W = 4
  /** Per-char mix: Knuth multiplicative hash truncated to 24 bits —
    * keeps the polynomial sum < 2^51 with no modular reduction, so
    * the same arithmetic is exact in any engine's int64. */
  final val Mix = 2654435761L
  final val MixMask = 0xFFFFFFL
  /** Polynomial base; 263 is prime and shares no factor with common
    * power-of-two divisors (263 mod 64 = 7), so all four window
    * positions influence h mod divisor. */
  final val B = 263L

  private def g(cp: Int): Long = (cp.toLong * Mix) & MixMask

  /** Shared runtime kernel (interpreted + generated paths). */
  def chunks(s: UTF8String, divisor: Int, minLen: Int, maxLen: Int): ArrayData = {
    val cps = s.toString.codePoints.toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(4, n / 32))
    val b2 = B * B; val b3 = b2 * B
    var start = 0 // 0-based start of current chunk
    var i = 0
    while (i < n) {
      val chunkLen = i - start + 1
      val cut =
        if (chunkLen >= maxLen) true
        else if (chunkLen < minLen || i < W - 1) false
        else {
          val h = g(cps(i)) + B * g(cps(i - 1)) + b2 * g(cps(i - 2)) +
            b3 * g(cps(i - 3))
          h % divisor == 0
        }
      if (cut || i == n - 1) {
        val str = new String(cps, start, i - start + 1)
        out += InternalRow(start + 1, UTF8String.fromString(str))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
