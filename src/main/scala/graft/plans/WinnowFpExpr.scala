package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(norm, k, w)` — a document's complete WINNOWING sketch
  * (Schleimer/Wilkerson/Aiken) as ONE scalar projection: hash every
  * character k-gram, slide a window of `w` consecutive hashes, keep
  * each window's minimum (rightmost on ties), dedup selections.
  * Returns array<struct<fp: long, fp_pos: int>> in ascending
  * position order.
  *
  * Bit-identical to the posexplode + three-window-function
  * formulation it replaces (kept as
  * `TextAnalysis.winnowingFingerprintsComposed`, property-spec'd
  * equal): gram hashes equal `xxhash64(substr(...))` because a
  * k-gram's UTF8 bytes are a contiguous byte range of the normalized
  * string; the rightmost-tie rule is `h <= min` on an ascending scan;
  * selected positions are non-decreasing as the window slides (a
  * selection only changes when a new hash ties-or-beats the old
  * minimum, which then stays preferred), so consecutive-dedup equals
  * the composed version's global distinct. Documents shorter than k
  * chars hash whole; shorter than w grams keep their single partial
  * final window — both matching the composed rules.
  *
  * Why: the composed shape ran ONE ROW PER CHARACTER through a
  * repartition and three window passes per document — the heaviest
  * map-side query of the whole text family. This is a per-row loop
  * inside whole-stage codegen: no explode, no window exchange, no
  * sort, nothing leaves the scan stage. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_fps needs k,w >= 1 (got $k, $w)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("fp_pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.WinnowFingerprints.fingerprints($c, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val SEED = 42L // xxhash64's seed in Spark

  /** Shared runtime kernel (interpreted and generated paths). */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    // gram hashes via the rolling code-point byte window
    val nChars = s.numChars()
    val nGrams = if (nChars < k) 1 else nChars - k + 1
    val hs = new Array[Long](nGrams)
    if (nChars < k) {
      // whole (possibly empty) string is the single gram
      hs(0) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off, nBytes, SEED)
    } else {
      val starts = new Array[Int](k + 1)
      var i = 0
      var c = 0
      while (i < nBytes) {
        starts(c % (k + 1)) = i
        i += UTF8String.numBytesForFirstByte(s.getByte(i))
        c += 1
        if (c >= k) {
          val st = starts((c - k) % (k + 1))
          hs(c - k) = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(base, off + st, i - st, SEED)
        }
      }
    }
    // winnow: rightmost-min per window of w, windows ending at
    // [w-1, nGrams-1]; a doc with fewer than w grams keeps its single
    // final (partial) window. Selected positions are non-decreasing,
    // so consecutive-dedup is global dedup.
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastPos = -1
    var end = math.min(w, nGrams) - 1
    while (end < nGrams) {
      val lo = math.max(0, end - w + 1)
      var minH = hs(lo)
      var minP = lo
      var j = lo + 1
      while (j <= end) {
        if (hs(j) <= minH) { minH = hs(j); minP = j }
        j += 1
      }
      if (minP != lastPos) {
        out += InternalRow(minH, minP)
        lastPos = minP
      }
      end += 1
    }
    new GenericArrayData(out.toArray)
  }
}
