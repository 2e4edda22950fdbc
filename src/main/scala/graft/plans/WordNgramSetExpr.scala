package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngram_set(norm, n)` — the distinct word n-grams of an
  * ALREADY-NORMALIZED string (single-space separated, trimmed) as one
  * native loop, first-seen order.
  *
  * Equals `array_distinct(transform(sequence(...), i ->
  * concat_ws(" ", slice(toks, i, n))))` over
  * `split(norm, "\\s+")` (kept as the composed reference in
  * TextFns; property-spec'd): an n-gram's text IS a contiguous byte
  * range of the normalized string — from the first byte of token i
  * to the last byte of token i+n−1, separators included — because
  * normalizeText collapses all whitespace to single ASCII spaces, so
  * `substring` replaces `concat_ws` byte-for-byte. Fewer than n
  * tokens (empty string included) yield the whole trimmed string as
  * the single n-gram, matching the composed rule.
  *
  * Why: the composed chain is INTERPRETED (higher-order transform +
  * per-gram concat_ws allocations + array_distinct's quadratic-ish
  * probe) and sits under every exact n-gram Jaccard / containment
  * verify — a full-corpus scan in the dedup family. */
case class WordNgramSet(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"word n-gram length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngram_set"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordNgramSet.distinctNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.WordNgramSet.distinctNgrams($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramSet {
  /** Shared runtime kernel: token boundaries are single 0x20 bytes
    * (no UTF8 lead/continuation byte equals 0x20). The input is
    * copied ONCE into an owned array (the scanner reuses its row
    * buffer, so returned strings must never alias it); every n-gram
    * is then a zero-copy view into that owned copy. */
  def distinctNgrams(s0: UTF8String, n: Int): ArrayData = {
    val t = s0.trim()
    val nBytes = t.numBytes()
    val owned = new Array[Byte](nBytes)
    org.apache.spark.unsafe.Platform.copyMemory(
      t.getBaseObject, t.getBaseOffset, owned,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, nBytes.toLong)
    val s = UTF8String.fromBytes(owned)
    // token start offsets (byte) — token k spans
    // [starts(k), ends(k))
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    var inTok = false
    while (i < nBytes) {
      val sp = s.getByte(i) == 0x20
      if (!sp && !inTok) { starts += i; inTok = true }
      if (sp && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += nBytes
    val nToks = starts.length
    if (nToks < n)
      // whole (trimmed, possibly empty) string is the single n-gram
      return new GenericArrayData(Array[Any](s))
    val seen = new java.util.LinkedHashSet[UTF8String](
      math.min(nToks, 1 << 12))
    var k = 0
    while (k + n <= nToks) {
      val from = starts(k); val until = ends(k + n - 1)
      seen.add(UTF8String.fromBytes(owned, from, until - from))
      k += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}
