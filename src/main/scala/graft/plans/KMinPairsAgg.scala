package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k lexicographically-smallest (a, b) long
  * pairs — the order statistic under any arrival or merge order
  * (k-min is a semilattice: EXACT, not approximate). Backing store is
  * a sorted array with binary-search insertion; state is ≤ k pairs
  * per partial forever, which is what lets a reservoir ride a
  * streaming aggregation without unbounded state. */
final class KMinBuf(var as: Array[Long], var bs: Array[Long], var n: Int) {

  private def lessAt(i: Int, a: Long, b: Long): Boolean =
    as(i) < a || (as(i) == a && bs(i) < b)

  /** Insert (a, b) if it belongs among the k smallest. */
  def insert(a: Long, b: Long, k: Int): Unit = {
    if (n == k && !lessThanLast(a, b)) return
    // binary search for insertion point
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lessAt(mid, a, b)) lo = mid + 1 else hi = mid
    }
    // SET semantics: an exactly-equal (a, b) pair is skipped (one
    // equality probe at the insertion point — the array is sorted, so
    // any duplicate sits exactly at `lo`). Without this, an
    // at-least-once replay of the same id within a batch would occupy
    // two reservoir slots and evict a genuine k-th element, diverging
    // from the batch-side window reservoir.
    if (lo < n && as(lo) == a && bs(lo) == b) return
    val m = math.min(n + 1, k)
    if (as.length < m) {
      as = java.util.Arrays.copyOf(as, math.max(4, math.min(k, as.length * 2)))
      bs = java.util.Arrays.copyOf(bs, as.length)
    }
    var i = m - 1
    while (i > lo) { as(i) = as(i - 1); bs(i) = bs(i - 1); i -= 1 }
    if (lo < m) { as(lo) = a; bs(lo) = b }
    n = m
  }

  private def lessThanLast(a: Long, b: Long): Boolean =
    n == 0 || a < as(n - 1) || (a == as(n - 1) && b < bs(n - 1))

  def merge(other: KMinBuf, k: Int): Unit = {
    var i = 0
    while (i < other.n) { insert(other.as(i), other.bs(i), k); i += 1 }
  }
}

/** `k_min_pairs(a, b, k)` — the k smallest (a, b) pairs as a sorted
  * array<struct<a,b>>. Drives the deterministic streaming reservoir
  * sample: with a = a hash-derived priority and b = the record id,
  * the k-min set over any prefix IS the Efraimidis–Spirakis reservoir,
  * bit-identical to the batch computation under any partitioning,
  * merge order, or micro-batch split. */
case class KMinPairs(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinBuf] with BinaryLike[Expression] {

  require(k > 0, s"k_min_pairs k must be positive: $k")

  override def prettyName: String = "k_min_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KMinBuf =
    new KMinBuf(new Array[Long](4), new Array[Long](4), 0)

  override def update(buffer: KMinBuf, input: InternalRow): KMinBuf = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null)
      buffer.insert(a.asInstanceOf[Long], b.asInstanceOf[Long], k)
    buffer
  }

  override def merge(buffer: KMinBuf, other: KMinBuf): KMinBuf = {
    buffer.merge(other, k)
    buffer
  }

  override def eval(buffer: KMinBuf): Any = {
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](buffer.as(i), buffer.bs(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: KMinBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.writeLong(buffer.as(i)); out.writeLong(buffer.bs(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KMinBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val as = new Array[Long](math.max(4, n))
    val bs = new Array[Long](math.max(4, n))
    var i = 0
    while (i < n) { as(i) = in.readLong(); bs(i) = in.readLong(); i += 1 }
    new KMinBuf(as, bs, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KMinPairs =
    copy(left = newLeft, right = newRight)
}
