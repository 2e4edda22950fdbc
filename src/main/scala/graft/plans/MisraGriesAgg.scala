package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries summary: at most `capacity` counters. The
  * classic deterministic heavy-hitters sketch (Misra & Gries 1982),
  * chosen over SpaceSaving for its clean MERGEABILITY (Agarwal et al.
  * 2013, "Mergeable summaries"): two summaries merge by pointwise
  * counter addition followed by subtracting the (capacity+1)-largest
  * value — the result obeys the same error bound as a single-pass
  * summary, so map-side partials combine exactly like any algebraic
  * aggregate. Invariant after any update/merge sequence over a
  * stream of N items with counter sum M:
  *   est(i) ≤ true(i) ≤ est(i) + (N − M) / (capacity + 1)
  * (est(i) = 0 for items not retained), and every item with
  * true(i) > (N − M)/(capacity+1) IS retained. */
final class MGSummary(val counts: mutable.HashMap[String, Long]) {

  def update(item: String, capacity: Int): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < capacity => counts.update(item, 1L)
      case None =>
        // decrement-all: amortized O(1) per input over any window —
        // each eviction pays capacity decrements but destroys
        // capacity+1 units of counter mass (incl. the arriving item)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(counts.remove)
    }
  }

  def merge(other: MGSummary, capacity: Int): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all, drop
      // non-positive — the mergeable-summaries reduction
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(counts.remove)
    }
  }
}

/** Native Misra-Gries heavy-hitters aggregate: `mg_topk(expr, cap)`
  * returns the retained counters as map<string,bigint>. Executor
  * state is CONSTANT (≤ cap counters per partial regardless of key
  * cardinality) and partials merge associatively — the 100 TB
  * "what's hot" aggregate that never materializes a per-key count
  * table. Deterministic given a fixed partition layout; the
  * GUARANTEED properties (see [[MGSummary]]) hold under ANY merge
  * order, which is what callers should assert on. */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(capacity > 0, s"mg_topk capacity must be positive: $capacity")

  override def prettyName: String = "mg_topk"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSummary =
    new MGSummary(mutable.HashMap.empty)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString, capacity)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.merge(other, capacity)
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    // deterministic rendering: keys sorted
    val entries = buffer.counts.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    new MGSummary(m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : MisraGriesTopK = copy(child = newChild)
}
