package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `minhash_sig(h, perms)` — the full MinHash signature
  * (array of min_j((a_j·h + b_j) mod P) over the group's shingle
  * hashes, P = 2³¹−1, a_j = 2j+1, b_j = (j·0x9E3779B9 + 0x85EBCA6B)
  * mod P) as ONE aggregate.
  *
  * Bit-identical to the 64-column `min(pmod(a*h+b, P))` formulation
  * it replaces, at a fraction of the CPU: the expression version
  * evaluates `perms` independent codegen'd pmods per shingle row —
  * 2·perms 64-bit divisions, the single hottest loop in the whole
  * dedup family — while this update is one tight JIT'd loop with a
  * MERSENNE reduction (P = 2³¹−1 ⇒ x mod P = fold(x & P + x >>> 31)),
  * zero divisions. The aggregate stays map-side combining
  * (ObjectHashAggregate partials merge elementwise-min), so the
  * shuffle still moves ≤ perms longs per document — the property
  * that makes the signature build a linear scan at 100 TB.
  *
  * Input must already be reduced mod P (the shingle-hash column is
  * `pmod(xxhash64(shingle), P)`); a_j·h + b_j < 2⁴⁰ for perms ≤ 256,
  * so one fold + one conditional subtract is exact. */
case class MinhashSig(
    child: Expression,
    perms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(perms >= 1 && perms <= 256, s"minhash_sig perms out of range: $perms")

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val as: Array[Long] = Array.tabulate(perms)(j => (j * 2 + 1).toLong)
  private val bs: Array[Long] =
    Array.tabulate(perms)(j => math.floorMod(j * 0x9E3779B9L + 0x85EBCA6BL, P))

  override def prettyName: String = "minhash_sig"
  // element nullability matches the min()-column formulation (an
  // all-null group yields null slots — sentinel P marks "no update",
  // unambiguous because every real value is < P)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(perms)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < perms) {
        var x = as(j) * h + bs(j)
        x = (x & P) + (x >>> 31)
        if (x >= P) x -= P
        if (x < buf(j)) buf(j) = x
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < perms) {
      if (other(j) < buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](perms)
    var j = 0
    while (j < perms) {
      out(j) = if (buf(j) == P) null else java.lang.Long.valueOf(buf(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](perms * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var j = 0
    while (j < perms) { bb.putLong(buf(j)); j += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](perms)
    var j = 0
    while (j < perms) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
