package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns. The dot product —
  * the only O(dim) kernel — is a native codegen'd expression
  * (graft.plans.VecDot); everything else composes on top of it.
  */
object VecFns {

  /** Elementwise dot product (double accumulate) — native expression. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(graft.plans.VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Composed-builtins dot — semantic reference for VecDot (tested). */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero.
    * NOTE for hot paths: this recomputes both norms per call — inside
    * a pair join, precompute norms per SIDE first and use
    * `cosineFromParts`. */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), norm(a), norm(b))

  /** Cosine from a precomputed dot and per-side norms. */
  def cosineFromParts(dotAB: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom === 0.0, 0.0).otherwise(dotAB / denom)
  }

  /** Deterministic pseudo-random hyperplane `i` (Column) of dimension
    * `dim`: components ±1 derived from xxhash64("hp", i, j). */
  def hyperplaneAt(i: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      when(pmod(xxhash64(lit("hp"), i, j), lit(2)) === 0, lit(1.0))
        .otherwise(lit(-1.0)))

  /** Hyperplane component (i, j) evaluated DRIVER-SIDE through the
    * exact kernel `xxhash64(lit("hp"), i, j)` runs (seed 42, children
    * folded left) — so the literal hyperplanes are bit-identical to
    * the composed variant's (the parity spec asserts it). */
  private def hpSign(i: Int, j: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val h0 = XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hp"),
      StringType, 42L)
    val h1 = XxHash64Function.hash(i, IntegerType, h0)
    val h2 = XxHash64Function.hash(j, IntegerType, h1)
    if (math.floorMod(h2, 2L) == 0L) 1.0 else -1.0
  }

  private val hpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Seq[Double]]()
  private def hyperplaneConst(i: Int, dim: Int): Seq[Double] =
    hpCache.computeIfAbsent((i, dim),
      _ => (0 until dim).map(j => hpSign(i, j)))

  /** Random-hyperplane LSH signature: array of `bits` 0/1 ints, bit i
    * = sign(v · hp_i). Hash the (whole or sliced) array for bucketing.
    *
    * The hyperplanes are deterministic CONSTANTS, so they are generated
    * once on the driver and shipped as literal arrays: the signature is
    * `bits` native VecDot calls per row — fully codegen'd, zero hash
    * recomputation. The composed-builtins twin below recomputes
    * bits×dim xxhash64 calls per row through interpreted higher-order
    * functions, which on a full-corpus scan (the LSH use case at
    * 100 TB) is the whole runtime; it is kept as the semantic
    * reference the parity test checks against. */
  def lshSignature(v: Column, bits: Int, dim: Int): Column =
    array((0 until bits).map { i =>
      when(dot(v, typedlit(hyperplaneConst(i, dim))) > 0, lit(1))
        .otherwise(lit(0))
    }: _*)

  /** Composed-builtins LSH signature — semantic reference for
    * `lshSignature` (tested bit-identical). Interpreted; do not use on
    * hot paths. */
  def lshSignatureComposed(v: Column, bits: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(bits - 1)), i =>
      when(aggregate(zip_with(v, hyperplaneAt(i, dim),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, p) => acc + p) > 0, lit(1)).otherwise(lit(0)))

  /** Scalar-quantization round trip (8-bit code per dimension against
    * per-dimension `[lo, hi]` bounds, immediately reconstructed) —
    * native expression; see [[graft.plans.SqReconstruct]]. */
  def sqReconstruct(v: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    GraftColumnBridge.column(graft.plans.SqReconstruct(
      GraftColumnBridge.expression(v), lo, hi))

  /** SQ8 encode to offset-binary byte codes (storage form) — native
    * expression; see [[graft.plans.SqEncode]]. */
  def sqEncode(v: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    GraftColumnBridge.column(graft.plans.SqEncode(
      GraftColumnBridge.expression(v), lo, hi))

  /** SQ8 decode from offset-binary byte codes back to the
    * reconstructed vector — native; see [[graft.plans.SqDecode]]. */
  def sqDecode(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    GraftColumnBridge.column(graft.plans.SqDecode(
      GraftColumnBridge.expression(codes), lo, hi))

  /** Composed-builtins twin of [[sqReconstruct]] — semantic reference
    * (tested bit-identical). Interpreted; do not use on hot paths. */
  def sqReconstructComposed(v: Column, lo: Seq[Double],
                            hi: Seq[Double]): Column =
    transform(sequence(lit(0), lit(lo.length - 1)), i => {
      val x = element_at(v, i + 1).cast("double")
      val l = element_at(typedlit(lo), i + 1)
      val h = element_at(typedlit(hi), i + 1)
      when(h === l, l).otherwise(
        l + greatest(lit(0.0), least(lit(255.0),
          floor((x - l) * lit(255.0) / (h - l) + lit(0.5)))) * (h - l)
          / lit(255.0))
    })
}
