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

  /** Random-hyperplane LSH signature: array of `bits` 0/1 ints, bit i
    * = sign(v · hp_i). Hash the (whole or sliced) array for bucketing. */
  def lshSignature(v: Column, bits: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(bits - 1)), i =>
      when(aggregate(zip_with(v, hyperplaneAt(i, dim),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, p) => acc + p) > 0, lit(1)).otherwise(lit(0)))
}
