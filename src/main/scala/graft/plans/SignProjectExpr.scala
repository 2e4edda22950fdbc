package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Johnson–Lindenstrauss sign random projection of a float embedding
  * into `kOut` integer components — the dimensionality-reduction step
  * an ANN pipeline runs before LSH/IVF when the raw dimension makes
  * signatures expensive (Achlioptas 2001: ±1 entries preserve
  * pairwise distances in expectation as well as Gaussian ones).
  *
  * Engine-portable by construction: inputs quantize to micro-units
  * (floor(x·1e6 + 0.5) in double) and the projection matrix entries
  * are ±1 derived from md5("i_j") first-hex-digit parity — so each
  * output component is an exact ±micro integer sum any engine
  * re-derives bit-for-bit, and the scale factor (1/√kOut) that pure
  * analysis needs is a constant the consumer can apply (or ignore:
  * LSH banding and top-k ranks are scale-invariant).
  *
  * Why native: with builtins this is kOut aggregate(zip_with(...))
  * lambdas per row — interpreted, allocating, dim×kOut interpreted ops
  * on the hot corpus scan. This kernel is one fused dim×kOut MAC loop
  * in whole-stage codegen with a process-wide cached sign matrix.
  */
case class SignProject(child: Expression, kOut: Int)
    extends UnaryExpression {

  require(kOut >= 1 && kOut <= 1024, s"bad output dim $kOut")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_project"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_project needs array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SignProject.project(input.asInstanceOf[ArrayData], kOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SignProject.project($a, $kOut);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignProject {
  // (dIn, kOut) -> row-major sign matrix; tiny (dims × kOut bytes),
  // computed once per process per shape
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  /** ±1 from the parity of the first hex digit of md5("i_j") — the
    * seedless deterministic matrix both the engine and the oracle
    * derive independently. */
  def sign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"${i}_${j}".getBytes("UTF-8"))
    // first hex char = high nibble of byte 0
    if (((d(0) >> 4) & 1) == 0) 1 else -1
  }

  def matrix(dIn: Int, kOut: Int): Array[Byte] =
    cache.computeIfAbsent((dIn, kOut), { _ =>
      val m = new Array[Byte](dIn * kOut)
      var i = 0
      while (i < dIn) {
        var j = 0
        while (j < kOut) {
          m(i * kOut + j) = sign(i, j).toByte
          j += 1
        }
        i += 1
      }
      m
    })

  /** Runtime kernel shared by interpreted and generated paths. */
  def project(arr: ArrayData, kOut: Int): ArrayData = {
    val dIn = arr.numElements()
    val m = matrix(dIn, kOut)
    val out = new Array[Long](kOut)
    var i = 0
    while (i < dIn) {
      val micro = math.floor(arr.getFloat(i).toDouble * 1000000.0 + 0.5).toLong
      val base = i * kOut
      var j = 0
      while (j < kOut) {
        out(j) += m(base + j) * micro
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
