package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, EqualTo, Expression, ExpressionInfo, If, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

/** The library's `SparkSessionExtensions` entry point — the standard
  * Spark mechanism for shipping engine extensions (the role the
  * reference delegates to its engine config; here it is how a cluster
  * turns a plain Spark session into a graft-accelerated one):
  *
  *   - registers the native codegen expressions as SQL functions
  *     (`char_shingles`, `vec_dot`, `array_match_count`,
  *     `interleave_bits`, `densify_slots`), so pure-SQL users (the
  *     Trino/Superset serving role, `sources.Views`) get the same
  *     kernels the Scala API uses;
  *   - injects [[RewriteHofDotProduct]], an optimizer rule that
  *     rewrites the interpreted higher-order-function dot product —
  *     `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) ->
  *     acc + v)`, the idiom every hand-written Spark cosine kernel
  *     uses — into the codegen'd [[VecDot]] primitive loop. On a
  *     full-corpus ANN scan the interpreted HOF chain is the entire
  *     runtime (measured ~10-30× on the graft kernels), so naive user
  *     SQL gets the native plan without rewriting their code.
  *
  * Activate at session build (`spark.sql.extensions=
  * graft.plans.GraftExtensions` or `builder.withExtensions(new
  * GraftExtensions)`), or on a live session via
  * [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => PackSequencesStrategy)
  }
}

object GraftExtensions {

  private def intArg(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an INT literal argument, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn takes $n arguments, got ${args.length}")

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name)

  /** SQL registrations for the native expressions. Literal-int
    * parameters (shingle length, permutation count) must be literals —
    * they are baked into generated code. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("char_shingles"),
      info(classOf[CharShingles], "char_shingles"),
      (args: Seq[Expression]) => {
        arity("char_shingles", args, 2)
        CharShingles(args(0), intArg("char_shingles", args(1)))
      }),
    (FunctionIdentifier("vec_dot"),
      info(classOf[VecDot], "vec_dot"),
      (args: Seq[Expression]) => {
        arity("vec_dot", args, 2); VecDot(args(0), args(1))
      }),
    (FunctionIdentifier("array_match_count"),
      info(classOf[ArrayMatchCount], "array_match_count"),
      (args: Seq[Expression]) => {
        arity("array_match_count", args, 2)
        ArrayMatchCount(args(0), args(1))
      }),
    (FunctionIdentifier("set_intersect_size"),
      info(classOf[SetIntersectSize], "set_intersect_size"),
      (args: Seq[Expression]) => {
        arity("set_intersect_size", args, 2)
        SetIntersectSize(args(0), args(1))
      }),
    (FunctionIdentifier("interleave_bits"),
      info(classOf[InterleaveBits], "interleave_bits"),
      (args: Seq[Expression]) => InterleaveBits(args)),
    (FunctionIdentifier("densify_slots"),
      info(classOf[DensifySlots], "densify_slots"),
      (args: Seq[Expression]) => {
        arity("densify_slots", args, 2)
        DensifySlots(args(0), intArg("densify_slots", args(1)))
      }),
    (FunctionIdentifier("mg_topk"),
      info(classOf[MisraGriesTopK], "mg_topk"),
      (args: Seq[Expression]) => {
        arity("mg_topk", args, 2)
        MisraGriesTopK(args(0), intArg("mg_topk", args(1)))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("sorted_long_intersect"),
      info(classOf[SortedLongIntersect], "sorted_long_intersect"),
      (args: Seq[Expression]) => {
        arity("sorted_long_intersect", args, 2)
        SortedLongIntersect(args(0), args(1))
      }),
    (FunctionIdentifier("k_min_pairs"),
      info(classOf[KMinPairs], "k_min_pairs"),
      (args: Seq[Expression]) => {
        arity("k_min_pairs", args, 3)
        KMinPairs(args(0), args(1), intArg("k_min_pairs", args(2)))
          .toAggregateExpression()
      }),
    // the fused per-document signature kernels (r11) — SQL users get
    // the same zero-shuffle builds the Scala dedup family runs on
    (FunctionIdentifier("minhash_sig_norm"),
      info(classOf[MinhashSigFromNorm], "minhash_sig_norm"),
      (args: Seq[Expression]) => {
        arity("minhash_sig_norm", args, 3)
        MinhashSigFromNorm(args(0), intArg("minhash_sig_norm", args(1)),
          intArg("minhash_sig_norm", args(2)))
      }),
    (FunctionIdentifier("oph_sig"),
      info(classOf[OphSigFromNorm], "oph_sig"),
      (args: Seq[Expression]) => {
        arity("oph_sig", args, 3)
        OphSigFromNorm(args(0), intArg("oph_sig", args(1)),
          intArg("oph_sig", args(2)))
      }),
    (FunctionIdentifier("simhash64"),
      info(classOf[SimHash64], "simhash64"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1); SimHash64(args(0))
      }),
    (FunctionIdentifier("winnow_fps"),
      info(classOf[WinnowFingerprints], "winnow_fps"),
      (args: Seq[Expression]) => {
        arity("winnow_fps", args, 3)
        WinnowFingerprints(args(0), intArg("winnow_fps", args(1)),
          intArg("winnow_fps", args(2)))
      }),
    (FunctionIdentifier("word_ngram_set"),
      info(classOf[WordNgramSet], "word_ngram_set"),
      (args: Seq[Expression]) => {
        arity("word_ngram_set", args, 2)
        WordNgramSet(args(0), intArg("word_ngram_set", args(1)))
      }))

  /** Apply the same registrations to an ALREADY-RUNNING session
    * (extensions otherwise only apply at session construction).
    * Idempotent. */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    if (!spark.experimental.extraStrategies.contains(PackSequencesStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PackSequencesStrategy
  }
}

/** Rewrites the composed higher-order-function dot product into the
  * native [[VecDot]] kernel:
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * becomes `IF(size(a) = size(b), vec_dot(a, b), NULL)`.
  *
  * The rewrite fires only when it is provably semantics-preserving:
  *  - both inputs are `array<float|double>` with non-null elements
  *    (a null element would null the HOF sum, which VecDot's primitive
  *    loop cannot see);
  *  - the multiply happens in DOUBLE (elements already double, or the
  *    lambda casts them — float×float multiplication rounds each
  *    product to float first, which VecDot's double accumulate would
  *    not reproduce bit-for-bit);
  *  - the zero is literal +0.0 and the merge is a plain `acc + v`;
  *  - a widening `CAST(arr AS array<double>)` around an input is
  *    peeled off (VecDot widens each element itself — same result,
  *    no materialized cast array);
  *  - `zip_with` null-pads when lengths differ, nulling the sum —
  *    the `IF(size=size, …, NULL)` guard reproduces exactly that.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case c: Cast => sameVar(c.child, v)
      case _ => false
    }

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, false) => true
    case _ => false
  }

  /** Peel a float→double (or double→double) array widening cast. */
  private def peel(e: Expression): Expression = e match {
    case c: Cast =>
      c.dataType match {
        case ArrayType(DoubleType | FloatType, _) if isVec(c.child) => c.child
        case _ => e
      }
    case _ => e
  }

  private def isProduct(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(m @ Multiply(x, y, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      m.dataType == DoubleType &&
        ((sameVar(x, a) && sameVar(y, b)) || (sameVar(x, b) && sameVar(y, a)))
    case _ => false
  }

  private def isSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(s @ Add(l, r, _),
        Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _) =>
      s.dataType == DoubleType &&
        ((sameVar(l, acc) && sameVar(r, el)) ||
          (sameVar(l, el) && sameVar(r, acc)))
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, prod: LambdaFunction), zero,
            merge: LambdaFunction, finish: LambdaFunction)
          if isPlusZero(zero) && isProduct(prod) && isSum(merge) &&
            isIdentity(finish) && isVec(peel(a)) && isVec(peel(b)) =>
        val (va, vb) = (peel(a), peel(b))
        If(EqualTo(Size(va, legacySizeOfNull = false),
            Size(vb, legacySizeOfNull = false)),
          VecDot(va, vb), Literal.create(null, DoubleType))
    }
}
