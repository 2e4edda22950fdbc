package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFns
import graft.plans.{GraftExtensions, InterleaveBits, RewriteHofDotProduct}

/** The SparkSessionExtensions entry point: SQL registration of the
  * native expressions plus the HOF-dot-product optimizer rewrite.
  *
  * Runs against a SEPARATE session built with the extensions — the
  * shared TestSpark session stays vanilla on purpose, so the
  * native-vs-composed parity specs elsewhere keep comparing two
  * genuinely different evaluation paths (with the rewrite active the
  * composed variants would silently become the native ones).
  */
class ExtensionsSpec extends AnyFunSuite {

  // force the shared vanilla session first so IT owns default/active
  private val vanilla = TestSpark.spark

  /** A second session on the same SparkContext, with extensions. */
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // restore the vanilla session as the JVM-wide default for every
    // other suite; this spec addresses `s` explicitly
    SparkSession.setDefaultSession(vanilla)
    SparkSession.setActiveSession(vanilla)
    s
  }

  test("native expressions are callable from SQL") {
    assert(spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) v")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT char_shingles('abab', 2) s")
      .head().getSeq[String](0) === Seq("ab", "ba"))
    assert(spark.sql(
        "SELECT array_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) c")
      .head().getInt(0) === 2)
    assert(spark.sql("SELECT interleave_bits(7, 11) z").head().getLong(0)
      === InterleaveBits.interleave(7, 11))
    // set_intersect_size == size(array_intersect) on distinct sets,
    // including empty and disjoint inputs
    assert(spark.sql(
        "SELECT set_intersect_size(array('a','b','c'), array('b','c','d')) i")
      .head().getInt(0) === 2)
    assert(spark.sql(
        "SELECT set_intersect_size(array('a'), array('z')) i")
      .head().getInt(0) === 0)
    assert(spark.sql(
        "SELECT set_intersect_size(cast(array() as array<string>), array('z')) i")
      .head().getInt(0) === 0)
    assert(spark.sql("SELECT densify_slots(map(1, 5L), 3) d")
      .head().getSeq[Long](0) === Seq(5L, 5L, 5L))
    // the native Misra-Gries AGGREGATE from pure SQL: exact when
    // capacity exceeds cardinality
    val mg = spark.sql(
      "SELECT mg_topk(x, 8) m FROM VALUES ('a'),('a'),('b') AS t(x)")
      .head().getMap[String, Long](0)
    assert(mg == Map("a" -> 2L, "b" -> 1L))
    // sorted-merge long intersection (inputs sorted ascending)
    assert(spark.sql(
        "SELECT sorted_long_intersect(array(1L,3L,5L), array(2L,3L,5L,9L)) i")
      .head().getSeq[Long](0) === Seq(3L, 5L))
    // the bounded k-min aggregate from pure SQL
    val km = spark.sql(
      "SELECT k_min_pairs(a, b, 2) r FROM VALUES (3L,30L),(1L,10L)," +
        "(2L,20L),(1L,5L) AS t(a, b)")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(km === Seq((1L, 5L), (1L, 10L)))
    // the fused signature kernels from pure SQL, held to their
    // fused-API Scala results on the same input (bit-parity with the
    // composed formulations is pinned in PipelineOpsSpec)
    val txt = "the quick brown fox jumps the quick fence"
    val sq = spark
    import sq.implicits._
    val one = Seq((1L, txt)).toDF("doc_id", "text")
    val expectedSig = graft.operators.Dedup
      .minhashSignatures(one, "text", "doc_id").head().getSeq[Long](1)
    assert(spark.sql(
        s"SELECT minhash_sig_norm(lower(trim(regexp_replace('$txt', '\\\\s+', ' '))), 5, 64) s")
      .head().getSeq[Long](0) === expectedSig)
    val expectedSim = graft.operators.Dedup
      .simhash(one, "text", "doc_id").head().getLong(1)
    assert(spark.sql(
        s"SELECT simhash64(lower(trim(regexp_replace('$txt', '\\\\s+', ' ')))) s")
      .head().getLong(0) === expectedSim)
    assert(spark.sql(s"SELECT oph_sig('$txt', 5, 16) s")
      .head().getSeq[Long](0).length === 16)
    val wf = spark.sql(s"SELECT winnow_fps('$txt', 5, 4) w")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(wf.nonEmpty && wf.map(_.getInt(1)).sorted == wf.map(_.getInt(1)))
    assert(spark.sql("SELECT word_ngram_set('a b a b', 2) g")
      .head().getSeq[String](0) === Seq("a b", "b a"))
  }

  test("non-literal int parameter is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT char_shingles('ab', 1 + 1)").collect()
    }
    assert(e.getMessage.contains("INT literal"))
  }

  test("HOF dot product is rewritten to the native vec_dot") {
    import spark.implicits._
    // repartition keeps ConvertToLocalRelation from eagerly folding
    // the projection away before the plan can be inspected
    val df = Seq(
        (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (Seq(0.5, -1.0, 2.0), Seq(2.0, 2.0, 2.0)))
      .toDF("a", "b").repartition(2)
    val q = df.select(VecFns.dotComposed(col("a"), col("b")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      s"expected vec_dot in:\n${q.queryExecution.optimizedPlan}")
    // rewritten results == native == interpreted-on-vanilla
    val got = q.collect().map(_.getDouble(0)).toSeq.sorted
    assert(got === Seq(3.0, 32.0))
    import vanilla.implicits.{localSeqToDatasetHolder => vanillaSeqToDs}
    val ref = vanillaSeqToDs(Seq(
        (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (Seq(0.5, -1.0, 2.0), Seq(2.0, 2.0, 2.0))))
      .toDF("a", "b").repartition(2)
      .select(VecFns.dotComposed(col("a"), col("b")).as("d"))
    assert(!ref.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      "vanilla session must NOT rewrite — parity specs depend on it")
    assert(ref.collect().map(_.getDouble(0)).toSeq.sorted === got)
  }

  test("rewrite fires on float arrays with double-cast lambda, " +
      "preserving length and null semantics") {
    import spark.implicits._
    val df = Seq(
        (1, Seq(1.5f, 2.0f), Seq(2.0f, 3.0f)),   // equal length
        (2, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f)))   // unequal -> null (zip_with pads)
      .toDF("id", "a", "b").repartition(2)
    val q = df.select(col("id"),
      VecFns.dotComposed(col("a"), col("b")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    val rows = q.collect().sortBy(_.getInt(0))
    assert(rows(0).getDouble(1) === 9.0)
    assert(rows(1).isNullAt(1))
  }

  test("rewrite does NOT fire when the multiply stays in float") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .repartition(2)
    // float*float rounds each product to float — not VecDot semantics
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0f), (acc, v) => acc + v).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("vec_dot"))
  }

  test("PackSequencesNode plans through the injected strategy; " +
      "requirements insert the exchange") {
    import spark.implicits._
    val docs = (1L to 97L).map(i => i -> ((i * 13 % 90) + 1).toInt)
      .toDF("doc_id", "n_tokens")
    val viaPlan = graft.operators.Packing.packSequencesPlan(
      docs, "doc_id", "n_tokens", budget = 128, shards = 5)
    val viaDf = graft.operators.Packing.packSequences(
      docs, "doc_id", "n_tokens", budget = 128, shards = 5)
    val got = viaPlan.collect().map(_.toSeq).toSet
    assert(got === viaDf.collect().map(_.toSeq).toSet)
    val plan = viaPlan.queryExecution.executedPlan.toString
    assert(plan.contains("PackSequences"), s"no PackSequences in:\n$plan")
    // the shuffle was inserted by the planner FOR the declared
    // distribution, not hand-placed by the operator
    assert(plan.contains("ENSURE_REQUIREMENTS"),
      "EnsureRequirements should shuffle by shard")
  }

  test("a child already clustered by shard packs with NO new shuffle") {
    import spark.implicits._
    val shardExpr = pmod(col("doc_id").cast("long"), lit(5L)).cast("int")
    val docs = (1L to 97L).map(i => i -> ((i * 13 % 90) + 1).toInt)
      .toDF("doc_id", "n_tokens")
      .repartition(4, shardExpr) // the caller's own clustering
    val q = graft.operators.Packing.packSequencesPlan(
      docs, "doc_id", "n_tokens", budget = 128, shards = 5)
    val rows = q.collect()
    // only the caller's repartition shuffles — EnsureRequirements
    // recognized the aliased shard clustering and added no exchange of
    // its own (the hand-placed repartition in packSequences can never
    // be elided like this)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("ENSURE_REQUIREMENTS"),
      s"expected only the caller's exchange:\n$plan")
    assert(plan.contains("REPARTITION_BY_NUM"), s"caller's exchange in:\n$plan")
    assert(rows.length == 97)
    import vanilla.implicits.{localSeqToDatasetHolder => toDs}
    val ref = graft.operators.Packing.packSequences(
      toDs((1L to 97L).map(i => i -> ((i * 13 % 90) + 1).toInt))
        .toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", budget = 128, shards = 5)
    assert(rows.map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
  }

  test("install() retrofits a live session, idempotently") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(vanilla)
    SparkSession.setActiveSession(vanilla)
    assert(s ne vanilla)
    GraftExtensions.install(s)
    GraftExtensions.install(s)
    assert(s.experimental.extraOptimizations
      .count(_ == RewriteHofDotProduct) === 1)
    assert(s.sql("SELECT vec_dot(array(2.0D), array(8.0D)) v")
      .head().getDouble(0) === 16.0)
    import s.implicits._
    val q = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .repartition(2)
      .select(VecFns.dotComposed($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(q.head().getDouble(0) === 11.0)
  }
}
