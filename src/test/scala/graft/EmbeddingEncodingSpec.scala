package graft

import java.nio.file.{Files => JFiles, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the embeddings physical-encoding contract — the sibling of
  * TsEncodingSpec for the other generator-owned risky column. Today
  * `embedding` is `list<float>`; a regeneration could plausibly ship
  * `list<double>` (the events.ts flip precedent). Every consumer —
  * the HOF cosine path, the native SQ codec expressions, the PQ/IVF
  * codebook trainers — already pattern-matches Float|Double element
  * types; this spec pins that the flagship queries return IDENTICAL
  * results over both encodings, so a flip degrades nothing.
  *
  * Float→double widening is exact (every float is representable as a
  * double), so exact equality — not tolerance — is the right check.
  */
class EmbeddingEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeSingle(df: DataFrame, dest: Path): Unit = {
    val build = JFiles.createTempDirectory("graft_embenc_build")
    df.coalesce(1).write.mode("overwrite").parquet(build.toString)
    val part = JFiles.list(build).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part under $build"))
    JFiles.createDirectories(dest.getParent)
    JFiles.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    JFiles.walk(build).iterator().asScala.toSeq.reverse
      .foreach(JFiles.deleteIfExists(_))
  }

  /** sf dir holding ONLY embeddings.parquet, elements cast to double. */
  private lazy val doubleDir: String = {
    val root = JFiles.createTempDirectory("graft_embenc_double")
    writeSingle(
      spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
        .withColumn("embedding", col("embedding").cast("array<double>")),
      root.resolve("embeddings.parquet"))
    root.toString
  }

  // flagship consumers spanning the three code paths: HOF/codegen
  // cosine, the native SQ codec Expression, and the PQ trainer+scan
  private val queriesUnderTest =
    Seq("q_embed_cosine", "q_embed_cosine_topk", "q_embed_sq_topk",
        "q_embed_pq_topk")

  for (q <- queriesUnderTest)
    test(s"$q is element-type-agnostic (float vs double embeddings)") {
      val float = SparkEntry.queries(q)(spark, TestSpark.sfDir)
      val double = SparkEntry.queries(q)(spark, doubleDir)
      assert(double.schema == float.schema,
        "result schema must not leak the input element type")
      assert(double.count() == float.count())
      assert(double.except(float).isEmpty && float.except(double).isEmpty,
        s"$q results diverge between float and double embeddings")
    }
}
