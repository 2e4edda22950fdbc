package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFns
import graft.operators.Similarity
import graft.sources.{QuantizedStore, Tables}

/** Persisted SQ8 corpus: the storage side of the quantized ANN tier. */
class QuantizedStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val embeddings = Tables.load(spark, TestSpark.sfDir, "embeddings")

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("write/read round trip equals the in-flight SqReconstruct kernel") {
    val path = tmpDir("graft_qstore")
    QuantizedStore.write(embeddings, "vec_id", "embedding", dim = 64, path)
    val decoded = QuantizedStore.read(spark, path, "vec_id", "embedding")
    val (lo, hi) = Similarity.dimBounds(embeddings, "embedding", 64)
    val expected = embeddings.select($"vec_id",
      VecFns.sqReconstruct($"embedding", lo.toSeq, hi.toSeq).as("embedding"))
    assert(decoded.count() == embeddings.count())
    assert(decoded.exceptAll(expected).isEmpty &&
      expected.exceptAll(decoded).isEmpty)
  }

  test("out-of-range values saturate at the lattice ends (frozen bounds)") {
    // encode against bounds NOT covering the data — the incremental
    // case of appending new vectors to a store with frozen bounds
    val df = Seq(Tuple1(Seq(-5.0f)), Tuple1(Seq(9.0f)), Tuple1(Seq(0.5f)))
      .toDF("v")
    val lo = Seq(0.0); val hi = Seq(1.0)
    val rt = df.select(VecFns.sqDecode(
        VecFns.sqEncode($"v", lo, hi), lo, hi).as("r"))
      .collect().map(_.getSeq[Double](0).head)
    assert(rt(0) == 0.0 && rt(1) == 1.0) // clamped, not wrapped
    // and the in-flight round trip agrees (both clamp identically)
    val infl = df.select(VecFns.sqReconstruct($"v", lo, hi).as("r"))
      .collect().map(_.getSeq[Double](0).head)
    assert(rt.sameElements(infl))
  }

  test("topK off the store equals sqTopK over the raw corpus") {
    val path = tmpDir("graft_qstore_topk")
    QuantizedStore.write(embeddings, "vec_id", "embedding", dim = 64, path)
    val qs = embeddings.where($"vec_id" < 10)
    val fromStore = QuantizedStore.topK(spark, path, qs, "vec_id",
      "embedding", k = 5)
    val inFlight = Similarity.sqTopK(qs, embeddings, "vec_id",
      "embedding", k = 5, dim = 64)
    assert(fromStore.exceptAll(inFlight).isEmpty &&
      inFlight.exceptAll(fromStore).isEmpty)
  }

  test("append codes a delta under the FROZEN bounds; existing codes " +
      "and the bounds sidecar are untouched") {
    val path = tmpDir("graft_qstore_append")
    val base = embeddings.where($"vec_id" < 1000)
    val delta = embeddings.where($"vec_id" >= 1000 && $"vec_id" < 1100)
    QuantizedStore.write(base, "vec_id", "embedding", dim = 64, path)
    val boundsBefore = spark.read.parquet(s"$path/bounds").collect()
    val baseCodesBefore = spark.read.parquet(s"$path/codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap

    QuantizedStore.append(delta, "vec_id", "embedding", path)

    // bounds sidecar byte-identical; every pre-existing code unchanged
    assert(spark.read.parquet(s"$path/bounds").collect()
      .sameElements(boundsBefore))
    val after = spark.read.parquet(s"$path/codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(after.size == baseCodesBefore.size + delta.count())
    baseCodesBefore.foreach { case (id, c) => assert(after(id) == c) }
    // delta codes equal direct encoding under the BASE corpus bounds
    // (not bounds of base ∪ delta — that would re-scale history)
    val (lo, hi) = Similarity.dimBounds(base, "embedding", 64)
    val expected = delta.select($"vec_id",
        VecFns.sqEncode($"embedding", lo.toSeq, hi.toSeq).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    expected.foreach { case (id, c) => assert(after(id) == c) }
    // the read path decodes the union seamlessly
    assert(QuantizedStore.read(spark, path, "vec_id", "embedding")
      .count() == after.size)
  }

  test("the code table is materially smaller than float parquet") {
    val path = tmpDir("graft_qstore_sz")
    QuantizedStore.write(embeddings, "vec_id", "embedding", dim = 64, path)
    val rawPath = tmpDir("graft_qstore_raw")
    embeddings.select($"vec_id", $"embedding")
      .write.mode("overwrite").parquet(s"$rawPath/floats")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      if (d.isFile) d.length
      else Option(d.listFiles).map(_.map(f => bytes(f.getPath)).sum)
        .getOrElse(0L)
    }
    val codeBytes = bytes(s"$path/codes")
    val floatBytes = bytes(s"$rawPath/floats")
    assert(codeBytes > 0 && floatBytes > 0)
    assert(codeBytes < floatBytes * 6 / 10,
      s"codes $codeBytes vs floats $floatBytes — expected < 60%")
  }
}
