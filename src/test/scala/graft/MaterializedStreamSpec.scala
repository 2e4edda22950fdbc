package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeWriter, Materialized}

/** Streaming incremental MV maintenance: the manifest-directory file
  * stream must land exactly where the batch cursor loop lands. */
class MaterializedStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mvState(mv: String): Map[Long, (Long, Long)] =
    LakeWriter.readSnapshot(spark, mv).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("stream-maintained MV equals the batch cursor loop over an identical history") {
    val root = freshDir("graft_mvstream_eq")
    def build(src: String): Unit = {
      LakeWriter.commitSnapshot(
        spark.range(0, 60).toDF("id").withColumn("g", $"id" % 3)
          .withColumn("x", $"id" * 10), src)
      LakeWriter.commitSnapshot(
        spark.range(60, 90).toDF("id").withColumn("g", $"id" % 3)
          .withColumn("x", $"id" * 10), src, "append")
      LakeWriter.deleteFromSnapshot(spark, src, $"id" >= 80L)
    }
    build(s"$root/srcA"); build(s"$root/srcB")
    Materialized.refreshAgg(spark, s"$root/srcA", s"$root/mvA",
      s"$root/cursorA", Seq("g"), Seq("x"))
    Materialized.refreshAggStream(spark, s"$root/srcB", s"$root/mvB",
      s"$root/ckptB", Seq("g"), Seq("x"))
    val a = mvState(s"$root/mvA")
    val b = mvState(s"$root/mvB")
    assert(a == b && a.nonEmpty)
    // and both equal the full recompute
    val full = LakeWriter.readSnapshot(spark, s"$root/srcA")
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(a == full)
  }

  test("re-invoking on a live checkpoint drains only the later commits") {
    val root = freshDir("graft_mvstream_inc")
    val src = s"$root/src"
    LakeWriter.commitSnapshot(
      spark.range(0, 40).toDF("id").withColumn("g", $"id" % 2)
        .withColumn("x", lit(1L)), src)
    Materialized.refreshAggStream(spark, src, s"$root/mv",
      s"$root/ckpt", Seq("g"), Seq("x"))
    assert(mvState(s"$root/mv").values.map(_._1).sum == 40L)
    val mvVersionsAfterFirst =
      LakeWriter.snapshotVersions(spark, s"$root/mv").size
    // a later commit lands after the first drain
    LakeWriter.commitSnapshot(
      spark.range(40, 50).toDF("id").withColumn("g", $"id" % 2)
        .withColumn("x", lit(1L)), src, "append")
    Materialized.refreshAggStream(spark, src, s"$root/mv",
      s"$root/ckpt", Seq("g"), Seq("x"))
    assert(mvState(s"$root/mv").values.map(_._1).sum == 50L)
    // only the new version's delta was applied (one more MV merge
    // round, not a replay of the whole history)
    val mvVersionsAfterSecond =
      LakeWriter.snapshotVersions(spark, s"$root/mv").size
    assert(mvVersionsAfterSecond > mvVersionsAfterFirst)
    assert(mvVersionsAfterSecond - mvVersionsAfterFirst <= 2)
  }
}
