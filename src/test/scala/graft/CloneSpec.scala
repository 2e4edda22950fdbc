package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeWriter

/** SHALLOW CLONE: metadata-only fork, independent evolution, carried
  * skipping stats, and the commit-discipline guards. */
class CloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("clone is metadata-only and reads equal at the fork point") {
    val root = freshDir("graft_clone_meta")
    val src = s"$root/src"
    val cln = s"$root/cln"
    LakeWriter.commitSnapshot(
      spark.range(0, 100).toDF("k").withColumn("v", $"k" * 2), src)
    LakeWriter.commitSnapshot(
      spark.range(100, 150).toDF("k").withColumn("v", $"k" * 2), src,
      "append")
    val v = LakeWriter.cloneSnapshot(spark, src, cln)
    assert(v == 1L)
    // metadata-only: the clone directory holds manifests and nothing
    // else — zero data bytes moved
    val entries = new java.io.File(cln).listFiles().map(_.getName).toSet
    assert(entries == Set("_manifests"))
    assert(LakeWriter.readSnapshot(spark, cln).collect().map(_.getLong(0))
      .sorted.toSeq == (0L until 150L))
    // schema carried verbatim
    assert(LakeWriter.readSnapshot(spark, cln).schema ==
      LakeWriter.readSnapshot(spark, src).schema)
  }

  test("clone at an explicit earlier version forks the old state") {
    val root = freshDir("graft_clone_ver")
    val src = s"$root/src"
    val cln = s"$root/cln"
    LakeWriter.commitSnapshot(spark.range(0, 10).toDF("k"), src)
    LakeWriter.commitSnapshot(spark.range(10, 20).toDF("k"), src, "append")
    LakeWriter.cloneSnapshot(spark, src, cln, Some(1L))
    assert(LakeWriter.readSnapshot(spark, cln).count() == 10L)
  }

  test("clone and source evolve independently (copy-on-write never crosses)") {
    val root = freshDir("graft_clone_div")
    val src = s"$root/src"
    val cln = s"$root/cln"
    LakeWriter.commitSnapshot(
      spark.range(0, 50).toDF("k").withColumn("v", $"k" % 5), src)
    LakeWriter.cloneSnapshot(spark, src, cln)
    val srcFilesBefore = LakeWriter.snapshotFiles(spark, src,
      LakeWriter.snapshotVersions(spark, src).last).toSet
    // diverge: append to the clone, DELETE from the source
    LakeWriter.commitSnapshot(
      spark.range(50, 60).toDF("k").withColumn("v", lit(9L)), cln, "append")
    LakeWriter.deleteFromSnapshot(spark, src, $"v" === 0L)
    assert(LakeWriter.readSnapshot(spark, cln).count() == 60L)
    assert(LakeWriter.readSnapshot(spark, src).count() == 40L)
    // the clone's new files live under the CLONE's directory; the
    // source's delete rewrote under the SOURCE's — no cross-writes
    val clnFiles = LakeWriter.snapshotFiles(spark, cln,
      LakeWriter.snapshotVersions(spark, cln).last)
    val newClnFiles = clnFiles.filterNot(srcFilesBefore)
    assert(newClnFiles.nonEmpty && newClnFiles.forall(_.contains(root + "/cln/")))
    // the clone still references the source's ORIGINAL files (the
    // source's post-fork delete rewrote copies, not them)
    assert(clnFiles.exists(srcFilesBefore))
    // CDC across the clone's fork version sees exactly the append
    val feed = LakeWriter.changesBetween(spark, cln, 1L, 2L)
    assert(feed.where($"_change_type" === "insert").count() == 10L)
    assert(feed.where($"_change_type" === "delete").count() == 0L)
  }

  test("clone carries per-file skipping stats: pruned files never open") {
    val root = freshDir("graft_clone_stats")
    val src = s"$root/src"
    val cln = s"$root/cln"
    // two files with disjoint k bands
    LakeWriter.commitSnapshot(
      spark.range(0, 10).toDF("k").coalesce(1), src)
    LakeWriter.commitSnapshot(
      spark.range(100, 110).toDF("k").coalesce(1), src, "append")
    LakeWriter.cloneSnapshot(spark, src, cln)
    // corrupt the low-band file in place (shared storage)
    val low = LakeWriter.snapshotFiles(spark, cln, 1L).find { f =>
      spark.read.parquet(f).agg(min($"k")).head().getLong(0) == 0L
    }.get
    java.nio.file.Files.write(
      java.nio.file.Paths.get(low.stripPrefix("file:")),
      "not parquet".getBytes)
    // a high-band read through the CLONE must prune the corrupt file
    // purely from the carried manifest stats
    assert(LakeWriter.readSnapshotWhere(spark, cln, $"k" >= 100L)
      .collect().map(_.getLong(0)).sorted.toSeq == (100L until 110L))
  }

  test("clone refuses a target with history and a missing source version") {
    val root = freshDir("graft_clone_guard")
    val src = s"$root/src"
    val cln = s"$root/cln"
    LakeWriter.commitSnapshot(spark.range(0, 5).toDF("k"), src)
    LakeWriter.cloneSnapshot(spark, src, cln)
    intercept[IllegalArgumentException] {
      LakeWriter.cloneSnapshot(spark, src, cln)
    }
    intercept[IllegalArgumentException] {
      LakeWriter.cloneSnapshot(spark, src, s"$root/other", Some(99L))
    }
  }
}
