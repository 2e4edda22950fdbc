package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaMirror, LakeWriter}

/** Delta-format live mirror: log shape, fidelity vs readSnapshot at
  * every version, incremental resume, idempotence, and the refusal
  * guards. */
class DeltaMirrorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def docs(n: Int) =
    spark.range(0, n.toLong).toDF("id")
      .withColumn("lang",
        when(pmod($"id", lit(3)) === 0, "en")
          .when(pmod($"id", lit(3)) === 1, "de").otherwise("fr"))
      .withColumn("v", $"id" * 10)

  test("mirrored log resolves to readSnapshot at every version") {
    val t = freshDir("graft_delta_fid") + "/t"
    LakeWriter.commitSnapshotDynamic(
      docs(90).where($"id" < 60), t, Seq("lang"))
    // dynamic overwrite of ONE partition: removes + adds in the log
    LakeWriter.commitSnapshotDynamic(
      docs(90).where($"id" >= 60 && $"lang" === "en"), t, Seq("lang"))
    LakeWriter.deleteFromSnapshot(spark, t, $"v" < 100)
    assert(DeltaMirror.mirror(spark, t) == 3L)
    val gvs = LakeWriter.snapshotVersions(spark, t)
    assert(DeltaMirror.deltaVersions(spark, t) == Seq(0L, 1L, 2L))
    gvs.zipWithIndex.foreach { case (gv, dv) =>
      val viaDelta = DeltaMirror.readDelta(spark, t, Some(dv.toLong))
      val viaGraft = LakeWriter.readSnapshot(spark, t, Some(gv))
      assert(viaDelta.schema.fieldNames.toSeq ==
        viaGraft.schema.fieldNames.toSeq, s"schema order at v$gv")
      assert(rows(viaDelta) == rows(viaGraft), s"rows at v$gv")
    }
    // the dynamic overwrite and the delete both retired files: the
    // log must carry remove actions (resolution is non-trivial)
    val logBody = new java.io.File(s"$t/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .mkString("\n")
    assert(logBody.contains("\"remove\""))
    assert(logBody.contains("\"partitionValues\":{\"lang\":"))
    // stats is a JSON STRING per the Delta spec — numRecords appears
    // escaped inside it
    assert(logBody.contains("numRecords"))
  }

  test("first commit carries protocol + metaData; partition spec declared") {
    val t = freshDir("graft_delta_meta") + "/t"
    LakeWriter.commitSnapshotDynamic(docs(30), t, Seq("lang"))
    DeltaMirror.mirror(spark, t)
    val c0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_delta_log/${"0" * 20}.json")))
    assert(c0.contains("\"protocol\""))
    assert(c0.contains("\"minReaderVersion\":1"))
    assert(c0.contains("\"schemaString\""))
    assert(c0.contains("\"partitionColumns\":[\"lang\"]"))
    // schemaString is Spark's schema JSON — Delta's own encoding
    val meta = c0.split('\n').find(_.contains("metaData")).get
    import org.json4s.jackson.JsonMethods
    val sj = (JsonMethods.parse(meta) \ "metaData" \ "schemaString")
      .asInstanceOf[org.json4s.JString].s
    val st = org.apache.spark.sql.types.DataType.fromJson(sj)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSet == Set("id", "lang", "v"))
  }

  test("incremental mirror: resume picks up only new versions; idempotent") {
    val t = freshDir("graft_delta_incr") + "/t"
    LakeWriter.commitSnapshot(docs(50), t)
    assert(DeltaMirror.mirror(spark, t) == 1L)
    assert(DeltaMirror.mirror(spark, t) == 0L) // no-op, byte-stable
    val before = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_delta_log/${"0" * 20}.json")))
    LakeWriter.commitSnapshot(docs(80).where($"id" >= 50), t, "append")
    LakeWriter.deleteFromSnapshot(spark, t, $"id" === 10)
    assert(DeltaMirror.mirror(spark, t) == 2L)
    val after = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_delta_log/${"0" * 20}.json")))
    assert(before == after, "resume must not rewrite mirrored commits")
    assert(rows(DeltaMirror.readDelta(spark, t)) ==
      rows(LakeWriter.readSnapshot(spark, t)))
    // unpartitioned: adds carry empty partitionValues
    val c1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$t/_delta_log/${"0" * 19}1.json")))
    assert(c1.contains("\"partitionValues\":{}"))
  }

  test("metaData re-emits on schema widening, not on every commit") {
    val t = freshDir("graft_delta_schema") + "/t"
    LakeWriter.commitSnapshot(docs(20), t)
    LakeWriter.commitSnapshot(docs(40).where($"id" >= 20), t, "append")
    LakeWriter.commitSnapshot(
      docs(60).where($"id" >= 40).withColumn("extra", lit(1L)), t,
      "append")
    DeltaMirror.mirror(spark, t)
    def commit(i: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_delta_log/" +
        ("0" * 19) + i + ".json")))
    assert(commit(0).contains("metaData"))
    assert(!commit(1).contains("metaData"))
    assert(commit(2).contains("metaData"), "widened schema re-declares")
    val viaDelta = DeltaMirror.readDelta(spark, t)
    assert(viaDelta.schema.fieldNames.contains("extra"))
    assert(rows(viaDelta) == rows(LakeWriter.readSnapshot(spark, t)))
  }

  test("column mapping mirrors natively: rename + drop resolve via physicalName") {
    val t = freshDir("graft_delta_cm") + "/t"
    LakeWriter.commitSnapshot(docs(20), t)          // v1: identity
    LakeWriter.renameColumn(spark, t, "v", "value") // v2: colmap on
    LakeWriter.commitSnapshot(                      // v3: append under rename
      docs(30).where($"id" >= 20)
        .withColumnRenamed("v", "value"), t, "append")
    LakeWriter.dropColumn(spark, t, "lang")         // v4: drop
    assert(DeltaMirror.mirror(spark, t) == 4L)
    def commit(i: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_delta_log/" + ("0" * 19) + i + ".json")))
    // plain protocol at dv0; the UPGRADE rides the rename commit
    assert(commit(0).contains("\"minReaderVersion\":1"))
    assert(commit(1).contains("\"minReaderVersion\":2"))
    assert(commit(1).contains("delta.columnMapping.mode"))
    // physicalName lives INSIDE the escaped schemaString
    assert(commit(1).contains("physicalName\\\":\\\"v\\\""))
    // fidelity at every version through the mapped reader
    val gvs = LakeWriter.snapshotVersions(spark, t)
    gvs.zipWithIndex.foreach { case (gv, dv) =>
      val viaDelta = DeltaMirror.readDelta(spark, t, Some(dv.toLong))
      val viaGraft = LakeWriter.readSnapshot(spark, t, Some(gv))
      assert(viaDelta.schema.fieldNames.toSeq ==
        viaGraft.schema.fieldNames.toSeq, s"schema order at v$gv")
      assert(rows(viaDelta) == rows(viaGraft), s"rows at v$gv")
    }
    assert(DeltaMirror.readDelta(spark, t).columns.toSeq ==
      Seq("id", "value")) // renamed present, dropped gone
  }

  test("refusals: mixed layout (atomic), rewritten history") {
    val t2 = freshDir("graft_delta_refuse2") + "/t"
    LakeWriter.commitSnapshot(docs(20), t2) // unpartitioned v1
    LakeWriter.commitSnapshotDynamic( // evolution: pre-spec files carry
      docs(40).where($"id" >= 20), t2, Seq("lang"))
    // a spec change over carried files is not Delta-expressible —
    // and the refusal is ATOMIC: no partial log wedges the cursor
    val e2 = intercept[RuntimeException](DeltaMirror.mirror(spark, t2))
    assert(e2.getMessage.contains("migratePartitionSpec"))
    assert(!new java.io.File(s"$t2/_delta_log").exists() ||
      DeltaMirror.deltaVersions(spark, t2).isEmpty)
    // the designed escape: migrate to a uniform layout, mirror from
    // the migrated version (pre-evolution history stays graft-only)
    val mv = LakeWriter.migratePartitionSpec(spark, t2)
    assert(DeltaMirror.mirror(spark, t2, fromVersion = Some(mv)) == 1L)
    assert(rows(DeltaMirror.readDelta(spark, t2)) ==
      rows(LakeWriter.readSnapshot(spark, t2)))
    // and later commits resume as diffs on the fromVersion mirror
    LakeWriter.deleteFromSnapshot(spark, t2, $"id" === 5)
    assert(DeltaMirror.mirror(spark, t2) == 1L)
    assert(rows(DeltaMirror.readDelta(spark, t2)) ==
      rows(LakeWriter.readSnapshot(spark, t2)))
  }

  test("readDelta honors re-added files (per-action ordering)") {
    // hand-written foreign log: add f1, remove f1, re-add f1 — a
    // set-difference resolution would drop it; per-action order keeps it
    val d = freshDir("graft_delta_foreign")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    df.coalesce(1).write.parquet(s"$d/files")
    val part = new java.io.File(s"$d/files").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    val schema = df.schema.json.replace("\"", "\\\"")
    new java.io.File(s"$d/_delta_log").mkdirs()
    def write(name: String, body: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$d/_delta_log/$name"),
        body.getBytes("UTF-8")): Unit
    write("0" * 20 + ".json",
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}
         |{"add":{"path":"files/$part","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    write("0" * 19 + "1.json",
      s"""{"remove":{"path":"files/$part","dataChange":true}}
         |{"add":{"path":"files/$part","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    assert(rows(DeltaMirror.readDelta(spark, d)) == rows(df))
    // and at version 0 too
    assert(rows(DeltaMirror.readDelta(spark, d, Some(0L))) == rows(df))
  }
}
