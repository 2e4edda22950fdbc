package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.LakeWriter

/** The open-format export bridge: a snapshot exported as plain
  * hive-partitioned parquet must read back IDENTICALLY with stock
  * spark.read.parquet (no graft code — the "external engine" posture),
  * and the exported manifest TABLE must account for every data file
  * with correct row counts and honest min/max stats. */
class ExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("export = snapshot rows via stock parquet read; manifest accounts for every file") {
    val root = freshDir("graft_export_spec_")
    val table = s"$root/src"; val out = s"$root/export"
    val docs = Seq(
      (1L, "en", "web", 100), (2L, "de", "web", 250),
      (3L, "en", "book", 300), (4L, "fr", "web", 50),
      (5L, "en", "web", 400), (6L, "de", "book", 500))
      .toDF("doc_id", "lang", "source", "n_chars")
    LakeWriter.commitSnapshot(docs.where($"doc_id" <= 4), table)
    LakeWriter.commitSnapshot(docs.where($"doc_id" > 4), table,
      mode = "append")
    LakeWriter.deleteFromSnapshot(spark, table, $"n_chars" < 100)
    val v = LakeWriter.exportSnapshot(spark, table, out,
      partitionBy = Seq("lang"))
    assert(v === 3L)

    // stock reader sees exactly the snapshot (logical names, rows)
    val viaStock = spark.read.parquet(s"$out/data")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .as[(Long, String, String, Int)].collect().sorted
    val viaGraft = LakeWriter.readSnapshot(spark, table)
      .as[(Long, String, String, Int)].collect().sorted
    assert(viaStock === viaGraft)
    assert(viaStock.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L, 6L))

    // manifest table: every data file present, rows sum to the table,
    // bytes positive, per-file doc_id min/max bracket reality
    val man = spark.read.parquet(s"$out/manifest")
    val files = man.select($"file").as[String].collect()
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")))
    val fsFiles = new java.io.File(s"$out/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(f =>
        f.getParentFile.getName + "/" + f.getName).sorted
    assert(files.sorted.toSeq === fsFiles.toSeq)
    assert(man.agg(sum($"rows")).as[Long].head === 5L)
    assert(man.where($"bytes" <= 0).count() === 0)
    val idStats = man.select(explode($"col_stats").as("cs"))
      .where($"cs.column" === "doc_id")
      .select($"cs.min".cast("long"), $"cs.max".cast("long"))
      .as[(Long, Long)].collect()
    assert(idStats.nonEmpty)
    assert(idStats.forall { case (lo, hi) => lo >= 1L && hi <= 6L && lo <= hi })

    // unpartitioned export of an older version works too
    val out2 = s"$root/export_v1"
    LakeWriter.exportSnapshot(spark, table, out2, version = Some(1L))
    assert(spark.read.parquet(s"$out2/data").count() === 4L)
  }

  test("convertToSnapshot adopts hive-partitioned parquet metadata-only; pruning and DELETE work") {
    val root = freshDir("graft_import_spec_")
    val ext = s"$root/external"; val table = s"$root/table"
    val docs = Seq(
      (1L, "en", 100), (2L, "de", 250), (3L, "en", 300),
      (4L, "fr", 50), (5L, "en", 400), (6L, "de", 500))
      .toDF("doc_id", "lang_free", "n_chars")
      .withColumn("lang", $"lang_free").drop("lang_free")
    docs.write.partitionBy("lang").parquet(ext)
    def listExt() = new java.io.File(ext).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    val beforeSig = listExt().map(f => (f.length, f.lastModified()))
      .sorted.toSeq

    assert(LakeWriter.convertToSnapshot(spark, ext, table) === 1L)
    // metadata-only: no data dir materialized, no byte rewritten —
    // adoption takes OWNERSHIP and may RENAME collided basenames
    // (the manifest's per-file metadata is basename-keyed), but a
    // rename moves nothing: same file count, sizes and mtimes
    assert(!new java.io.File(s"$table/data").exists())
    val extAfter = listExt()
    assert(extAfter.map(f => (f.length, f.lastModified())).sorted.toSeq
      === beforeSig)
    // full read equals the source through the committed schema
    assert(LakeWriter.readSnapshot(spark, table)
      .select($"doc_id", $"n_chars", $"lang")
      .as[(Long, Int, String)].collect().sorted.toSeq ===
      docs.select($"doc_id", $"n_chars", $"lang")
        .as[(Long, Int, String)].collect().sorted.toSeq)

    // partition pruning on ADOPTED files: corrupt the de files in
    // place — a lang='en' read must never open them, and neither may
    // the partition-scoped DELETE below
    extAfter.map(_.getPath).filter(_.contains("lang=de")).foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        "corrupt".getBytes): Unit
    }
    assert(LakeWriter.readSnapshotWhere(spark, table, $"lang" === "en")
      .select($"doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 5L))

    // partition-scoped copy-on-write DELETE on the adopted table: the
    // en partition rewrites into the table's own data dir; the
    // corrupt de partition is excluded by partition pruning in both
    // the matched-file probe and the rewrite, carrying by reference;
    // history time-travels to the adopted version
    LakeWriter.deleteFromSnapshot(spark, table,
      $"lang" === "en" && $"n_chars" < 200)
    assert(LakeWriter.readSnapshotWhere(spark, table, $"lang" === "en")
      .select($"doc_id").as[Long].collect().sorted.toSeq === Seq(3L, 5L))
    assert(new java.io.File(s"$table/data").exists())
    assert(LakeWriter.readSnapshotWhere(spark, table, $"lang" === "en",
      version = Some(1L)).select($"doc_id").as[Long].collect().sorted
      .toSeq === Seq(1L, 3L, 5L))
  }

  test("flat conversion supports append and stays readable; refuses non-fresh tables") {
    val root = freshDir("graft_import_flat_")
    val ext = s"$root/flat"; val table = s"$root/table"
    Seq((1L, 10), (2L, 20)).toDF("k", "v").write.parquet(ext)
    LakeWriter.convertToSnapshot(spark, ext, table)
    // appends COMMIT normally on top of the adopted v1: new files in
    // the table's data dir, adopted files carried by absolute path
    LakeWriter.commitSnapshot(Seq((3L, 30)).toDF("k", "v"), table,
      mode = "append")
    assert(LakeWriter.readSnapshot(spark, table).as[(Long, Int)]
      .collect().sorted.toSeq === Seq((1L, 10), (2L, 20), (3L, 30)))
    assert(LakeWriter.snapshotRowCount(spark, table) === 3L)
    // a table with history refuses conversion
    val ex = intercept[IllegalArgumentException] {
      LakeWriter.convertToSnapshot(spark, ext, table)
    }
    assert(ex.getMessage.contains("fresh"))
  }

  test("round trip at scale of versions: export -> convert -> append -> MERGE -> export, byte-stable") {
    // the full interop loop chained (r11 verdict #8): a table leaves
    // through the open-format export, is ADOPTED back as a fresh
    // snapshot, evolves (append + keyed MERGE) as a first-class
    // table, and exports again — every hop must preserve rows
    // exactly, and re-exporting an UNCHANGED table must be
    // byte-stable (same data bytes, same manifest table content), so
    // a silent regression in either direction of the bridge cannot
    // hide behind nondeterministic output.
    val root = freshDir("graft_roundtrip_")
    val t1 = s"$root/t1"
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "en" else "de", i * 10))
      .toDF("doc_id", "lang", "n_chars")
    LakeWriter.commitSnapshot(docs.where($"doc_id" <= 25), t1)
    LakeWriter.commitSnapshot(docs.where($"doc_id" > 25), t1, "append")
    LakeWriter.deleteFromSnapshot(spark, t1, $"doc_id" === 7)

    // hop 1: export, re-adopt
    LakeWriter.exportSnapshot(spark, t1, s"$root/ex1",
      partitionBy = Seq("lang"))
    val t2 = s"$root/t2"
    LakeWriter.convertToSnapshot(spark, s"$root/ex1/data", t2)
    def rows(t: String) = LakeWriter.readSnapshot(spark, t)
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(rows(t2) == rows(t1), "adoption must preserve the export")

    // hop 2: the adopted table evolves — append + keyed MERGE
    LakeWriter.commitSnapshot(
      Seq((100L, "fr", 1000L)).toDF("doc_id", "lang", "n_chars"), t2,
      "append")
    LakeWriter.mergeSnapshot(
      Seq((1L, "de", 9999L), (101L, "en", 1L))
        .toDF("doc_id", "lang", "n_chars"), t2, Seq("doc_id"))
    val expect = (rows(t1) - ((1L, "de", 10L)) +
      ((100L, "fr", 1000L)) + ((1L, "de", 9999L)) + ((101L, "en", 1L)))
    assert(rows(t2) == expect, "append+MERGE on the adopted table")

    // hop 3: export the evolved table; a STOCK parquet read of the
    // export equals the table (the external-engine posture)
    LakeWriter.exportSnapshot(spark, t2, s"$root/ex2",
      partitionBy = Seq("lang"))
    val ext = spark.read.option("basePath", s"$root/ex2/data")
      .parquet(s"$root/ex2/data")
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(ext == expect, "second export readable by stock parquet")

    // byte stability: re-exporting the unchanged table yields
    // byte-identical data files per (partition dir, part index) —
    // only the writer-UUID in the file NAME may differ — and the
    // same manifest table content modulo that UUID
    LakeWriter.exportSnapshot(spark, t2, s"$root/ex3",
      partitionBy = Seq("lang"))
    def normName(p: String): String =
      p.replaceAll("(part-\\d+)-[0-9a-f-]+(\\.c\\d+)?", "$1")
    def fileBytes(dir: String): Map[String, Seq[Byte]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => normName(f.getPath.stripPrefix(dir)) ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    assert(fileBytes(s"$root/ex3/data") == fileBytes(s"$root/ex2/data"),
      "re-export of an unchanged table must be byte-stable")
    def manifestRows(dir: String) = spark.read.parquet(s"$dir/manifest")
      .select($"file", $"bytes", $"rows").as[(String, Long, Long)]
      .collect().map { case (f, b, r) => (normName(f), b, r) }.toSet
    assert(manifestRows(s"$root/ex3") == manifestRows(s"$root/ex2"))
  }
}
