package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CurationPipeline

/** Three sequential daily loads through the curation pipeline:
  * initial commit, exact replay (idempotence), and an incremental
  * batch exercising every drop path (fingerprint history, quality
  * cascade, near-dup vs the committed corpus).
  */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10 distinct docs that PASS DefaultCascade (>=20 tokens, <=400
  // chars, no digits, stopwords present) and do NOT near-dup each
  // other: every content word is exclusive to its doc (shared shingles
  // are only the few stopwords)
  private val vocab = Seq("river", "meadow", "harbor", "forest",
    "valley", "garden", "castle", "village", "island", "desert")
  private def baseText(i: Int): String = {
    val w = vocab(i)
    val words = (0 until 20).map(j => s"$w${('a' + j).toChar}")
    s"the ${words.take(10).mkString(" ")} and " +
      s"${words.drop(10).mkString(" ")} of it"
  }
  private def baseDocs = (1 to 10).map(i => (i.toLong, baseText(i - 1)))

  test("curation pipeline: initial load, replay, incremental load") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curation_pipe_").toString

    // ---- load 1: 10 good docs + in-batch exact dup + in-batch near-dup
    val batch1 = (baseDocs ++ Seq(
      (100L, baseText(0)),                       // exact dup of doc 1
      (101L, baseText(1) + " with one more word") // near-dup of doc 2
    )).toDF("doc_id", "text")
    val r1 = CurationPipeline.run(spark, batch1, out)
    assert(r1.batchRows == 12)
    assert(r1.afterExact == 11, s"in-batch exact dup not dropped: $r1")
    assert(r1.afterQuality == 11, s"good docs failed quality: $r1")
    assert(r1.afterNearDup == 10, s"in-batch near-dup not dropped: $r1")
    assert(r1.corpusVersion == 1 && r1.corpusRows == 10)

    // ---- replay of load 1: commits nothing. Every COMMITTED doc is
    // absorbed by the corpus fingerprints at stage 1; the one
    // REJECTED doc (101, the near-dup) is recomputed and re-rejected
    // — rejected content costs work on re-land, never correctness
    val r2 = CurationPipeline.run(spark, batch1, out)
    assert(r2.afterExact == 1 && r2.afterNearDup == 0,
      s"replay not absorbed: $r2")
    assert(r2.corpusVersion == 1 && r2.corpusRows == 10,
      s"replay must not commit: $r2")

    // ---- load 2: one of each drop path + one genuinely new doc
    val batch2 = Seq(
      (200L, baseText(2)),                        // exact dup of doc 3 → corpus fp
      (1L, baseText(4).replace("valley", "canyon")), // re-used id, new text → id guard
      (201L, baseText(3) + " with a small change"), // near-dup of doc 4 → corpus sig
      (202L, baseText(0).replace("river", "tundra")), // new content, passes
      (203L, "tiny doc")                          // fails too_short
    ).toDF("doc_id", "text")
    val r3 = CurationPipeline.run(spark, batch2, out)
    assert(r3.batchRows == 5)
    assert(r3.afterExact == 3, s"fp/id dups not dropped: $r3")
    assert(r3.afterQuality == 2, s"quality gate failed: $r3")
    assert(r3.attrition.getOrElse("too_short", 0L) == 1L, s"$r3")
    assert(r3.afterNearDup == 1, s"corpus near-dup not dropped: $r3")
    assert(r3.corpusVersion == 2 && r3.corpusRows == 11, s"$r3")

    // the committed corpus is time-travelable: v1 still has 10 rows
    assert(graft.sources.LakeWriter
      .readSnapshot(spark, s"$out/corpus", Some(1L)).count() == 10)
    // and the survivor of load 2 is the genuinely new doc
    val v2 = graft.sources.LakeWriter.readSnapshot(spark, s"$out/corpus")
    val v2Ids = v2.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(v2Ids == ((1L to 10L).toSet + 202L), s"$v2Ids")
    // fingerprints + signatures ride as corpus columns (the one
    // durable structure — no cross-table commit ordering to crash
    // between)
    assert(v2.columns.toSet == Set("doc_id", "text", "fp", "sig"))

    // run ledger: one row per ATTEMPT (incl. the absorbed replay),
    // recording the attrition funnel and the corpus version left
    // behind; attrition rides as key-sorted JSON
    val led = CurationPipeline.ledger(spark, out)
      .orderBy($"corpus_version", $"batch_rows".desc, $"after_exact".desc)
      .collect()
    assert(led.length == 3, s"expected 3 ledger rows, got ${led.length}")
    assert(led.map(r => (r.getAs[Long]("corpus_version"),
      r.getAs[Long]("after_near_dup"), r.getAs[Long]("corpus_rows")))
      .toSeq == Seq((1L, 10L, 10L), (1L, 0L, 10L), (2L, 1L, 11L)))
    assert(led(2).getAs[String]("attrition").contains("\"too_short\":1"))

    // dup ids WITHIN a batch collapse to one deterministic row
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_curation_dupid_").toString
    val rd = CurationPipeline.run(spark,
      Seq((5L, baseText(5)), (5L, "tiny doc")).toDF("doc_id", "text"),
      out2)
    assert(rd.afterExact == 1 && rd.corpusRows <= 1, s"$rd")

    // maintenance: compaction commits v3 with identical content,
    // vacuum keeps only the newest versions, and the delta mirror
    // rides along (corpus natively readable as a Delta table)
    val v = CurationPipeline.maintain(spark, out, nFiles = 2,
      keepVersions = 1, mirrorDelta = true, checkpointEvery = 3,
      mirrorIceberg = true, icebergRetainSnapshots = 1)
    assert(v == 3L)
    val after = graft.sources.LakeWriter.readSnapshot(spark, s"$out/corpus")
    assert(after.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      ((1L to 10L).toSet + 202L))
    assert(graft.sources.LakeWriter
      .snapshotVersions(spark, s"$out/corpus") == Seq(3L))
    val viaDelta = graft.sources.DeltaMirror
      .readDelta(spark, s"$out/corpus")
    assert(viaDelta.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      ((1L to 10L).toSet + 202L))
    // the maintenance mirror checkpointed (3 mirrored versions >= the
    // cadence): months of daily loads stay O(cadence) to open for a
    // foreign reader
    assert(new java.io.File(s"$out/corpus/_delta_log/_last_checkpoint")
      .exists())
    // the Iceberg twin rides the same maintenance pass, expired down
    // to the window (metadata tree bounded alongside vacuum)
    val viaIce = graft.sources.IcebergMirror
      .readIceberg(spark, s"$out/corpus")
    assert(viaIce.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      ((1L to 10L).toSet + 202L))
    assert(graft.sources.IcebergMirror
      .icebergSnapshots(spark, s"$out/corpus").size == 1)
  }

  test("the curated corpus serves through Views, including AS OF") {
    import graft.sources.Views
    val out = java.nio.file.Files
      .createTempDirectory("graft_curation_serve_").toString
    CurationPipeline.run(spark,
      (1 to 5).map(i => (i.toLong, baseText(i - 1)))
        .toDF("doc_id", "text"), out)
    CurationPipeline.run(spark,
      Seq((6L, baseText(5))).toDF("doc_id", "text"), out)
    // the curation zone registers exactly like the warehouse zone —
    // snapshot tables serve their latest version
    Views.registerZone(spark, out)
    assert(spark.sql("SELECT count(*) FROM corpus").head().getLong(0) == 6)
    assert(spark.sql(
      "SELECT count(DISTINCT fp) FROM corpus").head().getLong(0) == 6)
    // time travel: the pre-load-2 corpus is still queryable
    Views.registerSnapshotAsOf(spark, s"$out/corpus", "corpus_v1", 1L)
    assert(spark.sql("SELECT count(*) FROM corpus_v1").head().getLong(0) == 5)
  }

  test("streaming ingest matches the batch pipeline, one commit per batch") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curation_stream_").toString
    val land = java.nio.file.Files
      .createTempDirectory("graft_curation_land_")
    // two landing files -> two micro-batches; file B repeats a doc of
    // file A (cross-batch exact dup) and adds two new ones
    (1 to 6).map(i => (i.toLong, baseText(i - 1)))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(land.resolve("a").toString)
    Seq((7L, baseText(6)), (8L, baseText(7)), (9L, baseText(0)))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(land.resolve("b").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(land.toString + "/*")
    val q = CurationPipeline.runStream(stream, out,
      java.nio.file.Files.createTempDirectory("graft_cur_ckpt_").toString)
    q.awaitTermination()
    val ids = graft.sources.LakeWriter
      .readSnapshot(spark, s"$out/corpus")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // doc 9 (batch-2 re-land of doc 1's content) is dropped by the
    // fingerprint history built from batch 1; 7 and 8 survive
    assert(ids == (1L to 8L).toSet, s"$ids")
    // one commit per micro-batch: v1 = file a only, v2 = + file b
    assert(graft.sources.LakeWriter
      .snapshotVersions(spark, s"$out/corpus") == Seq(1L, 2L))
    assert(graft.sources.LakeWriter
      .readSnapshot(spark, s"$out/corpus", Some(1L)).count() == 6)
    // the speed layer inherits the run ledger: one attrition row per
    // micro-batch, so streaming loads are as observable as batch ones
    val led = CurationPipeline.ledger(spark, out)
      .orderBy($"corpus_version").collect()
    assert(led.map(r => (r.getAs[Long]("corpus_version"),
      r.getAs[Long]("batch_rows"), r.getAs[Long]("after_near_dup")))
      .toSeq == Seq((1L, 6L, 6L), (2L, 3L, 2L)), led.mkString(";"))
  }

  test("torn commit: crash between corpus commit and ledger is replay-safe") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curation_torn_").toString
    val land = java.nio.file.Files
      .createTempDirectory("graft_curation_tland_")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cur_tckpt_").toString
    (1 to 4).map(i => (i.toLong, baseText(i - 1)))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(land.resolve("a").toString)
    Seq((5L, baseText(4)), (6L, baseText(5)))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(land.resolve("b").toString)
    def stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(land.toString + "/*")
    val q1 = CurationPipeline.runStream(stream, out, ckpt)
    q1.awaitTermination()
    // the manager deregisters terminated queries asynchronously; a
    // restart on the same checkpoint must wait or it is refused as a
    // concurrent query
    while (spark.streams.active.exists(_.id == q1.id)) Thread.sleep(20)
    val corpus = s"$out/corpus"
    val before = graft.sources.LakeWriter.readSnapshot(spark, corpus)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(before == (1L to 6L) &&
      graft.sources.LakeWriter.snapshotVersions(spark, corpus) ==
        Seq(1L, 2L))
    // SIMULATE the crash window of micro-batch 1: the corpus snapshot
    // committed, then the process died BEFORE the ledger append and
    // BEFORE the checkpoint marked the batch done — on disk that is
    // exactly: no ledger v2 manifest, no commits/1 marker. The local
    // FS keeps .crc SIDECARS next to both; a file a crash never
    // created has no sidecar either, so the simulation removes them
    // as a pair
    def rmWithCrc(p: String): Unit = {
      val f = java.nio.file.Paths.get(p)
      java.nio.file.Files.delete(f)
      val crc = f.getParent.resolve("." + f.getFileName + ".crc")
      java.nio.file.Files.deleteIfExists(crc): Unit
    }
    rmWithCrc(s"$out/ledger/_manifests/v2.json")
    rmWithCrc(s"$ckpt/commits/1")
    assert(CurationPipeline.ledger(spark, out).count() == 1)
    // restart → batch 1 REPLAYS against a corpus already holding its
    // docs: every doc is absorbed by the fingerprint history, the
    // corpus commits nothing (exactly-once), the ledger records the
    // replay ATTEMPT (documented-advisory behavior)
    CurationPipeline.runStream(stream, out, ckpt).awaitTermination()
    val after = graft.sources.LakeWriter.readSnapshot(spark, corpus)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before, s"corpus diverged on replay: $after")
    assert(graft.sources.LakeWriter.snapshotVersions(spark, corpus) ==
      Seq(1L, 2L), "replay must not commit a corpus version")
    val led = CurationPipeline.ledger(spark, out)
      .orderBy($"corpus_version", $"after_near_dup".desc).collect()
      .map(r => (r.getAs[Long]("corpus_version"),
        r.getAs[Long]("batch_rows"), r.getAs[Long]("after_near_dup")))
    assert(led.toSeq == Seq((1L, 4L, 4L), (2L, 2L, 0L)),
      s"ledger rows: ${led.mkString(";")}")
  }
}
