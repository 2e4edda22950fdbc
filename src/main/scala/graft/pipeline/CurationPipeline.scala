package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Curation, Dedup}
import graft.sources.LakeWriter

/** End-to-end corpus curation: the DAILY TRAINING-DATA LOAD as one
  * idempotent Spark job — the LLM-pipeline counterpart of
  * [[LakehousePipeline]]'s star-schema build.
  *
  * Stages, in order (each stage only ever sees the previous stage's
  * survivors, so the expensive steps run on the smallest frame):
  *  1. EXACT dedup — one row per doc id, one survivor per
  *     normalized-text fingerprint within the batch, then a
  *     Bloom-prefiltered exact anti-join against the corpus's OWN
  *     fingerprint column.
  *  2. QUALITY gate — `Curation.filterCascade`, keeping `pass` docs
  *     and recording per-rule attrition (the report every new filter
  *     is judged by).
  *  3. PII redaction — the kept docs' text is replaced by the
  *     redacted form before anything is persisted.
  *  4. NEAR-DUP vs the corpus — incremental MinHash: only the batch's
  *     text is scanned; the existing corpus participates through its
  *     `sig` column (`minhashPairsDelta`). A new doc drops if it
  *     near-matches any corpus doc, or an earlier (smaller-id) doc of
  *     the same batch.
  *  5. COMMIT — survivors append-commit to the corpus snapshot WITH
  *     their fingerprint and signature as columns.
  *
  * ONE durable structure, ONE commit point: fingerprints and MinHash
  * signatures ride as corpus columns (sigs are ~1/1000 of the text),
  * so there is no cross-table ordering to crash between. A replayed
  * batch (foreachBatch re-delivery, double-submitted job) either runs
  * before the commit — everything recomputes and commits exactly
  * once — or after it, in which case stage 1 absorbs every row
  * against the committed fingerprints and nothing commits. Content
  * REJECTED by a gate is recomputed on re-land (it is not recorded
  * anywhere), which costs work, never correctness.
  *
  * Scale shape: the corpus grows by delta-sized appends and no stage
  * re-scans the historical corpus text — history participates only
  * through its fingerprint column (Bloom build: one column scan) and
  * its signature column.
  */
object CurationPipeline {

  case class Result(batchRows: Long, afterExact: Long, afterQuality: Long,
                    afterNearDup: Long, corpusVersion: Long,
                    corpusRows: Long, attrition: Map[String, Long])

  def run(spark: SparkSession, batch: DataFrame, outDir: String,
          textCol: String = "text", idCol: String = "doc_id",
          nearDupThreshold: Double = 0.5): Result = {
    val corpusTable = s"$outDir/corpus"
    val versions0 = LakeWriter.snapshotVersions(spark, corpusTable)
    val corpus =
      if (versions0.nonEmpty) Some(LakeWriter.readSnapshot(spark, corpusTable))
      else None

    // ---- 1. exact dedup: one row per id, one id per fingerprint,
    //         then vs the corpus's own fingerprint column
    // NOTE: n0 stays a dedicated count — riding it as an .observe on
    // `batch` double-fires once a corpus exists, because
    // bloomAntiJoin references the batch subtree twice (bloom-hit ∪
    // bloom-miss branches)
    val n0 = batch.count()
    val idW = Window.partitionBy(col(idCol)).orderBy(col("fp"))
    val fpW = Window.partitionBy(col("fp")).orderBy(col(idCol))
    val inBatch = batch
      .withColumn("fp", TextFns.fingerprint(col(textCol)))
      // duplicate ids would cross-multiply every id-keyed join below
      // and corrupt the corpus — keep one deterministic row per id
      .withColumn("__rn", row_number().over(idW))
      .where(col("__rn") === 1)
      .withColumn("__rn", row_number().over(fpW))
      .where(col("__rn") === 1).drop("__rn")
    val exact = corpus
      .map(c => Curation.bloomAntiJoin(inBatch, c.select(col("fp")), "fp"))
      .getOrElse(inBatch)
      // also guard on the ID: a re-used id with NEW text must not
      // create a second corpus row for that id
      .transform(df => corpus
        .map(c => df.join(c.select(col(idCol)), Seq(idCol), "left_anti"))
        .getOrElse(df))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ---- 2. quality cascade with attrition accounting. The
      // attrition collect is the load's first action over the batch:
      // it materializes the exact-dedup cache, and — because the
      // cascade emits exactly one row per input row — its sum IS the
      // post-exact count, so n1 no longer pays a dedicated counting
      // job (one fewer action per load; ledger values unchanged)
      val audit = Curation.filterCascade(exact, textCol, idCol)
      val attrition = audit.groupBy(col("first_fail")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n1 = attrition.values.sum
      val passed = exact.join(
        audit.where(col("pass") === 1).select(col(idCol)),
        Seq(idCol), "left_semi")
      val n2 = n1 - attrition.filter(_._1 != "pass").values.sum

      // ---- 3. PII redaction (before anything persists) — a pure
      //         projection, applied in place (no self-join on the id)
      val clean0 = passed.withColumn(textCol,
        Curation.redactText(col(textCol)))
      // PERSISTED on the near-dup path (r18): its references there
      // re-derive this frame up to FOUR times otherwise — the
      // signature build, the batch-id set, and the survivor anti-join
      // each replay the quality cascade's regex battery plus the
      // redaction regexes over the persisted exact frame (column
      // pruning drops the redaction but never the cascade's pass
      // filter). Batch-sized; released once `kept` is materialized.
      // The near-dup-disabled path has a single consumer — no cache.
      val clean =
        if (nearDupThreshold > 1.0) clean0
        else clean0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // ---- 4. near-dup vs the corpus sig column + within the batch.
      //         A threshold above 1.0 is PROVABLY the identity (a
      //         Jaccard estimate cannot exceed 1), so skip the
      //         signature-band-join machinery outright — callers use
      //         that setting to run the funnel with near-dup disabled.
      //         The batch signature table is persisted only within
      //         this stage (the LSH plan references it three times);
      //         the COMMIT recomputes signatures as a pure projection
      //         instead — cheaper than any join against this table.
      val deduped =
        if (nearDupThreshold > 1.0) clean
        else {
          val sigs = Dedup.minhashSignatures(clean, textCol, idCol)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val pairs = (corpus match {
            case Some(c) =>
              Dedup.minhashPairsDeltaFromSigs(sigs,
                c.select(col(idCol), col("sig")),
                idCol, threshold = nearDupThreshold)
            case None =>
              Dedup.minhashPairsFromSigs(sigs, idCol,
                threshold = nearDupThreshold)
          }).localCheckpoint(true)
          // pairs are materialized — the signature cache has served
          // its three references and can go now
          sigs.unpersist(blocking = false)
          val newIds = clean.select(col(idCol)).distinct()
          val dropNew = pairs
            .select(col("doc_a").as("__x"), col("doc_b").as("__d"))
            .union(pairs.select(col("doc_b").as("__x"), col("doc_a").as("__d")))
            .join(newIds.select(col(idCol).as("__d")), Seq("__d"), "left_semi")
            .join(newIds.select(col(idCol).as("__x"))
              .withColumn("__xnew", lit(1)), Seq("__x"), "left")
            // partner outside the batch = corpus doc → always drop;
            // partner inside the batch → keep the smaller id
            .where(col("__xnew").isNull || col("__x") < col("__d"))
            .select(col("__d").as(idCol)).distinct()
          clean.join(dropNew, Seq(idCol), "left_anti")
        }
      val kept = deduped
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n3 = kept.count()
      // kept is materialized — every reader of the redacted frame has
      // run (sigs/newIds/anti-join); release it before the commit scan
      if (nearDupThreshold <= 1.0) clean.unpersist(blocking = false)

      // ---- 5. the ONE commit: survivors + fingerprint + signature.
      //         The signature rides as a PURE PROJECTION over the
      //         persisted survivors — the join-against-a-signature-
      //         table formulation re-derived the whole upstream chain
      //         (windows, anti-joins, cascade, redaction) on the
      //         signature side and paid a shuffle on both, measured at
      //         more CPU than every other stage of the load combined.
      //         Same values (same text, same kernel); the isNotNull
      //         filter replicates the old inner join's drop of
      //         null-text rows.
      val version =
        if (n3 == 0 && versions0.nonEmpty) versions0.last
        else {
          // filter on the TEXT, not the sig: predicate pushdown would
          // otherwise re-evaluate the whole signature kernel as the
          // filter (sig is null exactly when text is — same rows)
          val withSig = kept
            .where(col(textCol).isNotNull)
            .withColumn("sig", Dedup.minhashSigCol(col(textCol)))
          LakeWriter.commitSnapshot(withSig, corpusTable,
            mode = if (versions0.isEmpty) "overwrite" else "append")
        }
      // metadata-only: the manifest carries per-file row counts, so
      // the ledger's corpus_rows never re-scans the (ever-growing)
      // corpus — at 100 TB a per-batch data-scan count would soon
      // dominate the whole micro-batch
      val corpusRows = LakeWriter.snapshotRowCount(spark, corpusTable)
      kept.unpersist(blocking = false)
      val result = Result(n0, n1, n2, n3, version, corpusRows, attrition)
      appendLedger(spark, s"$outDir/ledger", result)
      result
    } finally exact.unpersist(blocking = false)
  }

  /** RUN LEDGER — the load's observability surface: one row per run()
    * invocation (batch ordinal = ledger version), recording the
    * attrition funnel and the corpus version the run left behind.
    * Committed AFTER the corpus commit and deliberately advisory: a
    * crash between the two loses a ledger row, never corpus
    * correctness, and a replayed batch honestly appends a second row
    * (same corpus_version, zero survivors) — the ledger records
    * ATTEMPTS, which is what an operator debugging a load wants. The
    * attrition map rides as a key-sorted JSON string so rows are
    * deterministic and queryable with get_json_object. */
  private def appendLedger(spark: SparkSession, table: String,
                           r: Result): Unit = {
    val attritionJson = r.attrition.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    import spark.implicits._
    val row = Seq((r.corpusVersion, r.batchRows, r.afterExact,
      r.afterQuality, r.afterNearDup, r.corpusRows, attritionJson))
      .toDF("corpus_version", "batch_rows", "after_exact",
        "after_quality", "after_near_dup", "corpus_rows", "attrition")
    LakeWriter.commitSnapshot(row, table,
      mode = if (LakeWriter.snapshotVersions(spark, table).isEmpty)
        "overwrite" else "append"): Unit
  }

  /** The run ledger as a frame (empty-safe for a never-run pipeline). */
  def ledger(spark: SparkSession, outDir: String): DataFrame = {
    val table = s"$outDir/ledger"
    if (LakeWriter.snapshotVersions(spark, table).isEmpty)
      spark.emptyDataFrame
    else LakeWriter.readSnapshot(spark, table)
  }

  /** Corpus MAINTENANCE — the periodic job every append-committed
    * table needs: compact the current snapshot (daily loads leave one
    * small file-set per batch; reads degrade with file count) and
    * vacuum history down to `keepVersions` (the append design carries
    * every prior version's files as live data, so old versions are
    * the dominant storage cost). Returns the compacted version.
    * Run OUT-OF-BAND of loads: vacuum keeps in-flight commit dirs
    * (version > newest kept manifest) but a concurrent load whose
    * version gets vacuumed right after committing would lose
    * history it expected to keep. */
  def maintain(spark: SparkSession, outDir: String, nFiles: Int = 32,
               keepVersions: Int = 3, mirrorDelta: Boolean = false,
               checkpointEvery: Int = 10,
               logRetainVersions: Int = 0,
               mirrorIceberg: Boolean = false,
               icebergRetainSnapshots: Int = 0,
               deltaChangeDataFeed: Boolean = false): Long = {
    val corpusTable = s"$outDir/corpus"
    val v = LakeWriter.compactSnapshot(spark, corpusTable, nFiles)
    // open-format interop rides maintenance (the reference lands every
    // load in Iceberg for exactly this): mirror every corpus version
    // committed since the last call into the table's _delta_log —
    // metadata-only, so external engines track the corpus live with
    // no export step. Mirror BEFORE vacuuming: the mirrored CURRENT
    // snapshot then already points at the compacted files when the
    // old ones are reclaimed (a crash between the two calls leaves a
    // resolvable table either way; only reclaimed HISTORY stops being
    // time-travelable, like Delta's own vacuum). The checkpoint
    // cadence keeps a foreign reader's replay O(checkpointEvery)
    // however many loads the corpus has absorbed — months of daily
    // loads otherwise mean hundreds of JSON commits per open.
    if (mirrorDelta) {
      graft.sources.DeltaMirror.mirror(spark, corpusTable,
        checkpointEvery = checkpointEvery,
        changeDataFeed = deltaChangeDataFeed): Unit
      // log retention rides maintenance too: JSON commits the newest
      // covering checkpoint supersedes AND the retention window has
      // outgrown are deleted (non-strict — a call landing between
      // checkpoints is a routine no-op)
      if (logRetainVersions > 0)
        graft.sources.DeltaMirror.cleanupLog(spark, corpusTable,
          logRetainVersions, strict = false): Unit
    }
    // the Iceberg twin (the reference's ACTUAL lake format): one
    // snapshot per corpus version, expired down to the retention
    // window so the metadata tree stays bounded alongside vacuum
    if (mirrorIceberg) {
      graft.sources.IcebergMirror.mirror(spark, corpusTable): Unit
      if (icebergRetainSnapshots > 0)
        graft.sources.IcebergMirror.expireSnapshots(spark, corpusTable,
          icebergRetainSnapshots): Unit
    }
    LakeWriter.vacuumSnapshots(spark, corpusTable, keepLast = keepVersions)
    v
  }

  /** The SPEED-LAYER twin: run the identical curation stages on every
    * micro-batch of a document stream (foreachBatch), committing a
    * corpus snapshot version per batch that lands survivors. Replay
    * safety comes from [[run]]'s single commit point: a re-delivered
    * batch that had committed is fully absorbed by the corpus
    * fingerprints; one that had NOT commits exactly once now. */
  def runStream(stream: DataFrame, outDir: String, checkpoint: String,
                textCol: String = "text", idCol: String = "doc_id",
                nearDupThreshold: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          run(batch.sparkSession, batch.toDF(), outDir, textCol, idCol,
            nearDupThreshold): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
