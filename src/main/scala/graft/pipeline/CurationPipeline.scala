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
  *  1. EXACT dedup — one survivor per normalized-text fingerprint
  *     within the batch, then a Bloom-prefiltered exact anti-join
  *     against the fingerprint HISTORY of everything ever landed
  *     (content is "seen" once it arrives, even if a later gate
  *     rejects it — so re-landing yesterday's batch is a no-op).
  *  2. QUALITY gate — `Curation.filterCascade`, keeping `pass` docs
  *     and recording per-rule attrition (the report every new filter
  *     is judged by).
  *  3. PII redaction — the kept docs' text is replaced by the
  *     redacted form before anything is persisted.
  *  4. NEAR-DUP vs the corpus — incremental MinHash: only the batch's
  *     text is scanned; the existing corpus participates through its
  *     persisted signature snapshot (`minhashPairsDelta`). A new doc
  *     drops if it near-matches any existing doc, or an earlier
  *     (smaller-id) doc of the same batch.
  *  5. COMMIT — surviving docs append-commit to the corpus snapshot
  *     (time-travelable), their signatures upsert into the signature
  *     snapshot, and the run reports stage-by-stage counts.
  *
  * Scale shape: every cross-batch structure (fingerprint history,
  * signature table, corpus) is lake-resident and grows by delta-sized
  * appends; no stage ever re-scans the historical corpus text.
  */
object CurationPipeline {

  case class Result(batchRows: Long, afterExact: Long, afterQuality: Long,
                    afterNearDup: Long, corpusVersion: Long,
                    corpusRows: Long, attrition: Map[String, Long])

  def run(spark: SparkSession, batch: DataFrame, outDir: String,
          textCol: String = "text", idCol: String = "doc_id",
          nearDupThreshold: Double = 0.5): Result = {
    val corpusTable = s"$outDir/corpus"
    val sigTable = s"$outDir/minhash_sigs"
    val fpDir = s"$outDir/fingerprints"
    val n0 = batch.count()

    // ---- 1. exact dedup: in-batch, then vs the fingerprint history
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val inBatch = batch
      .withColumn("__fp", TextFns.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val fpPath = new org.apache.hadoop.fs.Path(fpDir)
    val fs = fpPath.getFileSystem(spark.sessionState.newHadoopConf())
    val exact = (if (fs.exists(fpPath))
        Curation.bloomAntiJoin(inBatch, spark.read.parquet(fpDir), "__fp")
      else inBatch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n1 = exact.count()
      if (n1 > 0)
        exact.select(col("__fp")).write.mode("append").parquet(fpDir)

      // ---- 2. quality cascade with attrition accounting
      val audit = Curation.filterCascade(exact, textCol, idCol)
      val attrition = audit.groupBy(col("first_fail")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val passed = exact.join(
        audit.where(col("pass") === 1).select(col(idCol)),
        Seq(idCol), "left_semi")
      val n2 = n1 - attrition.filter(_._1 != "pass").values.sum

      // ---- 3. PII redaction (before anything persists)
      val clean = passed.drop(textCol)
        .join(Curation.piiRedact(passed, textCol, idCol)
          .select(col(idCol), col("redacted").as(textCol)), Seq(idCol))

      // ---- 4. near-dup vs corpus signatures + within the batch
      val haveSigs = LakeWriter.snapshotVersions(spark, sigTable).nonEmpty
      val pairs =
        if (haveSigs)
          Dedup.minhashPairsDelta(clean, textCol, idCol,
            LakeWriter.readSnapshot(spark, sigTable),
            threshold = nearDupThreshold)
        else Dedup.minhashPairs(clean, textCol, idCol,
          threshold = nearDupThreshold)
      val newIds = clean.select(col(idCol)).distinct()
      val dropNew = pairs
        .select(col("doc_a").as("__x"), col("doc_b").as("__d"))
        .union(pairs.select(col("doc_b").as("__x"), col("doc_a").as("__d")))
        .join(newIds.select(col(idCol).as("__d")), Seq("__d"), "left_semi")
        .join(newIds.select(col(idCol).as("__x"))
          .withColumn("__xnew", lit(1)), Seq("__x"), "left")
        // partner outside the batch = existing corpus doc → always
        // drop; partner inside the batch → keep the smaller id
        .where(col("__xnew").isNull || col("__x") < col("__d"))
        .select(col("__d").as(idCol)).distinct()
      val kept = clean.join(dropNew, Seq(idCol), "left_anti").drop("__fp")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n3 = kept.count()

      // ---- 5. commit: corpus append + signature upsert
      val versions = LakeWriter.snapshotVersions(spark, corpusTable)
      val version =
        if (n3 == 0 && versions.nonEmpty) versions.last
        else {
          Dedup.upsertSignatureSnapshot(kept, textCol, idCol, sigTable)
          LakeWriter.commitSnapshot(kept, corpusTable,
            mode = if (versions.isEmpty) "overwrite" else "append")
        }
      val corpusRows = LakeWriter.readSnapshot(spark, corpusTable).count()
      kept.unpersist(blocking = false)
      Result(n0, n1, n2, n3, version, corpusRows, attrition)
    } finally exact.unpersist(blocking = false)
  }

  /** The SPEED-LAYER twin: run the identical curation stages on every
    * micro-batch of a document stream (foreachBatch), committing a
    * corpus snapshot version per batch that lands survivors. The
    * lambda guarantee comes free from [[run]]'s design: a replayed
    * batch (foreachBatch re-delivery on recovery) is absorbed by the
    * fingerprint history and commits nothing. */
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
