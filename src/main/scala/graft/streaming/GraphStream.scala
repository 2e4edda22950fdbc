package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.LakeWriter

/** STREAMING connected components — the dup-graph label table
  * maintained continuously as pair batches arrive (the speed-layer
  * twin of [[graft.operators.Graph.connectedComponentsIncremental]]).
  *
  * State is the (node, comp) label table, persisted as a versioned
  * lake snapshot. Every micro-batch folds its edges in by
  * CONTRACTION — the iterative CC work runs on the delta-sized
  * contracted graph only — and lands as a file-pruned MERGE of just
  * the CHANGED labels (nodes of merged components + brand-new nodes);
  * components the batch never touched keep their files by reference.
  * Per-batch cost at 100 TB: one delta-CC + one key-sliver merge
  * probe, never a corpus-sized rewrite.
  *
  * Replay safety falls out of the algebra, not bookkeeping: folding
  * an already-folded edge set is the IDENTITY (its endpoints already
  * share components), the changed-label diff is empty, and no new
  * version commits — a re-delivered micro-batch (foreachBatch
  * at-least-once) leaves the table byte-identical. After any prefix
  * of batches the table equals the full batch CC over every edge
  * delivered so far (StreamingSpec pins both properties).
  */
object GraphStream {

  /** Fold one edge batch into the label snapshot at `table`.
    * Returns the current version (unchanged when the batch adds
    * nothing). First batch bootstraps the table with a full CC. */
  def foldBatch(batch: DataFrame, table: String,
                src: String, dst: String, maxIter: Int = 20): Long = {
    val spark = batch.sparkSession
    val versions = LakeWriter.snapshotVersions(spark, table)
    if (versions.isEmpty) {
      val boot = Graph.connectedComponents(batch, src, dst, maxIter)
      val v = LakeWriter.commitSnapshot(boot, table)
      // same bounded-storage discipline as the fold path: the
      // bootstrap CC's checkpoint must not outlive the commit
      org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(boot)
      return v
    }
    val labels = LakeWriter.readSnapshot(spark, table)
    val updated =
      Graph.connectedComponentsIncremental(labels, batch, src, dst, maxIter)
    // only labels the fold actually moved (or created) merge back;
    // the join is node-keyed — label-sized, never edge-sized
    val changed = updated
      .join(labels.select(col("node"), col("comp").as("__old")),
        Seq("node"), "left")
      .where(col("__old").isNull || col("__old") =!= col("comp"))
      .select(col("node"), col("comp"))
    val v =
      if (changed.isEmpty) versions.last
      else LakeWriter.mergeSnapshot(changed, table, Seq("node"))
    // a long-lived stream folds forever — release this batch's fold
    // checkpoint now instead of waiting for a GC cycle (the bounded-
    // storage discipline of the iterative operators)
    org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(updated)
    v
  }

  /** Continuous maintenance: one label-snapshot fold per micro-batch
    * of an edge stream.
    *
    * `maintainEvery` > 0 wires the table-maintenance cadence INTO the
    * sink (a long-lived stream otherwise accrues one manifest + file
    * set per batch without bound): every `maintainEvery` committed
    * versions the label table compacts to `compactFiles` files and
    * vacuums history to `keepVersions` — manifest count and live
    * bytes stay bounded forever, labels byte-unchanged
    * (StreamMaintenanceSpec drives 30+ batches and pins both). */
  def run(stream: DataFrame, table: String, checkpoint: String,
          src: String, dst: String, maxIter: Int = 20,
          maintainEvery: Int = 0, compactFiles: Int = 32,
          keepVersions: Int = 3, mirrorDelta: Boolean = false,
          checkpointEvery: Int = 10, logRetainVersions: Int = 0,
          mirrorIceberg: Boolean = false,
          icebergRetainSnapshots: Int = 0,
          deltaChangeDataFeed: Boolean = false,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          foldBatch(batch.toDF(), table, src, dst, maxIter)
          // mirrorDelta keeps a live `_delta_log` (+ checkpoints) on
          // the label table — foreign engines read the stream's state
          // with no export step, bounded-replay forever
          LakeWriter.maintainSnapshotEvery(batch.sparkSession, table,
            maintainEvery, compactFiles, keepVersions, mirrorDelta,
            checkpointEvery, logRetainVersions, mirrorIceberg,
            icebergRetainSnapshots, deltaChangeDataFeed): Unit
      }
      .trigger(trigger)
      .start()
}
