package org.apache.spark.sql

/** Bridge to release the storage blocks behind a localCheckpoint'd
  * Dataset (the plan is a private[sql] `execution.LogicalRDD` wrapping
  * the persisted RDD — this lives in spark's package to reach it).
  *
  * Why it exists: `localCheckpoint()` pins its blocks until the RDD is
  * GC'd via ContextCleaner, so an ITERATIVE operator that checkpoints
  * every round (connected components, PageRank) accumulates one
  * node-sized block set per round for the lifetime of the session.
  * On a long-lived 100 TB session the pinned storage eventually
  * starves execution memory (the r10 bench showed a 16→66 GB heap
  * floor ramp taxing every query behind it 2-22×). Iterative
  * operators call this on round N-1's frame as soon as round N has
  * materialized — bounded state: at most two rounds' blocks live at
  * any instant. */
object GraftCheckpointBridge {

  /** Unpersist the checkpoint RDD(s) directly backing `df`'s plan.
    * No-op for plans that are not checkpoint/cache-backed. Safe ONLY
    * when no live DataFrame still needs `df`'s data — a
    * localCheckpoint has no lineage to recompute from. */
  def unpersistCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    try {
      df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
        case l: execution.LogicalRDD => l.rdd.unpersist(blocking)
        case _ =>
      }
    } catch { case _: Throwable => }

  /** Release EVERY persisted RDD of the session (cached DataFrames,
    * localCheckpoints, persisted RDDs) plus the SQL cache registry —
    * the between-queries hygiene a benchmark / multi-query session
    * driver runs outside any timed window. Blocking, so the freed
    * blocks are really gone before the next query starts. */
  def releaseAllPersisted(spark: SparkSession): Unit = {
    try spark.catalog.clearCache() catch { case _: Throwable => }
    try spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    catch { case _: Throwable => }
  }

  /** Unload every loaded streaming state-store provider. A finished
    * (even stopped) streaming query's providers stay in
    * `StateStore.loadedProviders` holding their state maps on heap
    * until the executor unloads them on a maintenance cycle — a
    * session that runs many short streaming queries accumulates every
    * query's state between cycles (the r11 driver gate's three worst
    * wall outliers were all stateful streams). Safe at any quiescent
    * point: the next streaming batch reloads its provider from the
    * checkpoint as if freshly scheduled. */
  def unloadStreamingState(): Unit =
    try execution.streaming.state.StateStore.unloadAll()
    catch { case _: Throwable => }
}
