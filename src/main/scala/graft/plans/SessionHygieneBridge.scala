package org.apache.spark

import org.apache.spark.storage.BroadcastBlockId

/** Bridge to the block-manager internals a multi-query session driver
  * needs for BETWEEN-queries storage hygiene (lives in spark's package
  * to reach `SparkEnv`/`BlockManagerMaster`, both private[spark]).
  *
  * Why it exists: broadcast blocks are NOT in `getPersistentRDDs` —
  * each broadcast-join relation's blocks are freed only when the
  * `Broadcast` handle is GC'd and ContextCleaner drains its reference
  * queue. A session running hundreds of queries accumulates every
  * query's broadcast relations between periodic GCs (the r11 driver
  * gate carried 175 queries' worth; heap floor spiked to 17 GB and a
  * 35 s full GC landed inside a later query's timed window). This
  * releases them eagerly, outside any timed window. */
object GraftSessionHygiene {

  /** Remove every materialized broadcast's blocks from the block
    * manager (driver + executors), blocking. Safe ONLY at a session
    * quiescent point where no in-flight or future job will re-read a
    * previously created broadcast (e.g. between independent queries
    * in a bench/ETL driver): a task that re-reads a removed broadcast
    * whose soft-cached value was also collected fails. Returns the
    * number of broadcasts released. */
  def releaseBroadcasts(sc: SparkContext): Int =
    try {
      val master = sc.env.blockManager.master
      val bids = master
        .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
          askStorageEndpoints = true)
        .collect { case BroadcastBlockId(id, _) => id }.distinct
      bids.foreach { id =>
        try master.removeBroadcast(id, removeFromMaster = true,
          blocking = true)
        catch { case _: Throwable => }
      }
      bids.size
    } catch { case _: Throwable => 0 }
}
