package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Pins the bounded-storage contract of the iterative operators: a
  * long multi-round run must NOT leave one pinned localCheckpoint
  * block set per round in the block manager (the r10 session-heap
  * defect — storage pinned across a long session starves execution
  * memory and taxes every later query). The contract: round N-1's
  * blocks release when round N materializes, so at most a small
  * constant number of persisted RDDs survive any call. */
class IterativeMemorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persistedCount(): Int =
    spark.sparkContext.getPersistentRDDs.count { case (_, r) =>
      r.getStorageLevel.useMemory || r.getStorageLevel.useDisk }

  test("20+-round connectedComponents leaves O(1) persisted RDDs, not O(rounds)") {
    // a CHAIN graph is the diameter worst case: min-label propagation
    // moves the 0-label one hop per round, so 1-2-3-...-26 needs ~25
    // rounds — exactly the shape that used to pin 25 block sets
    val before = persistedCount()
    val edges = (1L until 26L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = Graph.connectedComponents(edges, "a", "b", maxIter = 40)
    assert(comps.where($"comp" === 1L).count() === 26L)
    val after = persistedCount()
    // only the FINAL labels' checkpoint (= the result) may survive,
    // plus nothing else from the ~25 intermediate rounds
    assert(after - before <= 2,
      s"connectedComponents pinned ${after - before} RDDs — rounds are leaking checkpoints")
    org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(comps)
  }

  test("pageRank releases every intermediate — only the result stays persisted") {
    val before = persistedCount()
    // star + chain mix, 8 iterations (default is 3 — more rounds =
    // more chances to leak)
    val edges = ((1L until 20L).map(i => (i, i + 1)) ++
      (2L until 20L).map(i => (i, 1L))).toDF("s", "d")
    val pr = Graph.pageRank(edges, "s", "d", iters = 8)
    assert(pr.count() > 0)
    val after = persistedCount()
    assert(after - before <= 1,
      s"pageRank pinned ${after - before} RDDs — intermediates are leaking")
    org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(pr)
  }

  test("bpeTrain pins no vocab checkpoints after returning") {
    val before = persistedCount()
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the bat sat on the hat"),
      (3L, "cats and bats and mats")).toDF("doc_id", "text")
    val merges = graft.operators.Tokenize.bpeTrain(docs, "text", 12)
    assert(merges.count() > 0)
    val after = persistedCount()
    assert(after - before <= 0,
      s"bpeTrain left ${after - before} persisted RDDs behind")
  }
}
