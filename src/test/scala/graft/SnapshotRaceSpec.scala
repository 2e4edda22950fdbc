package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeWriter

/** Concurrent-writer behavior of the snapshot layer — the contention
  * semantics Delta/Iceberg give via optimistic concurrency, asserted
  * on the homegrown manifest layer: a lost race surfaces as a CLEAN
  * CONFLICT (never a torn table), the loser's data is an inert
  * orphan, and a retry commits the next version with nothing lost.
  */
class SnapshotRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a lost manifest race is a conflict, not corruption") {
    val t = java.nio.file.Files.createTempDirectory("graft_race_")
      .toString + "/tbl"
    LakeWriter.commitSnapshot(
      (1 to 5).map(i => (i.toLong, s"base$i")).toDF("k", "v"), t)
    // adversary: the moment the victim's v2 data directory appears
    // (data always lands BEFORE the manifest rename), commit a
    // competing v2 manifest — exactly what losing a race to a
    // concurrent writer looks like on disk
    val mdir = java.nio.file.Paths.get(s"$t/_manifests")
    val dataRoot = java.nio.file.Paths.get(s"$t/data")
    val adversary = new Thread(() => {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var armed = false
      while (!armed && System.nanoTime() < deadline) {
        val seen = java.nio.file.Files.list(dataRoot).iterator()
        while (!armed && seen.hasNext) {
          if (seen.next().getFileName.toString.startsWith("v2-")) {
            java.nio.file.Files.copy(mdir.resolve("v1.json"),
              mdir.resolve("v2.json")): Unit
            armed = true
          }
        }
        if (!armed) Thread.sleep(1)
      }
    })
    adversary.start()
    val e = intercept[IllegalStateException] {
      LakeWriter.commitSnapshot(
        Seq((6L, "late")).toDF("k", "v"), t, "append")
    }
    adversary.join()
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // the winner's table is intact; the loser changed NOTHING visible
    assert(LakeWriter.readSnapshot(spark, t).count() == 5)
    // retry from current state commits cleanly and loses no rows
    val v3 = LakeWriter.commitSnapshot(
      Seq((6L, "late")).toDF("k", "v"), t, "append")
    assert(v3 == 3L)
    assert(LakeWriter.readSnapshot(spark, t)
      .select($"k").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 6L))
    // vacuum collects the loser's orphaned attempt directory
    LakeWriter.vacuumSnapshots(spark, t, keepLast = 1)
    val live = LakeWriter.snapshotFiles(spark, t, 3L)
      .map(_.stripPrefix("file:"))
    assert(live.forall(f => java.nio.file.Files.exists(
      java.nio.file.Paths.get(f))), "vacuum deleted live data")
    assert(LakeWriter.readSnapshot(spark, t).count() == 6)
  }

  test("two writers with retry-on-conflict lose no appends") {
    val t = java.nio.file.Files.createTempDirectory("graft_race2_")
      .toString + "/tbl"
    LakeWriter.commitSnapshot(Seq((0L, "base")).toDF("k", "v"), t)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def writer(base: Long): Thread = new Thread(() => {
      try {
        barrier.await()
        (0 until 4).foreach { i =>
          var done = false
          while (!done) {
            try {
              LakeWriter.commitSnapshot(
                Seq((base + i, s"w$base-$i")).toDF("k", "v"), t, "append")
              done = true
            } catch {
              case _: IllegalStateException => conflicts.incrementAndGet()
            }
          }
        }
      } catch { case th: Throwable => failures.add(th) }
    })
    val ws = Seq(writer(100L), writer(200L))
    ws.foreach(_.start()); ws.foreach(_.join())
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    // every append from both writers landed exactly once
    val ks = LakeWriter.readSnapshot(spark, t)
      .select($"k").collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == (Seq(0L) ++ (0 until 4).map(100L + _) ++
      (0 until 4).map(200L + _)).sorted, s"rows lost/duplicated: $ks")
    // versions are contiguous — one per successful commit
    assert(LakeWriter.snapshotVersions(spark, t) == (1L to 9L))
  }
}
