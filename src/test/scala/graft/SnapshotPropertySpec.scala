package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.sources.LakeWriter

/** Property-based check of the snapshot change feed: for RANDOM
  * commit sequences (append / merge / delete), replaying
  * `changesBetween(v, v')` on top of version v's state reconstructs
  * version v' exactly — step by step AND across the whole history in
  * one jump. The feed is derived from manifest file sets and
  * exceptAll collapse; the reference is the committed states
  * themselves, so agreement proves the feed loses nothing and
  * invents nothing, whatever the file layout and rewrite noise.
  */
class SnapshotPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Merge(rows: List[(Long, String)]) extends Op
  private case class Delete(lo: Long, hi: Long, v: String) extends Op

  private val genRows: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 20L)
      v <- Gen.oneOf("a", "b", "c")
    } yield (k, v))
  } yield rows

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> genRows.map(Append),
    // merge wants one row per key (the MERGE INTO contract)
    4 -> genRows.map(r => Merge(r.distinctBy(_._1))),
    3 -> (for {
      lo <- Gen.choose(0L, 20L); span <- Gen.choose(0L, 8L)
      v <- Gen.oneOf("a", "b", "c")
    } yield Delete(lo, lo + span, v)))

  private val genSeq: Gen[(List[(Long, String)], List[Op])] = for {
    base <- genRows
    n <- Gen.choose(1, 4)
    ops <- Gen.listOfN(n, genOp)
  } yield (base, ops)

  /** Multiset state as sorted (k, v) pairs, NULL-safe. */
  private def state(df: DataFrame): List[(Long, String)] =
    df.select($"k", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toList.sorted

  /** Apply a collapsed change feed to a prior state (multiset). */
  private def replay(prev: List[(Long, String)],
                     feed: DataFrame): List[(Long, String)] = {
    val ins = feed.where($"_change_type" === "insert")
    val del = feed.where($"_change_type" === "delete")
    var next = prev.to(collection.mutable.ListBuffer)
    state(del).foreach { r =>
      val i = next.indexOf(r)
      assert(i >= 0, s"feed deletes a row the prior state lacks: $r")
      next.remove(i)
    }
    (next ++ state(ins)).toList.sorted
  }

  test("changesBetween replays any commit history exactly") {
    val prop = Prop.forAll(genSeq) { case (base, ops) =>
      val t = java.nio.file.Files.createTempDirectory("graft_snapprop")
        .toString + "/tbl"
      LakeWriter.commitSnapshot(base.toDF("k", "v"), t)
      ops.foreach {
        case Append(rows) =>
          LakeWriter.commitSnapshot(rows.toDF("k", "v"), t, "append")
        case Merge(rows) =>
          LakeWriter.mergeSnapshot(rows.toDF("k", "v"), t, Seq("k"))
        case Delete(lo, hi, v) =>
          // may be a no-op (no matching rows): then NO version commits,
          // which the version walk below absorbs naturally
          LakeWriter.deleteFromSnapshot(spark, t,
            $"k".between(lo, hi) && $"v" === v)
      }
      val versions = LakeWriter.snapshotVersions(spark, t)
      val states = versions.map(v =>
        state(LakeWriter.readSnapshot(spark, t, Some(v))))
      // step-by-step: each consecutive feed replays to the next state
      val stepwise = versions.sliding(2).zipWithIndex.forall {
        case (Seq(a, b), i) =>
          replay(states(i),
            LakeWriter.changesBetween(spark, t, a, b)) == states(i + 1)
        case _ => true
      }
      // one jump across the whole history
      val wholesale = versions.size < 2 ||
        replay(states.head,
          LakeWriter.changesBetween(spark, t, versions.head,
            versions.last)) == states.last
      stepwise && wholesale
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
