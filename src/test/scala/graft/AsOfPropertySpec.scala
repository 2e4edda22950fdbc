package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.operators.AsOfJoin

/** Property-based check of the as-of join against a brute-force
  * reference: for random left/right event sets (with deliberate
  * timestamp collisions), every left row gets the right row with the
  * LARGEST rightTime <= leftTime of the same key — tie-broken by the
  * greatest tie-break column — and the tolerance variant discards
  * matches older than the bound. The union+window implementation and
  * the O(n²) reference share nothing, so agreement is meaningful.
  */
class AsOfPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(dayOff: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      f"2024-02-${dayOff / 4 + 1}%02d ${(dayOff % 4) * 6}%02d:00:00")

  private val gen: Gen[(List[(Long, Int)], List[(Long, Int, Long)])] = for {
    nl <- Gen.choose(1, 30)
    nr <- Gen.choose(0, 30)
    // few keys + few distinct times => plenty of equal-timestamp ties
    left <- Gen.listOfN(nl, for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0, 12)
    } yield (k, t))
    right <- Gen.listOfN(nr, for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0, 12)
      id <- Gen.choose(1L, 1000L)
    } yield (k, t, id))
  } yield (left, right.distinctBy(_._3))

  test("AsOfJoin agrees with the brute-force reference on random data") {
    val prop = Prop.forAll(gen) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, ts(t))
      }.toDF("l_id", "key", "t")
      val right = rightRows.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("key", "rt", "r_id")

      val got = AsOfJoin(left, right, Seq("key"), "t", "rt",
          tieBreak = Seq("r_id"))
        .select($"l_id", $"r_id", $"matched_time")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      // brute force: per left row, max (rt, r_id) among rt <= t
      val rs = rightRows.map { case (k, t, id) => (k, ts(t), id) }
      val want = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter(r => r._1 == k && !r._2.after(ts(t)))
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap

      val sameRows = got.keySet == want.keySet
      val sameMatch = want.forall { case (id, m) => got.get(id).contains(m) }

      // tolerance: a 6-hour bound discards older matches, keeps rows
      val tol = AsOfJoin(left, right, Seq("key"), "t", "rt",
          toleranceMillis = 6L * 3600 * 1000, tieBreak = Seq("r_id"))
        .collect()
      val tolOk = tol.length == leftRows.length && tol.forall { r =>
        r.isNullAt(r.fieldIndex("matched_time")) || {
          val t = r.getTimestamp(r.fieldIndex("t")).getTime
          val mt = r.getTimestamp(r.fieldIndex("matched_time")).getTime
          t - mt <= 6L * 3600 * 1000
        }
      }

      sameRows && sameMatch && tolOk
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
