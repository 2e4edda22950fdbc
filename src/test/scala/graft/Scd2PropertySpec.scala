package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.operators.{PitJoin, Scd2}

/** Property-based invariants of the SCD2 builder over random change
  * feeds: versions tile each entity's timeline (ordered, half-open,
  * gap-free from the first change), exactly one version is current,
  * and every feed row PIT-joins to exactly one version carrying the
  * row's own attribute value.
  */
class Scd2PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val feedGen: Gen[List[(Long, Int, String)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      entity <- Gen.choose(1L, 5L)
      dayOff <- Gen.choose(0, 40)
      state <- Gen.oneOf("A", "B", "C")
    } yield (entity, dayOff, state))
  } yield rows.distinctBy(r => (r._1, r._2)) // one row per (entity, ts)

  test("SCD2 invariants hold for random change feeds") {
    val prop = Prop.forAll(feedGen) { rows =>
      val feed = rows.map { case (e, d, st) =>
        (e, java.sql.Timestamp.valueOf(f"2024-01-${d / 2 + 1}%02d " +
          f"${(d % 2) * 12}%02d:00:00"), st)
      }.toDF("entity", "ts", "state")
      val dim = Scd2.build(feed, Seq("entity"), Seq("state"), "ts")
      val versions = dim.orderBy("entity", "effective_from").collect()

      val tiled = versions.groupBy(_.getAs[Long]("entity")).forall {
        case (_, vs) =>
          val sorted = vs.sortBy(_.getAs[java.sql.Timestamp]("effective_from").getTime)
          val contiguous = sorted.sliding(2).forall {
            case Array(a, b) =>
              a.getAs[java.sql.Timestamp]("effective_to") ==
                b.getAs[java.sql.Timestamp]("effective_from")
            case _ => true
          }
          val oneCurrent = sorted.count(_.getAs[Boolean]("is_current")) == 1
          val lastOpen = sorted.last.getAs[Boolean]("is_current")
          val noSelfNoise = sorted.sliding(2).forall {
            case Array(a, b) => // consecutive versions must differ
              a.getAs[String]("state") != b.getAs[String]("state")
            case _ => true
          }
          contiguous && oneCurrent && lastOpen && noSelfNoise
      }

      // every feed row resolves to exactly one version with its state
      val joined = PitJoin(
        feed.select($"entity", $"ts", $"state".as("feed_state")),
        dim, Seq("entity"), "ts")
      val resolved = joined.count() == feed.count() &&
        joined.where($"state" =!= $"feed_state" || $"state".isNull)
          .count() == 0

      tiled && resolved
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
