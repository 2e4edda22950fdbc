package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaMirror, LakeWriter}

/** Property-style fidelity: RANDOM op sequences (append / COW delete /
  * full overwrite / schema widen), mirrored INCREMENTALLY under random
  * checkpoint cadences, must resolve to readSnapshot at EVERY version
  * — and keep resolving after the checkpoint-covered JSON commits are
  * retention-cleaned. Seeded, so failures replay exactly. */
class DeltaMirrorPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def docs(lo: Int, hi: Int) =
    spark.range(lo.toLong, hi.toLong).toDF("id")
      .withColumn("lang",
        when(pmod($"id", lit(3)) === 0, "en")
          .when(pmod($"id", lit(3)) === 1, "de").otherwise("fr"))
      .withColumn("v", $"id" * 10)

  test("random op sequences resolve at every version under random cadences") {
    for (seed <- Seq(7, 23, 61)) {
      val rnd = new scala.util.Random(seed)
      val partitioned = rnd.nextBoolean()
      val t = freshDir(s"graft_dmprop_$seed") + "/t"
      def commit(df: org.apache.spark.sql.DataFrame,
                 mode: String = "overwrite"): Unit =
        if (partitioned)
          LakeWriter.commitSnapshotDynamic(df, t, Seq("lang")): Unit
        else LakeWriter.commitSnapshot(df, t, mode): Unit
      var next = 40
      var widened = false
      def slice(lo: Int, hi: Int) = {
        val base = docs(lo, hi)
        if (widened) base.withColumn("extra", $"id" + 1) else base
      }
      commit(slice(0, next))
      val nOps = 8 + rnd.nextInt(4)
      (1 to nOps).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => // append a fresh slice (dynamic tables: overwrite
            // only the partitions the slice touches — still a diff)
            val lo = next; next += 10 + rnd.nextInt(20)
            if (partitioned) commit(slice(lo, next))
            else commit(slice(lo, next), "append")
          case 1 => // copy-on-write delete (sometimes matching nothing)
            LakeWriter.deleteFromSnapshot(spark, t,
              $"id" % (2 + rnd.nextInt(5)) === 0 &&
                $"id" >= rnd.nextInt(next)): Unit
          case 2 => // full overwrite with shifted values
            commit(slice(0, 20 + rnd.nextInt(next)))
          case 3 => // widen once (metaData must re-emit exactly then);
            // unpartitioned only — the dynamic path owns its spec
            if (!widened && !partitioned) {
              widened = true
              val lo = next; next += 5
              commit(slice(lo, next), "append")
            } else LakeWriter.deleteFromSnapshot(spark, t,
              $"id" === rnd.nextInt(next).toLong): Unit
        }
        // incremental mirror at random points with a random cadence
        if (rnd.nextBoolean())
          DeltaMirror.mirror(spark, t,
            checkpointEvery = rnd.nextInt(4)): Unit
      }
      DeltaMirror.mirror(spark, t): Unit
      val gvs = LakeWriter.snapshotVersions(spark, t)
      val dvs = DeltaMirror.deltaVersions(spark, t)
      // every graft version mirrored exactly once, in order
      assert(dvs == gvs.indices.map(_.toLong),
        s"seed $seed: graft $gvs vs delta $dvs")
      gvs.zipWithIndex.foreach { case (gv, dv) =>
        val viaDelta = DeltaMirror.readDelta(spark, t, Some(dv.toLong))
        val viaGraft = LakeWriter.readSnapshot(spark, t, Some(gv))
        assert(viaDelta.schema.fieldNames.toSeq ==
          viaGraft.schema.fieldNames.toSeq,
          s"seed $seed: schema order at graft v$gv / delta v$dv")
        assert(rows(viaDelta) == rows(viaGraft),
          s"seed $seed: rows at graft v$gv / delta v$dv " +
            s"(partitioned=$partitioned)")
      }
      // force a checkpoint at the tip, retention-clean every covered
      // JSON commit, and the tip must still resolve identically
      val cpv = DeltaMirror.checkpoint(spark, t)
      new java.io.File(s"$t/_delta_log").listFiles()
        .filter { f =>
          f.getName.matches("\\d{20}\\.json") &&
            f.getName.stripSuffix(".json").toLong <= cpv
        }.foreach(f => assert(f.delete()))
      assert(rows(DeltaMirror.readDelta(spark, t)) ==
        rows(LakeWriter.readSnapshot(spark, t)),
        s"seed $seed: post-retention resolution")
      // and resume keeps working after the cleanup (a guaranteed-new
      // slice — a delete might match nothing and commit no version)
      val lo = next; next += 3
      if (partitioned) commit(slice(lo, next))
      else commit(slice(lo, next), "append")
      assert(DeltaMirror.mirror(spark, t) == 1L, s"seed $seed: resume")
      assert(rows(DeltaMirror.readDelta(spark, t)) ==
        rows(LakeWriter.readSnapshot(spark, t)),
        s"seed $seed: post-resume resolution")
    }
  }
}
