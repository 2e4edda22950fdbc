package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, LakeWriter}

/** Cross-table atomic commits (the Nessie role): consistent AS OF
  * across tables, all-or-nothing validation, crash/race injection,
  * tag immutability. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def fixture(): (String, String, String) = {
    val root = freshDir("graft_catalog")
    val fact = s"$root/fact"
    val dim = s"$root/dim"
    val docs = spark.range(0, 60).toDF("id")
      .withColumn("lang",
        when(pmod($"id", lit(3)) === 0, "en")
          .when(pmod($"id", lit(3)) === 1, "de").otherwise("fr"))
      .withColumn("v", $"id" * 10)
    LakeWriter.commitSnapshot(docs, fact)
    LakeWriter.commitSnapshot(
      docs.groupBy("lang").agg(count(lit(1)).as("n")), dim)
    (s"$root/cat", fact, dim)
  }

  test("one commit pins fact+dim atomically; a tag time-travels BOTH " +
      "consistently after both tables advance") {
    val (cat, fact, dim) = fixture()
    val c1 = Catalog.commit(spark, cat,
      Map("fact" -> fact, "dim" -> dim))
    assert(c1 == 0L)
    Catalog.tag(spark, cat, "release", Some(c1))
    val wantFact = rows(LakeWriter.readSnapshot(spark, fact))
    val wantDim = rows(LakeWriter.readSnapshot(spark, dim))
    // both tables advance; the new state commits as c2
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 200)
    LakeWriter.commitSnapshot(
      LakeWriter.readSnapshot(spark, fact)
        .groupBy("lang").agg(count(lit(1)).as("n")), dim)
    val c2 = Catalog.commit(spark, cat,
      Map("fact" -> fact, "dim" -> dim))
    assert(c2 == 1L)
    // AS OF the tag: the OLD pair, consistent — neither table's
    // advance leaks through
    assert(rows(Catalog.readTableAtTag(spark, cat, "fact", "release"))
      == wantFact)
    assert(rows(Catalog.readTableAtTag(spark, cat, "dim", "release"))
      == wantDim)
    // the tip serves the new pair
    assert(rows(Catalog.readTableAt(spark, cat, "fact", c2)) ==
      rows(LakeWriter.readSnapshot(spark, fact)))
    assert(Catalog.commits(spark, cat) == Seq(0L, 1L))
  }

  test("all-or-nothing: one dangling pin refuses the WHOLE commit and " +
      "leaves the catalog untouched") {
    val (cat, fact, dim) = fixture()
    val e = intercept[IllegalArgumentException](
      Catalog.commit(spark, cat,
        Map("fact" -> fact, "dim" -> dim),
        at = Map("dim" -> 99L)))
    assert(e.getMessage.contains("refusing the whole commit"))
    assert(Catalog.commits(spark, cat).isEmpty)
    // an unknown table path refuses the same way
    val e2 = intercept[IllegalArgumentException](
      Catalog.commit(spark, cat,
        Map("fact" -> fact, "ghost" -> s"$fact-nope")))
    assert(e2.getMessage.contains("no snapshots"))
    assert(Catalog.commits(spark, cat).isEmpty)
  }

  test("catalog pins are vacuum retention roots: a tagged version " +
      "survives vacuum, unpinned interims reclaim, an unreadable " +
      "catalog refuses before deleting anything") {
    val (cat, fact, dim) = fixture()                         // fact v1
    val c0 = Catalog.commit(spark, cat, Map("fact" -> fact))
    Catalog.tag(spark, cat, "release", Some(c0))
    val wantV1 = rows(LakeWriter.readSnapshot(spark, fact, Some(1L)))
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 100)   // v2
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 200)   // v3
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 300)   // v4
    // a BRANCH pin protects v2 the same way the main commit does v1
    Catalog.branch(spark, cat, "dev", Some(c0))
    Catalog.commitOnBranch(spark, cat, "dev", Map("fact" -> fact),
      at = Map("fact" -> 2L))
    // an unreadable catalog refuses BEFORE any deletion
    val e = intercept[IllegalArgumentException](
      LakeWriter.vacuumSnapshots(spark, fact, keepLast = 1,
        catalogs = Seq(s"$cat-nope")))
    assert(e.getMessage.contains("retention roots"))
    assert(LakeWriter.snapshotVersions(spark, fact) ==
      Seq(1L, 2L, 3L, 4L))
    // vacuum keeping only the tip — but pins v1 (tag via main commit)
    // and v2 (branch) are roots; the unpinned interim v3 reclaims
    LakeWriter.vacuumSnapshots(spark, fact, keepLast = 1,
      catalogs = Seq(cat))
    assert(LakeWriter.snapshotVersions(spark, fact) == Seq(1L, 2L, 4L))
    // the tagged read STILL SERVES, data intact
    assert(rows(Catalog.readTableAtTag(spark, cat, "fact", "release"))
      == wantV1)
    assert(rows(Catalog.readTableAtBranch(spark, cat, "dev", "fact"))
      == rows(LakeWriter.readSnapshot(spark, fact, Some(2L))))
    // the reclaimed interim refuses as before
    intercept[Exception](
      LakeWriter.readSnapshot(spark, fact, Some(3L)).collect())
    // without roots the old semantics hold: everything below the
    // window goes (dim is unpinned by the catalog — path-scoped)
    LakeWriter.commitSnapshot(
      LakeWriter.readSnapshot(spark, dim), dim) // dim v2
    LakeWriter.vacuumSnapshots(spark, dim, keepLast = 1,
      catalogs = Seq(cat))
    assert(LakeWriter.snapshotVersions(spark, dim) == Seq(2L))
  }

  test("crash/race injection: a stray tmp is invisible, a destination " +
      "collision refuses loudly, re-pointing a name refuses") {
    val (cat, fact, dim) = fixture()
    Catalog.commit(spark, cat, Map("fact" -> fact, "dim" -> dim))
    // crash between tmp write and rename: the tmp must be invisible
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(cat, "commits"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cat, "commits", ".c000000000001.json.tmp"),
      "{}".getBytes("UTF-8"))
    assert(Catalog.commits(spark, cat) == Seq(0L))
    // a commit another writer already published is the new PARENT for
    // everyone who lists after it — the next commit serializes behind
    // it and the published file survives byte-identical (the rename
    // collision branch only fires in the list→publish window)
    val winner = """{"commit":1,"parent":0,"timestamp":1,"tables":{}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cat, "commits", "c000000000001.json"),
      winner.getBytes("UTF-8"))
    assert(Catalog.commit(spark, cat, Map("fact" -> fact)) == 2L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cat, "commits", "c000000000001.json")),
      "UTF-8") == winner)
    // two committers in the SAME list→publish window: exactly one
    // rename lands, the loser refuses loudly and corrupts nothing
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val outcomes = (0 until 2).map { _ =>
      new java.util.concurrent.FutureTask[Either[String, Long]](
        new java.util.concurrent.Callable[Either[String, Long]] {
          def call(): Either[String, Long] = {
            barrier.await()
            try Right(Catalog.commit(spark, cat, Map("fact" -> fact)))
            catch { case e: RuntimeException => Left(e.getMessage) }
          }
        })
    }
    outcomes.foreach(t => new Thread(t).start())
    val results = outcomes.map(_.get())
    val wins = results.collect { case Right(c) => c }
    val losses = results.collect { case Left(m) => m }
    // both may serialize cleanly (distinct ids) or one loses the race
    assert(wins.nonEmpty)
    assert(wins.toSet.size == wins.size,
      s"two committers claimed one commit id: $results")
    losses.foreach(m => assert(m.contains("publish race"), m))
    assert(Catalog.commits(spark, cat) ==
      (0L to Catalog.commits(spark, cat).max).toSeq)
    // re-pointing an existing name to a new path refuses
    val e2 = intercept[IllegalArgumentException](
      Catalog.commit(spark, cat, Map("fact" -> dim)))
    assert(e2.getMessage.contains("re-point"))
  }

  test("branches: isolated commit-on-branch, fast-forward merge, " +
      "loud divergence refusal") {
    val (cat, fact, dim) = fixture()
    val c0 = Catalog.commit(spark, cat, Map("fact" -> fact, "dim" -> dim))
    val mainFact = rows(LakeWriter.readSnapshot(spark, fact))
    // fork, advance BOTH tables, commit on the branch only
    Catalog.branch(spark, cat, "dev")
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 300)
    LakeWriter.commitSnapshot(
      LakeWriter.readSnapshot(spark, fact)
        .groupBy("lang").agg(count(lit(1)).as("n")), dim)
    Catalog.commitOnBranch(spark, cat, "dev",
      Map("fact" -> fact, "dim" -> dim))
    // main is untouched: its tip still serves the pre-branch state
    assert(rows(Catalog.readTableAt(spark, cat, "fact", c0)) == mainFact)
    assert(Catalog.commits(spark, cat) == Seq(0L))
    // the branch head serves the new pair consistently
    assert(rows(Catalog.readTableAtBranch(spark, cat, "dev", "fact")) ==
      rows(LakeWriter.readSnapshot(spark, fact)))
    assert(rows(Catalog.readTableAtBranch(spark, cat, "dev", "dim")) ==
      rows(LakeWriter.readSnapshot(spark, dim)))
    // fast-forward merge: main's next commit IS the branch head state
    val c1 = Catalog.mergeBranch(spark, cat, "dev")
    assert(c1 == 1L)
    assert(rows(Catalog.readTableAt(spark, cat, "fact", c1)) ==
      rows(LakeWriter.readSnapshot(spark, fact)))
    // divergence: a second branch forked at c0 cannot merge past c1
    val e = intercept[IllegalArgumentException](
      Catalog.mergeBranch(spark, cat, "dev2") // unknown first
    )
    assert(e.getMessage.contains("no branch"))
    Catalog.branch(spark, cat, "stale", from = Some(c0))
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 400)
    Catalog.commitOnBranch(spark, cat, "stale", Map("fact" -> fact))
    val e2 = intercept[RuntimeException](
      Catalog.mergeBranch(spark, cat, "stale"))
    assert(e2.getMessage.contains("fast-forward is impossible"))
    // re-creating an existing branch refuses
    val e3 = intercept[IllegalArgumentException](
      Catalog.branch(spark, cat, "dev"))
    assert(e3.getMessage.contains("already exists"))
  }

  test("three-way merge: disjoint per-table changes resolve, " +
      "conflicting tables refuse by name") {
    val (cat, fact, dim) = fixture()
    val c0 = Catalog.commit(spark, cat, Map("fact" -> fact, "dim" -> dim))
    // branch changes ONLY fact; main then changes ONLY dim
    Catalog.branch(spark, cat, "feat", from = Some(c0))
    val factV2 = LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 200)
    Catalog.commitOnBranch(spark, cat, "feat",
      Map("fact" -> fact, "dim" -> dim),
      at = Map("fact" -> factV2, "dim" -> 1L))
    val dimV2 = LakeWriter.commitSnapshot(
      LakeWriter.readSnapshot(spark, dim).withColumn("n", $"n" + 1), dim)
    Catalog.commit(spark, cat, Map("fact" -> fact, "dim" -> dim),
      at = Map("fact" -> 1L, "dim" -> dimV2)) // main keeps fact@1
    // fast-forward refuses (diverged), three-way resolves disjointly
    val e = intercept[RuntimeException](
      Catalog.mergeBranch(spark, cat, "feat"))
    assert(e.getMessage.contains("threeWay"))
    val mc = Catalog.mergeBranch(spark, cat, "feat", threeWay = true)
    val pins = Catalog.pinsAt(spark, cat, mc)
    assert(pins("fact")._2 == factV2) // the branch's change
    assert(pins("dim")._2 == dimV2)   // main's change
    // now BOTH sides change the same table (to DIFFERENT versions)
    // -> named conflict
    Catalog.branch(spark, cat, "feat2", from = Some(mc))
    val factV3 = LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 300)
    Catalog.commitOnBranch(spark, cat, "feat2",
      Map("fact" -> fact, "dim" -> dim),
      at = Map("fact" -> factV3, "dim" -> dimV2))
    val factV4 = LakeWriter.deleteFromSnapshot(spark, fact, $"v" >= 500)
    assert(factV4 != factV3)
    Catalog.commit(spark, cat, Map("fact" -> fact, "dim" -> dim),
      at = Map("fact" -> factV4, "dim" -> dimV2))
    val e2 = intercept[IllegalArgumentException](
      Catalog.mergeBranch(spark, cat, "feat2", threeWay = true))
    assert(e2.getMessage.contains("conflicts on table(s) fact"))
    // identical pins on both sides are NOT a conflict
    Catalog.branch(spark, cat, "feat3")
    LakeWriter.deleteFromSnapshot(spark, fact, $"v" < 400) // v5
    Catalog.commitOnBranch(spark, cat, "feat3",
      Map("fact" -> fact, "dim" -> dim))
    Catalog.commit(spark, cat, Map("fact" -> fact, "dim" -> dim))
    val mc3 = Catalog.mergeBranch(spark, cat, "feat3", threeWay = true)
    assert(Catalog.pinsAt(spark, cat, mc3)("fact")._2 ==
      LakeWriter.snapshotVersions(spark, fact).last)
  }

  test("tags are immutable; unknown tags and unpinned tables refuse " +
      "naming what exists") {
    val (cat, fact, dim) = fixture()
    val c1 = Catalog.commit(spark, cat, Map("fact" -> fact))
    Catalog.tag(spark, cat, "v1", Some(c1))
    val e = intercept[IllegalArgumentException](
      Catalog.tag(spark, cat, "v1", Some(c1)))
    assert(e.getMessage.contains("immutable"))
    val e2 = intercept[RuntimeException](
      Catalog.tagCommit(spark, cat, "nope"))
    assert(e2.getMessage.contains("v1"))
    val e3 = intercept[RuntimeException](
      Catalog.readTableAt(spark, cat, "dim", c1))
    assert(e3.getMessage.contains("fact"))
    // dim joins the catalog at the NEXT commit; the old commit still
    // serves only what it pinned
    val c2 = Catalog.commit(spark, cat,
      Map("fact" -> fact, "dim" -> dim))
    assert(Catalog.pinsAt(spark, cat, c2).keySet == Set("fact", "dim"))
    assert(Catalog.pinsAt(spark, cat, c1).keySet == Set("fact"))
  }
}
