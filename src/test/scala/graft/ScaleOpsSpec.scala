package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.{LakeWriter, Tables}
import graft.streaming.Speed

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Skew.saltedAgg is exact vs the plain aggregation") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), $"l_quantity",
      saltFrom = $"l_orderkey", salts = 8)
      .select($"l_returnflag", round($"total", 2).as("total"), $"n")
    val plain = li.groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 2).as("total"), count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("Skew.saltedJoin returns exactly the plain join's rows") {
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val c = Tables.load(spark, TestSpark.sfDir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val salted = Skew.saltedJoin(o, c, "o_custkey",
      saltFrom = $"o_orderkey", salts = 8)
    val plain = o.join(c, Seq("o_custkey"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty)
  }

  test("bucketed tables join without a shuffle on either side") {
    // a previous JVM's managed-table dirs survive the in-memory catalog
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get("/tmp/graft_warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    LakeWriter.bucketedTable(o, "b_orders", Seq("o_orderkey"), 4,
      Seq("o_orderkey"))
    LakeWriter.bucketedTable(li, "b_lineitem", Seq("l_orderkey"), 4,
      Seq("l_orderkey"))
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      $"l_orderkey" === $"o_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        li.join(o, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-order write: interleaving is order-preserving and clusters both dims") {
    import graft.plans.InterleaveBits
    // known bit pattern: (0,0) flips both int sign bits, then the
    // long's own sign bit flips back for signed ordering
    assert(InterleaveBits.interleave(0, 0) == 0x4000000000000000L)
    assert(InterleaveBits.interleave(0, 1) - InterleaveBits.interleave(0, 0) == 1L)
    // signed ordering across the zero crossings of EITHER column
    assert(InterleaveBits.interleave(-1, 5) < InterleaveBits.interleave(0, 5))
    assert(InterleaveBits.interleave(7, -1) < InterleaveBits.interleave(7, 0))
    assert(InterleaveBits.interleave(Int.MinValue, Int.MinValue) <
      InterleaveBits.interleave(Int.MaxValue, Int.MaxValue))
    // jointly monotone: a1<=a2 && b1<=b2 => z1 <= z2 — random pairs
    // FORCED to straddle zero regularly (not left to seed luck)
    val rnd = new scala.util.Random(7)
    for (i <- 1 to 2000) {
      val (a1, b1) =
        if (i % 3 == 0) (-rnd.nextInt(1 << 19), -rnd.nextInt(1 << 19))
        else (rnd.nextInt(), rnd.nextInt())
      val (a2, b2) = (a1 + rnd.nextInt(1 << 20), b1 + rnd.nextInt(1 << 20))
      assert(InterleaveBits.interleave(a1, b1) <=
        InterleaveBits.interleave(a2, b2),
        s"not monotone at ($a1,$b1) vs ($a2,$b2)")
    }
    // through the engine (codegen path) matches the kernel
    val df = Seq((3, 5), (-2, 7), (100, -4)).toDF("a", "b")
    val got = df.select(org.apache.spark.sql.GraftColumnBridge.column(
      InterleaveBits(Seq(
        org.apache.spark.sql.GraftColumnBridge.expression($"a"),
        org.apache.spark.sql.GraftColumnBridge.expression($"b")))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(InterleaveBits.interleave(3, 5),
      InterleaveBits.interleave(-2, 7), InterleaveBits.interleave(100, -4)))
    // files cluster BOTH dims: most files span well under the global
    // range on each column
    val out = java.nio.file.Files.createTempDirectory("graft_z").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    LakeWriter.zorderWrite(li, s"$out/li", "l_partkey", "l_suppkey", 8)
    val files = new java.io.File(s"$out/li").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 6)
    def spans(c: String) = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      r.getLong(1) - r.getLong(0)
    }
    def globalSpan(c: String) = {
      val r = li.agg(min(col(c)), max(col(c))).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    for (c <- Seq("l_partkey", "l_suppkey"))
      assert(spans(c).count(_ <= 0.6 * globalSpan(c)) >= files.length / 2,
        s"$c: too few files with narrow span")
    assert(spark.read.parquet(s"$out/li").count() == li.count())
  }

  test("3-column z-order: monotone kernel, codegen parity, files prune on any dim") {
    import graft.plans.InterleaveBits
    // jointly monotone in 3 and 4 dims (top-bit truncation is monotone)
    val rnd = new scala.util.Random(11)
    for (i <- 1 to 2000) {
      def step(x: Int) = // saturating: never wrap past MaxValue
        math.min(x.toLong + rnd.nextInt(1 << 20), Int.MaxValue).toInt
      val base = Array.fill(3)(
        if (i % 3 == 0) -rnd.nextInt(1 << 19) else rnd.nextInt())
      val stepped = base.map(step)
      assert(InterleaveBits.interleave(base) <=
        InterleaveBits.interleave(stepped),
        s"3-dim not monotone at ${base.toSeq} vs ${stepped.toSeq}")
      val b4 = base :+ rnd.nextInt()
      val s4 = stepped :+ step(b4(3))
      assert(InterleaveBits.interleave(b4) <= InterleaveBits.interleave(s4),
        s"4-dim not monotone at ${b4.toSeq} vs ${s4.toSeq}")
    }
    // 2-dim arity keeps the original bit layout
    assert(InterleaveBits.interleave(0, 0) == 0x4000000000000000L)
    // codegen path matches the kernel at arity 3
    val df3 = Seq((3, 5, 9), (-2, 7, -1), (100, -4, 0)).toDF("a", "b", "c")
    val got3 = df3.select(org.apache.spark.sql.GraftColumnBridge.column(
      InterleaveBits(Seq("a", "b", "c").map(n =>
        org.apache.spark.sql.GraftColumnBridge.expression(col(n))))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got3 == Seq(InterleaveBits.interleave(3, 5, 9),
      InterleaveBits.interleave(-2, 7, -1),
      InterleaveBits.interleave(100, -4, 0)))
    // a 3-column clustered write: every file narrow on EVERY dimension
    val out = java.nio.file.Files.createTempDirectory("graft_z3").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_orderkey")
    // a contiguous z-range pins ~log2(nFiles) leading KEY bits, handed
    // round-robin to the dims — so narrowing ALL of n dims needs
    // nFiles >> 2^n (true of any real table: thousands of files)
    LakeWriter.zorderWrite(li, s"$out/li",
      Seq("l_partkey", "l_suppkey", "l_orderkey"), 64)
    val files = new java.io.File(s"$out/li").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 30)
    def spans(c: String) = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      r.getLong(1) - r.getLong(0)
    }
    def globalSpan(c: String) = {
      val r = li.agg(min(col(c)), max(col(c))).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    for (c <- Seq("l_partkey", "l_suppkey", "l_orderkey"))
      assert(spans(c).count(_ <= 0.6 * globalSpan(c)) >= files.length / 2,
        s"$c: too few files with narrow span")
    // ...so parquet min/max statistics SKIP row groups on a predicate
    // over any single dimension: the scan emits fewer rows than the
    // table holds (record-level filtering is off by default — rows
    // out of the scan == rows of the row groups that survived stats)
    val total = li.count()
    val hi = li.agg(max($"l_partkey")).head().getLong(0)
    val probe = spark.read.parquet(s"$out/li")
      .where($"l_partkey" >= hi - 2)
    probe.collect()
    val scanned = probe.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
    assert(scanned < total / 2,
      s"no row-group pruning: scan emitted $scanned of $total rows")
    assert(spark.read.parquet(s"$out/li").count() == total)
  }

  test("snapshot commits: atomic versions, append as metadata, time travel") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val d1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val d2 = Seq((3, "c")).toDF("id", "v")
    val d3 = Seq((9, "z")).toDF("id", "v")
    assert(LakeWriter.commitSnapshot(d1, table) == 1L)
    assert(LakeWriter.commitSnapshot(d2, table, mode = "append") == 2L)
    assert(LakeWriter.commitSnapshot(d3, table) == 3L)
    // latest = the v3 overwrite only
    assert(LakeWriter.readSnapshot(spark, table).collect().toSet ==
      d3.collect().toSet)
    // append snapshot carried v1's files without rewriting them
    assert(LakeWriter.readSnapshot(spark, table, Some(2L)).count() == 3)
    assert(LakeWriter.snapshotFiles(spark, table, 2L)
      .exists(_.contains("data/v1")))
    // time travel to v1
    assert(LakeWriter.readSnapshot(spark, table, Some(1L)).collect().toSet ==
      d1.collect().toSet)
    assert(LakeWriter.snapshotVersions(spark, table) == Seq(1L, 2L, 3L))
    // an orphaned data dir from a crashed writer can NEVER wedge the
    // table: the next commit picks a fresh attempt directory
    d1.write.parquet(s"$table/data/v4-deadbeef")
    assert(LakeWriter.commitSnapshot(d1, table) == 4L)
    assert(LakeWriter.readSnapshot(spark, table).count() == 2)
    // ...and the orphan's files are not part of any snapshot
    assert(!LakeWriter.snapshotFiles(spark, table, 4L)
      .exists(_.contains("deadbeef")))
    // an empty snapshot (zero data files) keeps its schema — the
    // zero-partition frame guarantees nothing is written at all
    val zeroPart = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], d1.schema)
    LakeWriter.commitSnapshot(zeroPart, table)
    val empty = LakeWriter.readSnapshot(spark, table)
    assert(empty.columns.toSeq == Seq("id", "v") && empty.count() == 0)
    // snapshot-aware compaction: a new version with fewer files, old
    // versions untouched
    LakeWriter.commitSnapshot(d3, table)   // v6, non-empty latest
    val cv = LakeWriter.compactSnapshot(spark, table, nFiles = 1)
    assert(cv == 7L)
    assert(LakeWriter.snapshotFiles(spark, table, 7L).length == 1)
    assert(LakeWriter.readSnapshot(spark, table).collect().toSet ==
      d3.collect().toSet)
    // snapshot tables serve through the SQL layer, incl. time travel
    graft.sources.Views.registerSnapshotAsOf(spark, table, "snap_v1", 1L)
    assert(spark.sql("SELECT count(*) FROM snap_v1").head().getLong(0) == 2L)
    // vacuum: only the latest version and its data survive — old
    // manifests, superseded data dirs, AND the crash orphan are gone
    LakeWriter.vacuumSnapshots(spark, table, keepLast = 1)
    assert(LakeWriter.snapshotVersions(spark, table) == Seq(7L))
    assert(LakeWriter.readSnapshot(spark, table).collect().toSet ==
      d3.collect().toSet)
    val dataDirs = new java.io.File(table, "data").listFiles().map(_.getName)
    assert(dataDirs.length == 1 && dataDirs.head.startsWith("v7-"),
      s"unexpected surviving data dirs: ${dataDirs.toSeq}")
  }

  test("clusteredWrite yields files with non-overlapping key ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    LakeWriter.clusteredWrite(li, s"$out/li", Seq("l_shipdate"), nFiles = 6)
    val files = new java.io.File(s"$out/li").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4)
    // per-file key ranges must tile, not overlap (touching at range
    // boundaries is allowed: a boundary value may close one file and
    // open the next)
    val ranges = files.map { f =>
      // ISO timestamp strings order lexicographically
      val r = spark.read.parquet(f)
        .agg(min($"l_shipdate".cast("string")),
          max($"l_shipdate".cast("string"))).head()
      (r.getString(0), r.getString(1))
    }.sorted
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(lo2 >= hi, s"file ranges overlap: $hi vs $lo2")
      case _ =>
    }
    // the full rewrite round-trips exactly
    assert(spark.read.parquet(s"$out/li").count() == li.count())
  }

  test("dynamic snapshot commit: untouched partitions carried, history intact") {
    val table = java.nio.file.Files.createTempDirectory("graft_dsnap").toString
    val day1 = Seq((1, "d1", "a"), (2, "d1", "b")).toDF("id", "day", "v")
    val day2 = Seq((3, "d2", "c")).toDF("id", "day", "v")
    // v1: full load of two days
    assert(LakeWriter.commitSnapshotDynamic(day1.union(day2), table,
      Seq("day")) == 1L)
    // v2: reload ONLY day d2 with corrected data
    val day2fix = Seq((3, "d2", "c-fixed"), (4, "d2", "d"))
      .toDF("id", "day", "v")
    assert(LakeWriter.commitSnapshotDynamic(day2fix, table, Seq("day")) == 2L)
    val v2 = LakeWriter.readSnapshot(spark, table)
    // d1 rows carried untouched; d2 fully replaced
    assert(v2.where($"day" === "d1").count() == 2)
    assert(v2.where($"day" === "d2").select("v").collect()
      .map(_.getString(0)).toSet == Set("c-fixed", "d"))
    // d1 files in v2 are the PHYSICAL v1 files (metadata carry)
    val v1Files = LakeWriter.snapshotFiles(spark, table, 1L)
    val v2Files = LakeWriter.snapshotFiles(spark, table, 2L)
    assert(v2Files.filter(_.contains("day=d1")).toSet ==
      v1Files.filter(_.contains("day=d1")).toSet)
    // time travel: v1 still shows the original d2
    assert(LakeWriter.readSnapshot(spark, table, Some(1L))
      .where($"day" === "d2").select("v").collect()
      .map(_.getString(0)).toSeq == Seq("c"))
    // partition pruning reaches the scan of a snapshot read
    val pruned = v2.where($"day" === "d2")
    assert(pruned.queryExecution.executedPlan.toString.contains("day"))
    // vacuum must treat hive-NESTED version dirs as live: liveness is
    // a recursive file check, not direct children (which are col=value
    // directories for dynamic commits)
    LakeWriter.vacuumSnapshots(spark, table, keepLast = 1)
    assert(LakeWriter.snapshotVersions(spark, table) == Seq(2L))
    val after = LakeWriter.readSnapshot(spark, table)
    assert(after.where($"day" === "d1").count() == 2)
    assert(after.where($"day" === "d2").count() == 2)
  }

  test("partition spec evolution: new layout for new data, old files carry, migrate unifies") {
    val table = java.nio.file.Files
      .createTempDirectory("graft_evolve").toString
    // v1: UNPARTITIONED commits (lang lives as a data column)
    val old1 = Seq((1L, "en", 10), (2L, "de", 20)).toDF("id", "lang", "v")
    val old2 = Seq((3L, "en", 30)).toDF("id", "lang", "v")
    LakeWriter.commitSnapshot(old1, table)
    LakeWriter.commitSnapshot(old2, table, mode = "append")
    // v3: the spec EVOLVES — a dynamic commit partitioned by lang;
    // pre-spec files carry by reference (no partition can match them)
    val nw = Seq((4L, "en", 40), (5L, "fr", 50)).toDF("id", "lang", "v")
    assert(LakeWriter.commitSnapshotDynamic(nw, table, Seq("lang")) == 3L)
    val v3 = LakeWriter.readSnapshot(spark, table)
    assert(v3.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(v3.where($"lang" === "en").select($"id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 4L))
    // pre-spec files are physical carries
    val v3Files = LakeWriter.snapshotFiles(spark, table, 3L)
    assert(LakeWriter.snapshotFiles(spark, table, 2L)
      .forall(v3Files.contains))

    // skipping still prunes the post-spec generation by PATH value:
    // corrupt the fr file in place — an en read must never open it
    // (the mixed-language pre-spec files prune conservatively via
    // their footer stats and stay readable)
    val frFile = v3Files.filter(_.contains("lang=fr"))
    assert(frFile.nonEmpty)
    frFile.foreach(f => java.nio.file.Files.write(
      java.nio.file.Paths.get(f.stripPrefix("file:")),
      "corrupt".getBytes): Unit)
    assert(LakeWriter.readSnapshotWhere(spark, table, $"lang" === "en")
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))

    // MIGRATION on a fresh identically-evolved table (this one's fr
    // file is corrupt by design): pre-spec files rewrite under the
    // current layout, conformant files carry, rows identical
    val t2 = java.nio.file.Files
      .createTempDirectory("graft_evolve2").toString
    LakeWriter.commitSnapshot(old1, t2)
    LakeWriter.commitSnapshot(old2, t2, mode = "append")
    LakeWriter.commitSnapshotDynamic(nw, t2, Seq("lang"))
    val preSpec = LakeWriter.snapshotFiles(spark, t2, 3L)
      .filterNot(_.contains("lang="))
    assert(preSpec.nonEmpty)
    val v4 = LakeWriter.migratePartitionSpec(spark, t2)
    assert(v4 == 4L)
    val v4Files = LakeWriter.snapshotFiles(spark, t2, 4L)
    assert(v4Files.forall(_.contains("lang=")))
    // conformant (post-spec) files carried physically
    assert(LakeWriter.snapshotFiles(spark, t2, 3L)
      .filter(_.contains("lang=")).forall(v4Files.contains))
    assert(LakeWriter.readSnapshot(spark, t2)
      .select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // a second migrate is the identity (layout already uniform)
    assert(LakeWriter.migratePartitionSpec(spark, t2) == 4L)
    // post-migration, dynamic REPLACEMENT sees every en row
    val enFix = Seq((6L, "en", 60)).toDF("id", "lang", "v")
    LakeWriter.commitSnapshotDynamic(enFix, t2, Seq("lang"))
    val fin = LakeWriter.readSnapshot(spark, t2)
    assert(fin.where($"lang" === "en").select($"id").as[Long]
      .collect().toSeq == Seq(6L))
    assert(fin.where($"lang" =!= "en").select($"id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 5L))
  }

  test("spec evolution: A->B chains, merge/delete on mixed layouts, refusal guard") {
    import graft.sources.LakeWriter._
    // --- spec A -> spec B chain -------------------------------------
    val t1 = java.nio.file.Files.createTempDirectory("graft_ev_ab").toString
    val r1 = Seq((1L, "x", "p", 1), (2L, "y", "q", 2)).toDF("id", "a", "b", "v")
    commitSnapshotDynamic(r1, t1, Seq("a"))               // spec (a)
    val r2 = Seq((3L, "x", "p", 3)).toDF("id", "a", "b", "v")
    commitSnapshotDynamic(r2, t1, Seq("b"))               // EVOLVE to (b):
    // spec-(a) files are pre-spec for (b) -> everything carries
    assert(readSnapshot(spark, t1).select($"id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // same-spec dynamic on the mixed layout refuses
    val ex = intercept[IllegalArgumentException] {
      commitSnapshotDynamic(
        Seq((9L, "z", "p", 9)).toDF("id", "a", "b", "v"), t1, Seq("b"))
    }
    assert(ex.getMessage.contains("migratePartitionSpec"))
    // migrate, then same-spec replacement works and sees every b=p row
    migratePartitionSpec(spark, t1)
    commitSnapshotDynamic(
      Seq((9L, "z", "p", 9)).toDF("id", "a", "b", "v"), t1, Seq("b"))
    val fin1 = readSnapshot(spark, t1)
    assert(fin1.where($"b" === "p").select($"id").as[Long]
      .collect().toSeq == Seq(9L))           // 1 and 3 replaced with 9
    assert(fin1.where($"b" === "q").select($"id").as[Long]
      .collect().toSeq == Seq(2L))

    // --- MERGE on a mixed layout ------------------------------------
    val t2 = java.nio.file.Files.createTempDirectory("graft_ev_mg").toString
    commitSnapshot(Seq((1L, "en", 10), (2L, "de", 20))
      .toDF("id", "lang", "v"), t2)                        // pre-spec
    commitSnapshotDynamic(Seq((3L, "en", 30), (4L, "fr", 40))
      .toDF("id", "lang", "v"), t2, Seq("lang"))           // evolved
    // upsert touches one pre-spec row, one post-spec row, one new key
    mergeSnapshot(Seq((1L, "en", 11), (4L, "fr", 44), (5L, "de", 55))
      .toDF("id", "lang", "v"), t2, Seq("id"))
    assert(readSnapshot(spark, t2).as[(Long, String, Int)]
      .collect().sorted.toSeq ==
      Seq((1L, "en", 11), (2L, "de", 20), (3L, "en", 30),
        (4L, "fr", 44), (5L, "de", 55)))

    // --- DELETE on a mixed layout (non-partition predicate) ---------
    val t3 = java.nio.file.Files.createTempDirectory("graft_ev_dl").toString
    commitSnapshot(Seq((1L, "en", 10), (2L, "de", 200))
      .toDF("id", "lang", "v"), t3)
    commitSnapshotDynamic(Seq((3L, "en", 300), (4L, "fr", 40))
      .toDF("id", "lang", "v"), t3, Seq("lang"))
    deleteFromSnapshot(spark, t3, $"v" < 100)              // spans layouts
    assert(readSnapshot(spark, t3).select($"id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))
    // history time-travels across the evolution boundary
    assert(readSnapshot(spark, t3, Some(1L)).count() == 2)
    assert(readSnapshot(spark, t3, Some(2L)).count() == 4)
  }

  test("dynamic snapshot commit matches partitions for timestamp/empty values") {
    val table = java.nio.file.Files.createTempDirectory("graft_dsnap_ts").toString
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val v1 = Seq((1, t1, "a"), (2, t2, "b")).toDF("id", "day", "v")
    assert(LakeWriter.commitSnapshotDynamic(v1, table, Seq("day")) == 1L)
    // overwrite ONLY the t2 partition: the old t2 file must not be
    // carried — Timestamp.toString ("....0") diverges from the hive
    // path value format, so touched partitions must come from the
    // WRITTEN PATHS, not Row values
    val v2 = Seq((3, t2, "b-fixed")).toDF("id", "day", "v")
    assert(LakeWriter.commitSnapshotDynamic(v2, table, Seq("day")) == 2L)
    val snap = LakeWriter.readSnapshot(spark, table)
    assert(snap.count() == 2, s"stale timestamp partition carried: ${snap.collect().toSeq}")
    assert(snap.where($"id" === 2).count() == 0)
    // empty string lands as __HIVE_DEFAULT_PARTITION__; overwriting it
    // must replace, not duplicate
    val table2 = java.nio.file.Files.createTempDirectory("graft_dsnap_e").toString
    assert(LakeWriter.commitSnapshotDynamic(
      Seq((10, "", "x")).toDF("id", "day2", "v"), table2, Seq("day2")) == 1L)
    assert(LakeWriter.commitSnapshotDynamic(
      Seq((11, "", "y")).toDF("id", "day2", "v"), table2, Seq("day2")) == 2L)
    assert(LakeWriter.readSnapshot(spark, table2).count() == 1)
  }

  test("vacuum spares data dirs of in-flight (uncommitted) versions") {
    val table = java.nio.file.Files.createTempDirectory("graft_vac_if").toString
    val d = Seq((1, "a")).toDF("id", "v")
    LakeWriter.commitSnapshot(d, table) // v1
    LakeWriter.commitSnapshot(d, table) // v2
    // an in-flight v3: data landed, manifest rename not yet happened —
    // vacuum must NOT delete it (the commit would succeed pointing at
    // vanished files)
    d.write.parquet(s"$table/data/v3-inflight")
    LakeWriter.vacuumSnapshots(spark, table, keepLast = 1)
    val dirs = new java.io.File(table, "data").listFiles().map(_.getName).toSet
    assert(dirs.exists(_.startsWith("v2-")), s"latest data gone: $dirs")
    assert(dirs.contains("v3-inflight"), s"in-flight dir deleted: $dirs")
    assert(!dirs.exists(_.startsWith("v1-")), s"superseded dir kept: $dirs")
  }

  test("corpusStatsDelta: per-version growth incl. overwrite removals") {
    val table = java.nio.file.Files.createTempDirectory("graft_csd").toString
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    // v1: 3 docs (2+3+1 tokens); v2 append: 2 docs (2+2); v3 OVERWRITE
    // keeps only two docs (2+2 tokens) — removals must show up
    LakeWriter.commitSnapshot(mk(Seq(
      (1L, "alpha beta"), (2L, "one two three"), (3L, "solo"))), table)
    LakeWriter.commitSnapshot(mk(Seq(
      (4L, "four tokens? no"), (5L, "five six"))), table, mode = "append")
    LakeWriter.commitSnapshot(mk(Seq(
      (1L, "alpha beta"), (5L, "five six"))), table)
    val out = graft.operators.TextAnalysis
      .corpusStatsDelta(spark, table, "text", "doc_id")
      .orderBy("version").collect()
    assert(out.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(r => (r.getAs[Long]("n_docs_added"),
      r.getAs[Long]("n_docs_removed"))).toSeq ==
      Seq((3L, 0L), (2L, 0L), (2L, 5L)))
    assert(out.map(r => (r.getAs[Long]("n_tokens_added"),
      r.getAs[Long]("n_tokens_removed"))).toSeq ==
      Seq((6L, 0L), (5L, 0L), (4L, 11L)))
    // cumulative totals equal a fresh full scan of the live snapshot
    assert(out.last.getAs[Long]("n_docs") == 2L)
    assert(out.last.getAs[Long]("n_tokens") == 4L)
  }

  test("corpusStatsDelta works over partitioned (dynamic) snapshots") {
    val table = java.nio.file.Files.createTempDirectory("graft_csdp").toString
    val mk = (rows: Seq[(Long, String, String)]) =>
      rows.toDF("doc_id", "text", "lang")
    // v1: two partitions; v2 dynamic overwrite touches lang=en only
    // (replaces 2 docs/5 tokens with 1 doc/2 tokens, vi untouched)
    LakeWriter.commitSnapshotDynamic(mk(Seq(
      (1L, "alpha beta", "en"), (2L, "one two three", "en"),
      (3L, "xin chao", "vi"))), table, Seq("lang"))
    LakeWriter.commitSnapshotDynamic(mk(Seq(
      (9L, "replaced text", "en"))), table, Seq("lang"))
    val out = graft.operators.TextAnalysis
      .corpusStatsDelta(spark, table, "text", "doc_id")
      .orderBy("version").collect()
    assert(out.map(r => (r.getAs[Long]("n_docs_added"),
      r.getAs[Long]("n_docs_removed"),
      r.getAs[Long]("n_tokens_added"),
      r.getAs[Long]("n_tokens_removed"))).toSeq ==
      Seq((3L, 0L, 7L, 0L), (1L, 2L, 2L, 5L)))
    assert(out.last.getAs[Long]("n_docs") == 2L &&
      out.last.getAs[Long]("n_tokens") == 4L)
  }

  test("Scd2.merge(incremental) equals the full-history rebuild") {
    import graft.operators.Scd2
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    val cut = "2024-01-15 00:00:00"
    val first = ev.where($"ts" < to_timestamp(lit(cut)))
    val second = ev.where($"ts" >= to_timestamp(lit(cut)))
    val full = Scd2.build(ev, Seq("user_id"), Seq("event_type"), "ts")
    val incr = Scd2.merge(
      Scd2.build(first, Seq("user_id"), Seq("event_type"), "ts"),
      second, Seq("user_id"), Seq("event_type"), "ts")
    assert(incr.count() == full.count())
    assert(incr.except(full).isEmpty && full.except(incr).isEmpty)
  }

  test("LakeWriter.compact collapses small files per partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .withColumn("day", to_date($"ts"))
    ev.repartition(10).write.partitionBy("day").mode("overwrite")
      .parquet(s"$dir/t")
    def fileCount = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    val before = fileCount
    LakeWriter.compact(spark, s"$dir/t", Seq("day"))
    val after = fileCount
    assert(after < before, s"$after !< $before")
    assert(spark.read.parquet(s"$dir/t").count() == ev.count())
  }

  test("streaming agg sink resumes from checkpoint on incremental arrival") {
    val stage = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val lake = java.nio.file.Files.createTempDirectory("graft_inc_lake").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_inc_ck").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    def land(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val t = java.nio.file.Files.createTempDirectory("graft_land")
      df.coalesce(1).write.mode("overwrite").parquet(t.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(t).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(stage, s"$tag.parquet"))
    }
    def aggStream = spark.readStream.schema(ev.schema).parquet(stage)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    // first arrival
    land(ev.where($"event_id" < 500), "batch1")
    Speed.sinkToLake(aggStream, s"$lake/agg", Seq("day", "event_type"), ckpt)
      .awaitTermination()
    assert(spark.read.parquet(s"$lake/agg").agg(sum($"n")).head()
      .getLong(0) == 500)
    // second arrival, same checkpoint: state carries over, changed
    // (day, event_type) partitions are rewritten with full counts
    land(ev.where($"event_id" >= 500), "batch2")
    Speed.sinkToLake(aggStream, s"$lake/agg", Seq("day", "event_type"), ckpt)
      .awaitTermination()
    val got = spark.read.parquet(s"$lake/agg")
      .select($"day", $"event_type", $"n")
    val want = ev.groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("stream-stream interval join: purchases within 1h of a click") {
    val ev = Speed.eventStream(spark, TestSpark.sfDir)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"))
      .withColumnRenamed("p_user", "user_id")
    val joined = Speed.intervalJoin(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", withinMillis = 3600000L)
    val out = Speed.runToBatch(spark, joined, "t_interval",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEv = Tables.load(spark, TestSpark.sfDir, "events")
    val bc = batchEv.where($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
    val bp = batchEv.where($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"))
    val batch = bc.join(bp, Seq("user_id"))
      .where($"purchase_ts" > $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 3600 SECONDS"))
    // stream result must be a subset of the batch join (watermark can
    // hold back tail rows) and substantially cover it
    assert(out.count() > 0)
    assert(out.select("user_id", "click_ts", "purchase_ts")
      .except(batch.select("user_id", "click_ts", "purchase_ts")).isEmpty)
    assert(out.count() >= batch.count() / 2)
  }
}
