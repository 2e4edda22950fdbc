package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Linkage, Profiling, Sketches, TextAnalysis}

/** The r10-continuation operator tranche: column profiling, blocked
  * fuzzy resolution, count-min heavy hitters, and the held-out bigram
  * perplexity filter. */
class QualityLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile reports nulls, cardinality, ranges, and means per column") {
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (3L, None: Option[String], Some(30.0)),
      (4L, Some("b"), None: Option[Double])
    ).toDF("id", "s", "x")
    val out = Profiling.profile(df, Seq("id", "s", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0 &&
      id.getDouble(6) == 2.5)
    val s = out("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(7) == "a" && s.getString(8) == "b")
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6))
    val x = out("x")
    assert(x.getLong(2) == 1L && x.getLong(3) == 3L)
    assert(x.getDouble(4) == 10.0 && x.getDouble(5) == 30.0 &&
      x.getDouble(6) == 20.0)
  }

  test("profile handles timestamp columns at day grain") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-03-05 23:59:59"))
    ).toDF("id", "ts")
    val out = Profiling.profile(df, Seq("ts")).collect().head
    assert(out.getString(7) == "2024-03-01" &&
      out.getString(8) == "2024-03-05")
  }

  test("fuzzyResolve matches within the block, min distance, ties lexicographic") {
    val dirty = Seq(
      (1L, "blue bol"),    // deletion of 't' from "blue bolt"
      (2L, "red widgt"),   // deletion of 'e' from "red widget"
      (3L, "zzz nothing")  // no candidate within distance 2
    ).toDF("id", "name")
    val dim = Seq("blue bolt", "blue bell", "red widget", "red gadget")
      .toDF("p_name")
    val out = Linkage.fuzzyResolve(dirty, "id", "name", dim, "p_name",
        maxDist = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getInt(3), r.getInt(4)))).toMap
    // "blue bol": dist 1 to "blue bolt", dist 2 to "blue bell" — both
    // candidates, bolt wins on distance
    assert(out(1L) == (("blue bolt", 1, 2)))
    assert(out(2L) == (("red widget", 1, 1)))
    assert(!out.contains(3L))
  }

  test("fuzzyResolve tie on distance goes to the lexicographically smaller name") {
    val dirty = Seq((1L, "bat")).toDF("id", "name")
    val dim = Seq("bad", "bag").toDF("p_name") // both distance 1
    val out = Linkage.fuzzyResolve(dirty, "id", "name", dim, "p_name",
      maxDist = 2).collect().head
    assert(out.getString(2) == "bad" && out.getInt(4) == 2)
  }

  test("heavyHitters: exact top-k ordering and sketch bound flags") {
    val items = (Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(20)("gamma") ++ Seq.fill(5)("delta") ++ Seq("eps"))
      .toDF("item")
    val out = Sketches.heavyHitters(spark, items, "item", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("alpha", 50L, 1), ("beta", 30L, 1),
      ("gamma", 20L, 1)))
  }

  test("heavyHitters tie at the k-boundary resolves alphabetically") {
    val items = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(3)("c") ++
      Seq("z")).toDF("item")
    val out = Sketches.heavyHitters(spark, items, "item", k = 2)
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("a", "b"))
  }

  test("ohlcResample: open/close by event-time with id tie-break") {
    import graft.operators.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // same-week ticks; two share the opening timestamp — the
      // smaller event_id must win "open"
      (1L, "x", ts("2024-01-01 09:00:00"), 10.0),
      (0L, "x", ts("2024-01-01 09:00:00"), 11.0),
      (2L, "x", ts("2024-01-03 09:00:00"), 99.0),
      (3L, "x", ts("2024-01-05 09:00:00"), 7.0),
      (4L, "x", ts("2024-01-05 09:00:00"), 8.0) // close: larger id wins
    ).toDF("event_id", "event_type", "ts", "value")
    val out = Analytics.ohlcResample(df, "event_type", "ts", "event_id",
      "value", "week").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(2) == 11.0) // open: id 0 at the tied open ts
    assert(r.getDouble(3) == 99.0 && r.getDouble(4) == 7.0)
    assert(r.getDouble(5) == 8.0)  // close: id 4 at the tied close ts
    assert(r.getLong(6) == 5L)
  }

  test("vwap: integer micro arithmetic, zero-volume group is NULL") {
    import graft.operators.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("x", ts("2024-01-01 01:00:00"), 10.0, 1L),
      ("x", ts("2024-01-01 02:00:00"), 20.0, 3L),
      ("y", ts("2024-01-01 01:00:00"), 5.0, 0L)
    ).toDF("event_type", "ts", "value", "w")
    val out = Analytics.vwap(df, "event_type", "ts", "value", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // x: (10*1 + 20*3)/4 = 17.5
    assert(out("x") == ((4L, Some(17.5))))
    assert(out("y") == ((0L, None)))
  }

  test("canonicalizeUrl: ports, fragments, tracking params, order, slashes") {
    import graft.operators.Curation
    val cases = Seq(
      // default port + fragment + utm + unsorted params + casing
      "HTTP://Www.Ex.COM:80/A/B/?b=2&utm_source=x&a=1#frag" ->
        "http://www.ex.com/A/B?a=1&b=2",
      // https keeps a NON-default port; :443 would strip
      "https://ex.com:8443/p?a=1" -> "https://ex.com:8443/p?a=1",
      "https://ex.com:443/p" -> "https://ex.com/p",
      // http does NOT strip :443 (not its default)
      "http://ex.com:443/p" -> "http://ex.com:443/p",
      // all params tracking → no query at all; bare host → "/"
      "https://EX.com?utm_medium=a&gclid=xyz" -> "https://ex.com/",
      // path case preserved; empty param dropped
      "http://ex.com/Path//?&z=1" -> "http://ex.com/Path?z=1")
    val df = cases.map(_._1).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = df.select(col("id"),
        Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"url=$in")
    }
  }

  test("ngramContainment flags an excerpt (cont=1.0) where Jaccard stays tiny") {
    import graft.operators.Dedup
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 15).map(i => s"w$i").mkString(" ") // 6 tokens ⊂ big
    val docs = Seq((1L, big), (2L, excerpt)).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.ngramContainment(cand, docs, "text", "doc_id",
      shingleN = 3, threshold = 0.1).collect()
    assert(out.length == 1)
    val r = out.head
    // every 3-gram of the excerpt (4 of them) appears in big: cont_b
    // (the b-side doc 2 is the excerpt) = 1.0; big has 58 shingles →
    // cont_a = 4/58
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(2) == math.floor(4.0 / 58 * 10000 + 0.5) / 10000)
    // the symmetric Jaccard on the same pair is far below 0.5 — the
    // case containment exists to catch
    val j = Dedup.ngramJaccard(cand, docs, "text", "doc_id", 3, 0.0)
      .head().getDouble(2)
    assert(j < 0.1)
  }

  test("madOutliers: hand-computed median/MAD and outlier count") {
    // group g: values 1..9 plus an extreme 1000
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 1000.0)))
      .toDF("k", "v")
    val out = graft.operators.Analytics.madOutliers(df, "k", "v")
      .collect().head
    // median of (1..9,1000) = 5.5; deviations |v-5.5| =
    // (4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5) → MAD = 2.5;
    // outliers: dv > 7.5 → only 1000
    assert(out.getLong(1) == 10L)
    assert(out.getDouble(2) == 5.5 && out.getDouble(3) == 2.5)
    assert(out.getLong(4) == 1L)
  }

  test("MisraGriesTopK: exact when capacity exceeds cardinality") {
    val items = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("item").repartition(4)
    val out = Sketches.topKGuaranteed(spark, items, "item", k = 3,
      capacity = 16).collect()
    // no eviction ever: estimates are exact, flags all green
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSeq == Seq(("a", 7L, 1), ("b", 3L, 1), ("c", 1L, 1)))
  }

  test("MisraGriesTopK: guarantee holds under genuine eviction and any partitioning") {
    // 2000 distinct tail keys + two heavy keys, capacity 64 — far
    // more keys than counters, so decrement-all eviction fires
    // constantly in every partial
    val rows = (0 until 2000).map(i => s"tail_$i") ++
      Seq.fill(800)("hot_a") ++ Seq.fill(500)("hot_b")
    for (parts <- Seq(1, 7, 32)) {
      val items = rows.toDF("item").repartition(parts)
      val out = Sketches.topKGuaranteed(spark, items, "item", k = 5,
        capacity = 64).collect()
      assert(out.length == 5)
      // every flag must hold REGARDLESS of merge order; the heavies
      // are far above the worst-case slack N/(cap+1) ≈ 50 so they
      // must be retained and bounded
      assert(out.forall(_.getInt(2) == 1),
        s"guarantee violated at parts=$parts: ${out.mkString(",")}")
      assert(out.take(2).map(_.getString(0)).toSeq ==
        Seq("hot_a", "hot_b"))
    }
  }

  test("MGSummary merge matches a single-pass summary's guarantees") {
    import graft.plans.MGSummary
    import scala.collection.mutable
    val cap = 8
    val stream = (0 until 300).map(i => s"k${i % 40}") ++
      Seq.fill(200)("heavy")
    // split the stream three ways, summarize each, merge
    val parts = stream.grouped(167).toSeq
    val summaries = parts.map { p =>
      val s = new MGSummary(mutable.HashMap.empty)
      p.foreach(s.update(_, cap)); s
    }
    val merged = summaries.reduce { (a, b) => a.merge(b, cap); a }
    assert(merged.counts.size <= cap)
    val n = stream.size.toLong
    val m = merged.counts.values.sum
    val slack = (n - m) / (cap + 1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    // two-sided bound for every retained item; heavy must be retained
    merged.counts.foreach { case (k, est) =>
      assert(est <= exact(k) && exact(k) <= est + slack, s"$k")
    }
    assert(merged.counts.contains("heavy"))
    exact.filter(_._2 > slack).keys.foreach(k =>
      assert(merged.counts.contains(k), s"$k above slack but dropped"))
  }

  test("perplexityScore: hand-computed Laplace bigram NLL on a tiny corpus") {
    // reference: one doc "a b a b" → bigrams ab, ba, ab; contexts:
    // a→2, b→1; vocab {a,b} → V = 3
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "a b a b"),
      (1L, "a b"),   // p(b|a) = (2+1)/(2+3) = 0.6
      (2L, "b c"),   // unseen bigram, seen ctx b: (0+1)/(1+3) = 0.25
      (3L, "x y"),   // unseen ctx: 1/V = 1/3
      (4L, "solo")   // < 2 tokens: excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityScore(corpus, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def micro(p: Double): Long = math.floor(-math.log(p) * 1e6 + 0.5).toLong
    assert(out(1L) == ((1L, micro(0.6), micro(0.6))))
    assert(out(2L) == ((1L, micro(0.25), micro(0.25))))
    assert(out(3L) == ((1L, micro(1.0 / 3.0), micro(1.0 / 3.0))))
    // doc 0: ab(0.6) + ba((1+1)/(1+3)=0.5) + ab(0.6)
    val exp0 = 2 * micro(0.6) + micro(0.5)
    assert(out(0L) == ((3L, exp0, exp0 / 3)))
    assert(!out.contains(4L))
  }

  test("perplexityScore ranks reference-like text below garbage") {
    val docs = Tables.loadDocs()
    val ref = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val out = TextAnalysis.perplexityScore(docs, ref, "text", "doc_id")
    assert(out.count() > 0)
    // every score is non-negative and averages are consistent
    assert(out.where(col("nll_micro") < 0).count() == 0)
    assert(out.where(
      col("avg_nll_micro") > col("nll_micro")).count() == 0)
  }

  test("erClusters: transitive bridge, singletons, every record labeled") {
    // "acme corp" bridges "acme cor" and "acme corpx" (each within
    // dist 2 of the bridge, 3 apart from each other — transitivity
    // is load-bearing); "zeta llc" is a singleton; "bcme corp" blocks
    // under 'b' so it must NOT join the acme entity despite dist 1
    val recs = Seq(
      (10L, "acme corp"), (11L, "acme cor"), (12L, "acme corpx"),
      (20L, "zeta llc"), (30L, "bcme corp"))
      .toDF("rec_id", "name")
    val out = graft.operators.Linkage
      .erClusters(recs, "rec_id", "name", maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(
      10L -> ((10L, 3L)), 11L -> ((10L, 3L)), 12L -> ((10L, 3L)),
      20L -> ((20L, 1L)), 30L -> ((30L, 1L))))
  }

  test("erClusters is partition-invariant") {
    val recs = Seq(
      (1L, "alpha inc"), (2L, "alpha inx"), (3L, "alpha ic"),
      (4L, "beta gmbh"), (5L, "beta gmb"))
    val a = graft.operators.Linkage
      .erClusters(recs.toDF("rec_id", "name").repartition(1),
        "rec_id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = graft.operators.Linkage
      .erClusters(recs.toDF("rec_id", "name").repartition(7),
        "rec_id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.map(_._1) == (1L to 5L).toSet)
  }

  test("chi2Assoc: hand-computed terms, exact integer micro-units") {
    val df = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "u"),
      ("y", "v")).toDF("a", "b")
    val out = graft.operators.Profiling.chi2Assoc(df, "a", "b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // N=5; rows x=2 y=3; cols u=3 v=2; term = (n·N−r·c)²·10⁶ div (r·c·N)
    assert(out(("x", "u")) == ((1L, 2L, 3L, 1000000L / 30)))
    assert(out(("x", "v")) == ((1L, 2L, 2L, 1000000L / 20)))
    assert(out(("y", "u")) == ((2L, 3L, 3L, 1000000L / 45)))
    assert(out(("y", "v")) == ((1L, 3L, 2L, 1000000L / 30)))
  }

  test("ksDrift: hand-computed distance, identical samples, full shift") {
    import org.apache.spark.sql.functions.{col, lit}
    // group g: ref {1,2,3}, cur {2,3,4} — ECDF cross diffs at
    // v=1: |1·3−0·3|=3, v=2: |2·3−1·3|=3, v=3: |3·3−2·3|=3,
    // v=4: |3·3−3·3|=0 → D=3, ks_micro = 3·10⁶ div 9 = 333333
    val df = Seq(("g", 1L, 1), ("g", 2L, 1), ("g", 3L, 1),
      ("g", 2L, 0), ("g", 3L, 0), ("g", 4L, 0),
      // group h: identical samples → D = 0
      ("h", 5L, 1), ("h", 6L, 1), ("h", 5L, 0), ("h", 6L, 0),
      // group i: disjoint ranges → D = n1·n2 → ks_micro = 10⁶
      ("i", 1L, 1), ("i", 2L, 1), ("i", 9L, 0))
      .toDF("g", "v", "r")
    val out = graft.operators.Profiling
      .ksDrift(df, "g", "v", col("r") === lit(1))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("g") == ((3L, 3L, 333333L)))
    assert(out("h") == ((2L, 2L, 0L)))
    assert(out("i") == ((2L, 1L, 1000000L)))
    // a group with one empty side is excluded
    val oneSided = Seq(("z", 1L, 1), ("z", 2L, 1)).toDF("g", "v", "r")
    assert(graft.operators.Profiling
      .ksDrift(oneSided, "g", "v", col("r") === lit(1)).count() == 0)
  }

  test("chi2Assoc: independent columns give all-zero terms") {
    // perfectly proportional 2×2: n = row·col/N exactly
    val rows = Seq.fill(2)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
      Seq.fill(4)(("y", "u")) ++ Seq.fill(4)(("y", "v"))
    val out = graft.operators.Profiling
      .chi2Assoc(rows.toDF("a", "b"), "a", "b")
      .collect().map(_.getLong(5))
    assert(out.length == 4 && out.forall(_ == 0L))
  }

  test("topKGuaranteedByGroup: exact counts per group, contract holds under eviction") {
    // group g1: one heavy item + many singletons around a capacity-2
    // sketch (genuine eviction); g2 isolated with its own counts
    val g1 = Seq.fill(10)(("g1", "hot")) ++
      ('a' to 'j').map(c => ("g1", c.toString))
    val g2 = Seq.fill(3)(("g2", "only")) ++ Seq(("g2", "x"))
    val out = graft.operators.Sketches.topKGuaranteedByGroup(
      (g1 ++ g2).toDF("grp", "item").repartition(5), "grp", "item",
      k = 3, capacity = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3))))
      .toMap
    // per-group exact top-3, ties alphabetical; every flag must be 1
    // (the two-sided MG bound is a theorem under any merge order)
    assert(out(("g1", "hot")) == ((10L, 1)))
    assert(out(("g1", "a")) == ((1L, 1)) && out(("g1", "b")) == ((1L, 1)))
    assert(out(("g2", "only")) == ((3L, 1)) && out(("g2", "x")) == ((1L, 1)))
    assert(out.size == 5)
  }

  test("KMinPairs: exact k-min under any partitioning, bounded state") {
    import org.apache.spark.sql.GraftColumnBridge
    val rows = (1L to 500L).map(i => ((i * 7919) % 1000, i))
    val want = rows.sorted.take(7)
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("a", "b").repartition(parts)
      val got = df.agg(GraftColumnBridge.column(
          graft.plans.KMinPairs(
            GraftColumnBridge.expression(col("a")),
            GraftColumnBridge.expression(col("b")), 7)
            .toAggregateExpression()).as("r"))
        .select(explode(col("r")).as("p"))
        .select(col("p.a"), col("p.b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("reservoirPerKey equals the window-derived reservoir") {
    val events = graft.sources.Tables.load(spark, TestSpark.sfDir, "events")
    val got = graft.streaming.Speed
      .reservoirPerKey(events, "event_type", "event_id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(substring(md5(col("event_id").cast("string")), 1, 13).desc,
        col("event_id").asc)
    val want = events
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 5)
      .select(col("event_type"), col("event_id"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("hammingPairs: pigeonhole bands complete at hamming 3, cut at 4") {
    // base signature plus variants at hamming 1..4; the 3 flipped
    // bits of h3 land in THREE different bands (positions 1, 17, 33),
    // so the pair survives only because one band is still intact —
    // the completeness edge the pigeonhole argument lives on
    val base = 0x0123456789ABCDEFL
    val sigs = Seq(
      (1L, base),
      (2L, base ^ 1L),                          // hamming 1
      (3L, base ^ (1L << 1) ^ (1L << 17) ^ (1L << 33)), // hamming 3
      (4L, base ^ (1L << 2) ^ (1L << 18) ^ (1L << 34) ^ (1L << 50)) // 4
    ).toDF("id", "sig")
    val got = graft.operators.Dedup
      .hammingPairs(sigs, "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // (1,4) is hamming 4 — dropped; (2,3) differs in 4 bits (bit 0,
    // 1, 17, 33) — dropped; (2,4) and (3,4) likewise exceed 3
    assert(got == Set((1L, 2L, 1), (1L, 3L, 3)))
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingPairs(sigs, "id", "sig", maxHamming = 4)
    }
  }

  test("corrExact: perfect, inverse, known and degenerate correlations") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L),
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L),
      ("half", 0L, 0L), ("half", 1L, 1L), ("half", 2L, 1L),
      ("half", 3L, 2L))
      .toDF("g", "x", "y")
    val out = graft.operators.Profiling
      .corrExact(df, Seq("g"), col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(out("up") == ((3L, Some(1000000L))))
    assert(out("down") == ((3L, Some(-1000000L))))
    // zero variance on y -> NULL, like corr()
    assert(out("flat") == ((3L, None)))
    // r = cov/sqrt(vx*vy) = 10/sqrt(20*6.75)... integer moments:
    // n=4 sx=6 sy=4 sxy=9 sxx=14 syy=6; cov=4*9-24=12,
    // vx=4*14-36=20, vy=4*6-16=8 -> 12/sqrt(160)=0.9486832...
    assert(out("half") == ((4L, Some(948683L))))
  }

  private object Tables {
    def loadDocs() = graft.sources.Tables.load(spark, TestSpark.sfDir,
      "documents")
  }
}
