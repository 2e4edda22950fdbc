package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Curation, Profiling, Similarity, TextAnalysis}

/** Round-10 third-tranche operators: the in-engine Naive Bayes
  * classifier, content-defined chunking, and the key-skew
  * diagnostic. */
class ChunkClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Naive Bayes -------------------------------------------------

  test("nbClassify learns separable token models and classifies held-out docs") {
    val train = Seq(
      (1L, "buy pills now cheap pills", "spam"),
      (2L, "cheap offer buy now", "spam"),
      (3L, "meeting agenda notes", "ham"),
      (4L, "project notes review meeting", "ham")
    ).toDF("doc_id", "text", "lang")
    val test0 = Seq(
      (10L, "pills cheap cheap", "spam"),
      (11L, "meeting review agenda", "ham"),
      (12L, "buy pills", "spam")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbClassify(test0, train, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(10L -> "spam", 11L -> "ham", 12L -> "spam"))
  }

  test("nbClassify ties on all-unseen evidence break to the first label") {
    // symmetric models: equal priors, equal token totals -> a doc of
    // only unseen tokens scores identically under both labels
    val train = Seq(
      (1L, "x y", "b"), (2L, "z w", "a")
    ).toDF("doc_id", "text", "lang")
    val test0 = Seq((9L, "qq rr", "a")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbClassify(test0, train, "text", "doc_id", "lang")
      .collect()
    assert(out.length == 1 && out(0).getString(2) == "a")
  }

  test("nbClassify skips blank docs on both sides") {
    val train = Seq((1L, "x", "a"), (2L, "  ", "b")).toDF("doc_id", "text", "lang")
    val test0 = Seq((3L, "x", "a"), (4L, "", "a")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbClassify(test0, train, "text", "doc_id", "lang")
      .collect()
    // blank train doc contributes nothing (label b has no model ->
    // still a candidate? no: zero train rows for b after the filter)
    assert(out.map(_.getLong(0)).toSet == Set(3L))
    assert(out(0).getString(2) == "a")
  }

  // ---- content-defined chunking ------------------------------------

  /** Independent reimplementation of the boundary rule (used to pin
    * the constrained greedy path). */
  private def refChunks(s: String, divisor: Int, minLen: Int,
                        maxLen: Int): Seq[(Int, String)] = {
    val cps = s.codePoints.toArray
    def g(c: Int): Long = (c.toLong * 2654435761L) & 0xFFFFFFL
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var start = 0
    var i = 0
    while (i < cps.length) {
      val len = i - start + 1
      val cut =
        if (len >= maxLen) true
        else if (len < minLen || i < 3) false
        else (g(cps(i)) + 263L * g(cps(i - 1)) + 263L * 263L * g(cps(i - 2)) +
          263L * 263L * 263L * g(cps(i - 3))) % divisor == 0
      if (cut || i == cps.length - 1) {
        out += ((start + 1, new String(cps, start, i - start + 1)))
        start = i + 1
      }
      i += 1
    }
    out.toSeq
  }

  private def mkText(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var x = seed
    for (_ <- 0 until n) {
      x = x * 1103515245 + 12345
      sb.append(('a' + math.floorMod(x >> 16, 26)).toChar)
    }
    sb.toString
  }

  test("cdcChunks partitions the normalized text exactly") {
    val txt = mkText(7, 600)
    val df = Seq((1L, txt)).toDF("doc_id", "text")
    val rows = Curation.cdcChunks(df, "text", "doc_id", divisor = 32)
      .orderBy("chunk_idx").collect()
    assert(rows.length > 3)
    // contiguous cover: starts/lens chain and total equals doc length
    var expectStart = 1
    rows.foreach { r =>
      assert(r.getInt(2) == expectStart)
      expectStart += r.getInt(3)
    }
    assert(expectStart - 1 == txt.length)
    // chunk indexes are 1..k in order
    assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length))
  }

  test("cdcChunks boundaries survive a prefix edit (edit locality)") {
    val base = mkText(11, 800)
    val df = Seq((1L, base), (2L, "zzzzq " + base)).toDF("doc_id", "text")
    val byDoc = Curation.cdcChunks(df, "text", "doc_id", divisor = 32)
      .collect().groupBy(_.getLong(0))
    val a = byDoc(1L).map(_.getString(4)).toSet
    val b = byDoc(2L).map(_.getString(4)).toSet
    // everything after the first re-synchronized boundary is shared;
    // only the chunk(s) overlapping the insertion differ
    assert((a -- b).size <= 2, s"expected locality, lost ${(a -- b).size} of ${a.size}")
    assert(a.size > 8)
  }

  test("cdcChunks honors minLen/maxLen (vs independent reimplementation)") {
    val txt = mkText(23, 500)
    val df = Seq((1L, txt)).toDF("doc_id", "text")
    val got = Curation.cdcChunks(df, "text", "doc_id", divisor = 16,
        minLen = 8, maxLen = 20)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(2), r.getInt(3))).toSeq
    val ref = refChunks(txt, 16, 8, 20)
    assert(got == ref.map { case (st, c) => (st, c.length) })
    assert(got.forall { case (_, len) => len <= 20 })
    // every chunk but possibly the last respects minLen
    assert(got.dropRight(1).forall { case (_, len) => len >= 8 })
  }

  test("cdcChunks: blank doc yields no chunks; short doc yields itself") {
    val df = Seq((1L, "   "), (2L, "ab")).toDF("doc_id", "text")
    val rows = Curation.cdcChunks(df, "text", "doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
    assert(rows(0).getInt(3) == 2)
  }

  // ---- skew diagnostic ---------------------------------------------

  test("skewDiag reports top-key share and entropy") {
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), Some("c"),
      None).toDF("k")
    val r = Profiling.skewDiag(df, Seq("k")).collect()(0)
    assert(r.getString(0) == "k" && r.getLong(1) == 6L && r.getLong(2) == 4L)
    assert(r.getString(3) == "a" && r.getLong(4) == 3L)
    assert(r.getLong(5) == 500000L)
    // independent entropy derivation with the operator's exact formula
    val exp = Seq(3L, 1L, 1L, 1L).map { c =>
      math.floor(c * -math.log(c.toDouble / 6L) * 1000000.0 / 6L + 0.5).toLong
    }.sum
    assert(r.getLong(6) == exp)
  }

  test("collocations: bound phrases score high PMI, independent pairs near zero") {
    // "new york" always adjacent; "data" and "lake" co-occur only by
    // chance among filler tokens
    val docs = (0 until 40).map { i =>
      val filler = Seq("data", "lake", "spark", "scan")(i % 4)
      (i.toLong, s"new york $filler report")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", "doc_id", minCount = 5L)
      .collect().map(r => r.getString(0) -> r).toMap
    val ny = out("new york")
    assert(ny.getLong(1) == 40L && ny.getLong(2) == 40L && ny.getLong(3) == 40L)
    // c_ab=40, N=160, M=120, c_a=c_b=40 -> pmi = ln(40*160*160/(120*40*40))
    val expNy = math.floor(math.log(40.0 * 160 * 160 / (120.0 * 40 * 40)) * 1e6 + 0.5).toLong
    assert(ny.getLong(4) == expNy)
    assert(!out.contains("data lake"), "non-adjacent pair must not appear")
    // every reported bigram respects minCount
    assert(out.values.forall(_.getLong(1) >= 5L))
  }

  test("psiDrift: identical halves score ~zero, shifted halves fire") {
    val same = (0 until 400).map(i => (i % 2 == 0, ((i / 2) % 10) * 5.0))
      .toDF("is_ref", "v")
    val calm = graft.operators.Profiling.psiDrift(same, "v", col("is_ref"))
      .agg(sum(abs(col("psi_term_micro")))).collect()(0).getLong(0)
    assert(calm < 1000L, s"identical halves should be calm, got $calm")
    val shifted = ((0 until 200).map(i => (true, 10.0)) ++
      (0 until 200).map(i => (false, 90.0))).toDF("is_ref", "v")
    val out = graft.operators.Profiling.psiDrift(shifted, "v", col("is_ref"))
      .collect().map(r => r.getInt(0) -> r).toMap
    // bucket 2 (1000 cents / 500) holds all ref; bucket 18 all cur
    assert(out(2).getLong(1) == 200L && out(2).getLong(2) == 0L)
    assert(out(18).getLong(1) == 0L && out(18).getLong(2) == 200L)
    // exact term: p=(200+1)/(200+20), q=(0+1)/(200+20)
    val p = 201.0 / 220.0; val q = 1.0 / 220.0
    val exp = math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
    assert(out(2).getLong(3) == exp)
    val total = out.values.map(_.getLong(3)).sum
    assert(total > 2000000L, s"full shift must dwarf the 0.2-nat alarm, got $total")
  }

  test("psiDrift clamps out-of-range values into the edge buckets") {
    val df = Seq((true, -50.0), (true, 4.0), (false, 9999.0))
      .toDF("is_ref", "v")
    val buckets = graft.operators.Profiling.psiDrift(df, "v", col("is_ref"))
      .collect().map(_.getInt(0)).toSet
    assert(buckets == Set(0, 19))
  }

  test("cdcDedupStats: cloned docs read fully duplicated, distinct docs clean") {
    val shared = mkText(31, 700)
    // independent stream: a shared 30+ char chunk has ~26^-30 odds
    val other = mkText(41, 700)
    val df = Seq((1L, shared), (2L, shared), (3L, other))
      .toDF("doc_id", "text")
    val out = Curation.cdcDedupStats(df, "text", "doc_id", divisor = 32)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(4) == 1000000L && out(2L).getLong(4) == 1000000L)
    assert(out(3L).getLong(3) == 0L && out(3L).getLong(4) == 0L)
    assert(out(1L).getLong(2) == shared.length.toLong)
  }

  // ---- tar shard export --------------------------------------------

  /** Minimal ustar reader: (name, content) entries of one tar file. */
  private def readTar(f: java.io.File): Seq[(String, Array[Byte])] = {
    val in = java.nio.file.Files.readAllBytes(f.toPath)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= in.length && in(off) != 0) {
      val name = new String(in, off, 100, "UTF-8").takeWhile(_ != 0)
      val size = java.lang.Long.parseLong(
        new String(in, off + 124, 12, "UTF-8").trim.takeWhile(_ != 0), 8)
      val content = java.util.Arrays.copyOfRange(
        in, off + 512, off + 512 + size.toInt)
      out += ((name, content))
      off += 512 + ((size + 511) / 512).toInt * 512
    }
    out.toSeq
  }

  test("exportTarShards writes parseable deterministic ustar shards") {
    val docs = (0 until 8).map(i => (i.toLong, s"document number $i " * (i + 1)))
    val df = docs.toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_tar_spec")
      .toString
    val manifest = graft.sources.TarShards
      .exportTarShards(df, "text", "doc_id", out, shardDocs = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.keySet == Set(0, 1, 2))
    assert(manifest(0)._1 == 3L && manifest(2)._1 == 2L)
    // each tar parses back to exactly its documents, in id order
    val byShard = docs.groupBy { case (id, _) => (id / 3).toInt }
    for ((shard, (n, bytes)) <- manifest) {
      val f = new java.io.File(out, f"shard-$shard%05d.tar")
      assert(f.length() == bytes, s"manifest bytes mismatch for shard $shard")
      val entries = readTar(f)
      assert(entries.size == n)
      val expected = byShard(shard).sortBy(_._1)
        .map { case (id, t) => (s"$id.txt", t) }
      assert(entries.map(_._1) == expected.map(_._1))
      entries.zip(expected).foreach { case ((_, got), (_, exp)) =>
        assert(new String(got, "UTF-8") == exp)
      }
    }
    // idempotent: a re-export rebuilds byte-identical shards
    val before = new java.io.File(out, "shard-00000.tar")
    val b1 = java.nio.file.Files.readAllBytes(before.toPath)
    graft.sources.TarShards.exportTarShards(df, "text", "doc_id", out, 3)
      .collect()
    val b2 = java.nio.file.Files.readAllBytes(before.toPath)
    assert(java.util.Arrays.equals(b1, b2))
  }

  // ---- JL sign projection ------------------------------------------

  test("randomProject matches an independent reimplementation and is shape-stable") {
    def rnd(seed: Int, n: Int): Array[Float] = {
      var x = seed
      Array.fill(n) {
        x = x * 1103515245 + 12345
        ((x >> 8) % 1000) / 1000.0f
      }
    }
    val vecs = (0 until 20).map(i => (i.toLong, rnd(i + 1, 64).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Similarity.randomProject(df, "embedding", "vec_id", kOut = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == 20 * 16)
    // independent re-derivation: same md5 parity matrix, same micro math
    def sign(i: Int, j: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_${j}".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) 1 else -1
    }
    for ((id, emb) <- vecs; j <- 0 until 16) {
      val exp = emb.zipWithIndex.map { case (e, i) =>
        sign(i, j) * math.floor(e.toDouble * 1e6 + 0.5).toLong
      }.sum
      assert(got((id, j)) == exp, s"vec $id dim $j")
    }
    // JL sanity: projected energy ~ k * input energy (sign matrices
    // preserve norms in expectation; wide tolerance, deterministic data)
    val ratios = vecs.map { case (id, emb) =>
      val micro = emb.map(e => math.floor(e.toDouble * 1e6 + 0.5))
      val inE = micro.map(m => m * m).sum
      val outE = (0 until 16).map(j => math.pow(got((id, j)).toDouble, 2)).sum
      outE / (16.0 * inE)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"JL energy ratio off: $mean")
  }

  // ---- weighted sampling -------------------------------------------

  test("weightedSample equals the Efraimidis-Spirakis reference and favors weight") {
    val rows = (0 until 60).map(i =>
      (i.toLong, if (i == 7) "g1" else "g1", if (i == 7) 100000L else 1L))
    val df = rows.toDF("id", "grp", "w")
    val got = Analytics.weightedSample(df, Seq("grp"), "id", "w", k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getInt(3)))
    // independent reference with the same hash-uniform
    def key(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val v = java.lang.Long.parseLong(hex, 16)
      -math.log((v.toDouble + 1.0) / 4503599627370496.0) / math.max(w, 1L).toDouble
    }
    val exp = rows.sortBy { case (id, _, w) => (key(id, w), id) }
      .take(10).zipWithIndex.map { case ((id, _, _), r) => (id, r + 1) }
    assert(got.toSeq == exp)
    // the 100000x weight must put id=7 first
    assert(got.head._1 == 7L)
    // structural: ranks are 1..k
    assert(got.map(_._2).toSeq == (1 to 10))
  }

  test("weightedSample is partitioning-invariant") {
    val df = (0 until 50).map(i => (i.toLong, s"g${i % 3}", (i % 7 + 1).toLong))
      .toDF("id", "grp", "w")
    val a = Analytics.weightedSample(df.repartition(1), Seq("grp"), "id", "w", 5)
      .select("id", "grp", "rank").collect().map(_.toSeq).toSet
    val b = Analytics.weightedSample(df.repartition(8, col("id")), Seq("grp"),
        "id", "w", 5)
      .select("id", "grp", "rank").collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("skewDiag ties break to the smaller key; uniform keys hit ln(k) ceiling") {
    val df = Seq("b", "a", "a", "b").toDF("k")
    val r = Profiling.skewDiag(df, Seq("k")).collect()(0)
    assert(r.getString(3) == "a" && r.getLong(4) == 2L)
    // two uniform keys: entropy = ln 2 in micro-nats (to floor rounding)
    assert(math.abs(r.getLong(6) - 693147L) <= 1L)
  }
}
