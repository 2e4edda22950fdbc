package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")
  lazy val embeddings = Tables.load(spark, TestSpark.sfDir, "embeddings")

  /** documents ∪ lightly-mutated copies (planted near-dups). */
  lazy val planted = {
    val mutated = docs.where($"doc_id" < 3)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" appended tail word")).as("text"),
        $"lang", $"source", $"n_chars")
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .union(mutated)
  }

  test("Dedup.exact collapses exact copies") {
    val withCopy = docs.select("doc_id", "text")
      .union(docs.where($"doc_id" === 7)
        .select(($"doc_id" + 500000).as("doc_id"), $"text"))
    val out = Dedup.exact(withCopy, "text", "doc_id")
    assert(out.where($"n_copies" === 2).count() == 1)
    assert(out.where($"n_copies" === 2).head().getAs[Long]("keep_doc_id") == 7L)
  }

  test("fused minhash signature kernel is bit-identical to the composed reference") {
    // adversarial inputs for the byte-window rolling: multi-byte UTF8
    // (2/3/4-byte code points), shorter-than-n, empty, repeats, and a
    // slice of the real corpus; the reference is the explode +
    // min-aggregate formulation over independently-tested builtins
    val tricky = Seq(
      (1L, "hello world hello world"),
      (2L, "héllo wörld ünïcode ärger"),
      (3L, "日本語のテキストです 日本語"),
      (4L, "emoji 👍🏽 mix 日本 and ascii"),
      (5L, "abc"), (6L, "a"), (7L, ""),
      (8L, "aaaaaaaaaaaaaaaaaaaaa"),
      (9L, "  spaced   out\t\ttext \n lines "),
      (10L, "ПРИВЕТ мир ПРИВЕТ мир кирилица"))
      .toDF("doc_id", "text")
    val corpusHead = docs.where($"doc_id" < 40).select("doc_id", "text")
    for (df <- Seq(tricky, corpusHead); perms <- Seq(8, 64)) {
      val fused = Dedup.minhashSignatures(df, "text", "doc_id", 5, perms)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = Dedup
        .minhashSignaturesComposed(df, "text", "doc_id", 5, perms)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused == composed)
    }
    // null text: both formulations drop the row
    val withNull = Seq((1L, "some text"), (2L, null)).toDF("doc_id", "text")
    assert(Dedup.minhashSignatures(withNull, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("fused OPH kernel is bit-identical to the composed reference") {
    val tricky = Seq(
      (1L, "hello world hello world"),
      (2L, "héllo wörld ünïcode ärger"),
      (3L, "日本語のテキストです 日本語"),
      (4L, "short"), (5L, "a"), (6L, ""),
      (7L, "aaaaaaaaaaaaaaaaaaaaa"))
      .toDF("doc_id", "text")
    val corpusHead = docs.where($"doc_id" < 40).select("doc_id", "text")
    for (df <- Seq(tricky, corpusHead); perms <- Seq(16, 64)) {
      val fused = Dedup.minhashSignaturesOPH(df, "text", "doc_id", 5, perms)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = Dedup
        .minhashSignaturesOPHComposed(df, "text", "doc_id", 5, perms)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused == composed, s"perms=$perms")
    }
  }

  test("fused word-ngram set kernel equals the composed reference") {
    import graft.functions.TextFns
    val tricky = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b a b a b"),                     // repeated grams collapse
      (3L, "héllo wörld ünïcode ärger tokens here"),
      (4L, "one two"), (5L, "one"), (6L, ""), (7L, "   "),
      (8L, "日本語 の テキスト です ね"))
      .toDF("doc_id", "text")
    val corpusHead = docs.where($"doc_id" < 40).select("doc_id", "text")
    for (df <- Seq(tricky, corpusHead); n <- Seq(2, 3)) {
      val base = df.select($"doc_id",
        TextFns.normalizeText($"text").as("__norm"))
      val fused = base.select($"doc_id",
        TextFns.wordNgramSetFromNorm($"__norm", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val composed = base.select($"doc_id",
        TextFns.wordNgramSetFromToks(TextFns.tokens($"__norm"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fused == composed, s"n=$n")
    }
  }

  test("fused simhash kernel is bit-identical to the composed reference") {
    val tricky = Seq(
      (1L, "hello world hello world"),
      (2L, "héllo wörld ünïcode ärger tokens"),
      (3L, "日本語 の テキスト です"),
      (4L, "mixed 👍🏽 emoji and nbsp glue"),
      (5L, "one"), (6L, ""), (7L, "   "),
      (8L, "a b a b a b a b"),
      (9L, "  leading and   trailing \t\n whitespace "),
      (10L, "ПРИВЕТ мир кирилица"))
      .toDF("doc_id", "text")
    val corpusHead = docs.where($"doc_id" < 40).select("doc_id", "text")
    for (df <- Seq(tricky, corpusHead)) {
      val fused = Dedup.simhash(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val composed = Dedup.simhashComposed(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fused == composed)
    }
    // null text keeps its row and hashes to 0 in both
    val withNull = Seq((1L, "some text"), (2L, null)).toDF("doc_id", "text")
    val f = Dedup.simhash(withNull, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = Dedup.simhashComposed(withNull, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == c && f(2L) == 0L)
  }

  test("fused winnowing kernel is bit-identical to the composed reference") {
    import graft.operators.TextAnalysis
    val tricky = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "héllo wörld ünïcode ärger"),
      (3L, "日本語のテキストです日本語"),
      (4L, "aaaaaaaaaaaaaaaaaaaa"),           // all-equal hashes: tie rule
      (5L, "abc"), (6L, "a"), (7L, ""),       // shorter than k
      (8L, "abcdefg"),                        // fewer grams than w
      (9L, "abab abab abab abab abab"),       // periodic: repeated selections
      (10L, "emoji 👍🏽 mix"))
      .toDF("doc_id", "text")
    val corpusHead = docs.where($"doc_id" < 40).select("doc_id", "text")
    for (df <- Seq(tricky, corpusHead); (k, w) <- Seq((5, 4), (3, 5))) {
      val fused = TextAnalysis.winnowingFingerprints(df, "text", "doc_id", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val composed = TextAnalysis
        .winnowingFingerprintsComposed(df, "text", "doc_id", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(fused == composed, s"k=$k w=$w")
      // the fused path emits no duplicates to begin with
      assert(TextAnalysis.winnowingFingerprints(df, "text", "doc_id", k, w)
        .count() == fused.size)
    }
  }

  test("Dedup.minhashPairs finds planted near-duplicates") {
    val pairs = Dedup.minhashPairs(planted, "text", "doc_id",
      threshold = 0.5).collect()
    for (id <- 0 until 3)
      assert(pairs.exists(r => r.getAs[Long]("doc_a") == id &&
        r.getAs[Long]("doc_b") == id + 100000),
        s"planted pair $id not found")
  }

  test("salted candidate stage yields exactly the unsalted pair set " +
      "on a hot-bucket corpus") {
    // synthetic skew: 120 near-identical boilerplate docs share (most
    // of) their shingles, so they land in the same LSH buckets — the
    // shape where the unsalted bucket self-join piles one bucket's
    // quadratic pair-space onto one task
    val boiler = (0 until 120).map { i =>
      (700000L + i,
        "terms of service apply to all users of this website including " +
          s"without limitation section $i of the governing agreement")
    }.toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").union(boiler)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))
    val plain = Dedup.minhashPairs(corpus, "text", "doc_id",
      threshold = 0.2).collect().map(key).toSet
    val salted = Dedup.minhashPairs(corpus, "text", "doc_id",
      threshold = 0.2, salts = 8).collect().map(key).toSet
    assert(plain.nonEmpty, "hot-bucket corpus produced no pairs")
    assert(salted == plain,
      s"salted/unsalted diverge: only-plain=${(plain -- salted).take(5)} " +
        s"only-salted=${(salted -- plain).take(5)}")
    // the boilerplate block must actually be paired (not cap-dropped):
    // 120 docs in-bucket is under the 1000 cap
    assert(plain.count { case (a, b, _) => a >= 700000L && b >= 700000L }
      > 1000, "expected a quadratic boilerplate pair block")
  }

  test("salted simhash band join yields exactly the unsalted pair set " +
      "on a hot-band corpus") {
    // identical boilerplate text → identical simhashes → one hot band
    // bucket per band; plus the real corpus for background pairs
    val boiler = (0 until 80).map { i =>
      (800000L + i, "all rights reserved contact the site administrator " +
        "for permissions and takedown requests")
    }.toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").union(boiler)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))
    val plain = Dedup.simhashPairs(corpus, "text", "doc_id",
      maxHamming = 3).collect().map(key).toSet
    val salted = Dedup.simhashPairs(corpus, "text", "doc_id",
      maxHamming = 3, salts = 8).collect().map(key).toSet
    assert(plain.count { case (a, b, _) => a >= 800000L && b >= 800000L }
      == 80 * 79 / 2, "identical docs must all pair")
    assert(salted == plain,
      s"salted/unsalted diverge: only-plain=${(plain -- salted).take(5)} " +
        s"only-salted=${(salted -- plain).take(5)}")
  }

  test("delta minhash pairs equal the full run restricted to new docs") {
    val oldDocs = docs.select("doc_id", "text")
    val newDocs = docs.where($"doc_id".isin(4L, 9L))
      .select(($"doc_id" + 200000).as("doc_id"),
        concat($"text", lit(" tiny suffix")).as("text"))
      .union(Seq((300000L, "a brand new unique document about nothing else"))
        .toDF("doc_id", "text"))
    val existingSigs = Dedup.minhashSignatures(oldDocs, "text", "doc_id")
    val delta = Dedup.minhashPairsDelta(newDocs, "text", "doc_id",
        existingSigs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the planted near-dups of old docs are found without re-scanning
    // the old corpus text
    assert(delta.contains((4L, 200004L)) && delta.contains((9L, 200009L)))
    // exact agreement with the full recompute, restricted to pairs
    // that touch a new doc
    val fullAll = Dedup.minhashPairs(oldDocs.union(newDocs), "text",
        "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = fullAll.filter(p => p._1 >= 200000L || p._2 >= 200000L)
    assert(delta == full, s"delta $delta vs full $full")
  }

  test("delta minhash handles re-ingested ids without duplicate pairs") {
    val oldDocs = docs.select("doc_id", "text")
    // doc 4 RE-INGESTED with changed text, plus one genuinely new doc
    val newDocs = docs.where($"doc_id" === 4L)
      .select($"doc_id", concat($"text", lit(" re-ingested tail")).as("text"))
      .union(docs.where($"doc_id" === 9L)
        .select(($"doc_id" + 200000).as("doc_id"),
          concat($"text", lit(" tiny suffix")).as("text")))
    val existingSigs = Dedup.minhashSignatures(oldDocs, "text", "doc_id")
    val delta = Dedup.minhashPairsDelta(newDocs, "text", "doc_id",
        existingSigs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the doubled id must not duplicate/inflate candidate rows
    assert(delta.distinct.length == delta.length, s"duplicated pairs: ${delta.toSeq}")
    // and the re-ingested doc participates through its FRESH signature:
    // exact agreement with a full recompute over (old - doc4) + delta
    val full = Dedup.minhashPairs(
        oldDocs.where($"doc_id" =!= 4L).union(newDocs), "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 == 4L || p._2 == 4L ||
        p._1 >= 200000L || p._2 >= 200000L)
    assert(delta.toSet == full, s"delta ${delta.toSet} vs full $full")
  }

  test("signature table lives in the snapshot layer; delta pairs off the lake") {
    import graft.sources.LakeWriter
    val table = java.nio.file.Files.createTempDirectory("graft_sigsnap").toString
    val oldDocs = docs.select("doc_id", "text")
    assert(Dedup.upsertSignatureSnapshot(oldDocs, "text", "doc_id", table) == 1L)
    // daily load, all-new ids: append commit is METADATA-ONLY on v1
    val newDocs = docs.where($"doc_id".isin(4L, 9L))
      .select(($"doc_id" + 200000).as("doc_id"),
        concat($"text", lit(" tiny suffix")).as("text"))
    assert(Dedup.upsertSignatureSnapshot(newDocs, "text", "doc_id", table) == 2L)
    assert(LakeWriter.snapshotFiles(spark, table, 2L).exists(_.contains("/v1-")),
      "append did not carry v1 signature files as metadata")
    // incremental pairs straight off the LAKE table == full recompute
    // restricted to pairs touching the delta
    val delta = Dedup.minhashPairsDelta(newDocs, "text", "doc_id",
        LakeWriter.readSnapshot(spark, table), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta.contains((4L, 200004L)) && delta.contains((9L, 200009L)))
    val full = Dedup.minhashPairs(oldDocs.union(newDocs), "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 >= 200000L || p._2 >= 200000L)
    assert(delta == full, s"delta $delta vs full $full")
    // re-ingestion: the same id arrives again -> overwrite commit keeps
    // exactly one (fresh) signature row per doc; v2 still time-travels
    val reingest = docs.where($"doc_id" === 4L)
      .select($"doc_id", concat($"text", lit(" v2")).as("text"))
    assert(Dedup.upsertSignatureSnapshot(reingest, "text", "doc_id", table) == 3L)
    val snap = LakeWriter.readSnapshot(spark, table)
    assert(snap.count() == oldDocs.count() + 2)
    assert(snap.where($"doc_id" === 4L).count() == 1)
    assert(LakeWriter.readSnapshot(spark, table, Some(2L)).count() ==
      oldDocs.count() + 2)
  }

  test("one-permutation MinHash signatures track the classic ones") {
    val sigs = Dedup.minhashSignaturesOPH(planted, "text", "doc_id")
    def sig(id: Long) = sigs.where($"doc_id" === id).head()
      .getAs[scala.collection.Seq[Long]]("sig")
    // identical docs -> identical signatures, correct width, dense
    assert(sig(0L).length == 64 && !sig(0L).contains(null))
    // planted near-dups agree on most slots; unrelated docs on few
    def agree(a: Long, b: Long) =
      sig(a).zip(sig(b)).count { case (x, y) => x == y }
    for (id <- 0L until 3L)
      assert(agree(id, id + 100000) > 32, s"near-dup $id agreement low")
    assert(agree(0L, 1L) < 16, "unrelated docs should rarely agree")
  }

  test("Dedup.simhash of identical docs is identical; near-dups close") {
    val sh = Dedup.simhash(planted, "text", "doc_id")
    val a = sh.where($"doc_id" === 0).head().getAs[Long]("simhash")
    val b = sh.where($"doc_id" === 100000).head().getAs[Long]("simhash")
    assert(java.lang.Long.bitCount(a ^ b) <= 12) // near, not equal
  }

  test("Dedup.ngramJaccard verifies LSH candidates") {
    val cand = Seq((0L, 100000L), (0L, 1L)).toDF("doc_a", "doc_b")
    val j = Dedup.ngramJaccard(cand, planted, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 100000L)) > 0.8)   // planted near-dup
    assert(j((0L, 1L)) < 0.5)        // unrelated docs
  }

  test("Similarity.bruteForceTopK: identical vector ranks first with cos 1") {
    val q = embeddings.where($"vec_id" === 0)
      .select(($"vec_id" + 900000).as("vec_id"), $"embedding")
    val top = Similarity.bruteForceTopK(q, embeddings, "vec_id", "embedding", 3)
    val first = top.where($"rank" === 1).head()
    assert(first.getAs[Long]("neighbor_id") == 0L)
    assert(first.getAs[Double]("cos_sim") == 1.0)
  }

  test("Similarity.lshTopK finds the identical vector (same bucket)") {
    val q = embeddings.where($"vec_id" === 5)
      .select(($"vec_id" + 900000).as("vec_id"), $"embedding")
    val top = Similarity.lshTopK(q, embeddings, "vec_id", "embedding",
      k = 3, bits = 8, dim = 64)
    assert(top.where($"rank" === 1).head().getAs[Long]("neighbor_id") == 5L)
  }

  test("Similarity.lshTopK recalls planted near-duplicates, guaranteed") {
    // LSH's contract is NEAR-DUP recall, not arbitrary top-k on
    // near-orthogonal noise (where sharing all `bits` hyperplane signs
    // is rare by construction — the honest recall there is IVF's
    // multi-probe job). A scaled copy keeps every sign
    // (sign(0.5v·h) = sign(v·h)), so it MUST share the bucket and
    // rank first with cos 1 — recall of planted near-dups is 5/5
    // deterministically, not probabilistically.
    val twins = embeddings.where($"vec_id" < 5)
      .select(($"vec_id" + 1000).as("vec_id"),
        transform($"embedding", x => (x * lit(0.5f)).cast("float"))
          .as("embedding"))
    val corpus2 = embeddings.select($"vec_id", $"embedding")
      .unionByName(twins)
    val qs = embeddings.where($"vec_id" < 5)
    val top1 = Similarity.lshTopK(qs, corpus2, "vec_id", "embedding",
        k = 3, bits = 8, dim = 64)
      .where($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim")))).toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) == ((q + 1000, 1.0)), s"query $q got ${top1.get(q)}")
    }
  }

  test("Similarity.ivfTopK recalls planted near-duplicates, guaranteed") {
    // cell assignment scores v·c/||c|| — scale-invariant in v's
    // direction — so a scaled copy lands in ITS ORIGINAL's argmax
    // cell, and the original-as-query probes that same cell first
    // (nprobe >= 1). Twin recall is therefore deterministic, not a
    // recall-curve property: rank 1, cosine exactly 1.
    val twins = embeddings.where($"vec_id" < 5)
      .select(($"vec_id" + 1000).as("vec_id"),
        transform($"embedding", x => (x * lit(0.5f)).cast("float"))
          .as("embedding"))
    val corpus2 = embeddings.select($"vec_id", $"embedding")
      .unionByName(twins)
    val qs = embeddings.where($"vec_id" < 5)
    val top1 = Similarity.ivfTopK(qs, corpus2, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 2)
      .where($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim")))).toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) == ((q + 1000, 1.0)), s"query $q got ${top1.get(q)}")
    }
  }

  test("ANN recall@10 vs brute force is pinned (quality, not plumbing)") {
    // everything is deterministic (hash-order init, no rand()), so
    // recall on this corpus is a FIXED number — the floors pin the
    // approximation quality against silent kernel regressions
    val qs = embeddings.where($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
        "embedding", k = 10)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val lsh = recallOf(Similarity.lshTopK(qs, embeddings, "vec_id",
      "embedding", k = 10, bits = 4, dim = 64))
    val ivf = recallOf(Similarity.ivfTopK(qs, embeddings, "vec_id",
      "embedding", k = 10, nlist = 16, nprobe = 4))
    info(f"recall@10: lsh(bits=4)=$lsh%.3f ivf(16/4)=$ivf%.3f")
    // ivf probes 4/16 of the corpus and must beat blind 25% sampling;
    // lsh at 4 bits touches ~1/16 per bucket — weaker by design
    assert(ivf >= 0.35, f"ivf recall@10 regressed: $ivf%.3f")
    assert(lsh >= 0.10, f"lsh recall@10 regressed: $lsh%.3f")
  }

  test("quantized-tier recall@10 floors are pinned (PQ/OPQ/IVF-PQ)") {
    // same determinism as above; floors sit just under the measured
    // values (0.940 / 0.930 / 0.800 / 0.815 — docs/ann_recall.md at
    // ksub=256) so a codebook-quality or kernel regression fails
    // loudly while leaving room for corpus-regeneration jitter
    val qs = embeddings.where($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
        "embedding", k = 10)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val pq = recallOf(Similarity.pqTopK(qs, embeddings, "vec_id",
      "embedding", k = 10))
    val opq = recallOf(Similarity.opqTopK(qs, embeddings, "vec_id",
      "embedding", k = 10))
    val ivfpq = recallOf(Similarity.ivfPqTopK(qs, embeddings, "vec_id",
      "embedding", k = 10, nprobe = 8))
    val refine = recallOf(Similarity.ivfPqRefineTopK(qs, embeddings,
      "vec_id", "embedding", k = 10, nprobe = 8))
    info(f"recall@10: pq=$pq%.3f opq=$opq%.3f " +
      f"ivfpq(8)=$ivfpq%.3f refine(8)=$refine%.3f")
    assert(pq >= 0.85, f"pq recall@10 regressed: $pq%.3f")
    assert(opq >= 0.85, f"opq recall@10 regressed: $opq%.3f")
    assert(ivfpq >= 0.70, f"ivfpq recall@10 regressed: $ivfpq%.3f")
    // refine must not fall below the unrefined PQ stage it re-ranks
    assert(refine >= ivfpq - 0.01,
      f"refine recall@10 ($refine%.3f) below unrefined ($ivfpq%.3f)")
  }

  test("sampled codebook training (trainFraction=0.5) keeps the recall floors") {
    // the 100 TB posture: Lloyd trainers see a deterministic hash
    // sample of the corpus while ENCODING still streams every row.
    // Quantizer quality saturates well before full-corpus training,
    // so the SAME floors as the full-training spec must hold.
    val qs = embeddings.where($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
        "embedding", k = 10)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    spark.conf.set("spark.graft.ann.trainFraction", "0.5")
    try {
      val ivf = recallOf(Similarity.ivfTopK(qs, embeddings, "vec_id",
        "embedding", k = 10, nlist = 16, nprobe = 4))
      val pq = recallOf(Similarity.pqTopK(qs, embeddings, "vec_id",
        "embedding", k = 10))
      val opq = recallOf(Similarity.opqTopK(qs, embeddings, "vec_id",
        "embedding", k = 10))
      val ivfpq = recallOf(Similarity.ivfPqTopK(qs, embeddings, "vec_id",
        "embedding", k = 10, nprobe = 8))
      val refine = recallOf(Similarity.ivfPqRefineTopK(qs, embeddings,
        "vec_id", "embedding", k = 10, nprobe = 8))
      info(f"sampled-train recall@10: ivf=$ivf%.3f pq=$pq%.3f " +
        f"opq=$opq%.3f ivfpq(8)=$ivfpq%.3f refine(8)=$refine%.3f")
      assert(ivf >= 0.35, f"sampled ivf recall regressed: $ivf%.3f")
      assert(pq >= 0.85, f"sampled pq recall regressed: $pq%.3f")
      assert(opq >= 0.85, f"sampled opq recall regressed: $opq%.3f")
      assert(ivfpq >= 0.70, f"sampled ivfpq recall regressed: $ivfpq%.3f")
      assert(refine >= ivfpq - 0.01,
        f"sampled refine recall ($refine%.3f) below unrefined ($ivfpq%.3f)")
    } finally spark.conf.unset("spark.graft.ann.trainFraction")
  }

  test("trainFraction=1.0 (default) is byte-identical to unset") {
    // the knob's default path must not perturb the full-training
    // codes: same PQ codes table with the conf explicitly 1.0
    val base = Similarity.pqCodes(embeddings, "vec_id", "embedding")._1
      .collect().map(_.toString).sorted
    spark.conf.set("spark.graft.ann.trainFraction", "1.0")
    try {
      val again = Similarity.pqCodes(embeddings, "vec_id", "embedding")._1
        .collect().map(_.toString).sorted
      assert(base.sameElements(again))
    } finally spark.conf.unset("spark.graft.ann.trainFraction")
  }

  test("Multimodal.audioResampleLinear: endpoints exact, interp by hand") {
    // payload "aceg" -> samples (ascii-128): -31,-29,-27,-25; resample
    // to 7: positions i*3/6 -> 0,0.5,1,1.5,2,2.5,3 -> linear midpoints
    val media = Seq((1L, "aceg".getBytes("UTF-8"))).toDF("media_id", "payload")
    val out = Multimodal.audioResampleLinear(media, outLen = 7)
      .orderBy($"sample_idx").collect().map(_.getDouble(2))
    assert(out.sameElements(
      Array(-31.0, -30.0, -29.0, -28.0, -27.0, -26.0, -25.0)))
    // constant signal is invariant under resampling at any length
    val const = Seq((2L, Array.fill(10)('x'.toByte))).toDF("media_id", "payload")
    val cOut = Multimodal.audioResampleLinear(const, outLen = 23)
      .select($"sample").collect().map(_.getDouble(0)).distinct
    assert(cOut.sameElements(Array(('x'.toInt - 128).toDouble)))
    // 1-sample payload constant-extends; empty payload yields no rows
    val one = Seq((3L, Array('z'.toByte)),
      (4L, Array.empty[Byte])).toDF("media_id", "payload")
    val oOut = Multimodal.audioResampleLinear(one, outLen = 5).collect()
    assert(oOut.length == 5 && oOut.forall(_.getLong(0) == 3L))
  }

  test("VecFns.lshSignature native (literal hyperplanes) == composed") {
    import graft.functions.VecFns
    val native = embeddings.select($"vec_id",
      VecFns.lshSignature($"embedding", 8, 64).as("sig"))
    val composed = embeddings.select($"vec_id",
      VecFns.lshSignatureComposed($"embedding", 8, 64).as("sig"))
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("Similarity.ivfTopK probes the right cell and beats random recall") {
    // a query identical to a corpus vector must land in that vector's
    // cell (it IS that vector) and rank it first with cos 1
    val q = embeddings.where($"vec_id" === 3)
      .select(($"vec_id" + 900000).as("vec_id"), $"embedding")
    val top = Similarity.ivfTopK(q, embeddings, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 1)
    val first = top.where($"rank" === 1).head()
    assert(first.getAs[Long]("neighbor_id") == 3L)
    assert(first.getAs[Double]("cos_sim") == 1.0)
    // recall vs brute force over several queries: probing half the
    // cells should recover well over half of the true top-k
    val qs = embeddings.where($"vec_id" < 5)
    val ivf = Similarity.ivfTopK(qs, embeddings, "vec_id", "embedding",
      k = 5, nlist = 4, nprobe = 2)
      .select($"query_id", $"neighbor_id")
    val exact = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
      "embedding", k = 5).select($"query_id", $"neighbor_id")
    val hit = ivf.intersect(exact).count()
    assert(hit >= 13, s"IVF recall too low: $hit/25")
  }

  test("TextAnalysis token counts and quality on known text") {
    val df = Seq((1L, "The cat, sat; on 42 mats!"), (2L, "   "))
      .toDF("doc_id", "text")
    val tc = TextAnalysis.tokenCounts(df, "text", "doc_id")
    assert(tc.where($"doc_id" === 1).head().getAs[Int]("n_tokens_ws") == 6)
    assert(tc.where($"doc_id" === 2).head().getAs[Int]("n_tokens_ws") == 0)
    val q = TextAnalysis.qualityScore(df, "text", "doc_id")
      .where($"doc_id" === 1).head()
    assert(q.getAs[Int]("n_punct") == 3)
    assert(q.getAs[Int]("n_digits") == 2)
    assert(q.getAs[Int]("n_stopwords") == 1) // the ("on" is not in the list)
  }

  test("winnowing fingerprints: identity, near-dup overlap, substring guarantee") {
    val k = 5; val w = 4
    val shared = "a long shared passage that both documents quote verbatim"
    val data = Seq(
      (1L, s"first document begins here. $shared. then diverges one way"),
      (2L, s"second doc, different start. $shared. and a different end"),
      (3L, s"first document begins here. $shared. then diverges one way"),
      (4L, "entirely unrelated content with nothing in common at all"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(data, "text", "doc_id", k, w)
      .cache()
    def set(id: Long) = fp.where($"doc_id" === id)
      .select("fp", "fp_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // identical docs → identical sketches
    assert(set(1L) == set(3L) && set(1L).nonEmpty)
    // docs sharing a substring >= w+k-1 chars share >= 1 fingerprint
    val h1 = set(1L).map(_._1); val h2 = set(2L).map(_._1)
    assert((h1 & h2).nonEmpty)
    // ...and substantially overlap here (the shared passage dominates)
    assert((h1 & h2).size.toDouble / (h1 | h2).size > 0.25)
    // unrelated docs share (essentially) nothing
    assert((set(4L).map(_._1) & h1).isEmpty)
    // a doc shorter than w grams still yields exactly one fingerprint
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(TextAnalysis.winnowingFingerprints(short, "text", "doc_id", k, w)
      .count() == 1)
    fp.unpersist()
  }

  test("repetition flags boilerplate, clears prose, handles short docs") {
    val data = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "a perfectly normal sentence with no repeats at all"),
      (3L, "one two")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(data, "text", "doc_id").collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) > 0.5)    // template spam: most 3-grams duplicated
    assert(r(2L) == 0.0)   // clean prose
    assert(r(3L) == 0.0)   // < 3 tokens -> no evidence, not NaN
  }

  test("lmScore ranks in-distribution text above one-off garbage") {
    val corpus = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog")) ++
      Seq((98L, "the quick brown fox jumps again today"),
          (99L, "zxq vplk qwortt yuzzle brimp")) // bigrams seen once only
    val scored = TextAnalysis.lmScore(corpus.toDF("doc_id", "text"),
      "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the formulaic doc shares every bigram with 40 copies -> high
    // likelihood; the garbage doc's bigrams are singletons -> lowest
    assert(scored(1L) > scored(98L))
    assert(scored(98L) > scored(99L))
  }

  test("TextAnalysis.langId follows marker vocabularies") {
    val df = Seq(
      (1L, "der hund und die katze ist nicht da"),
      (2L, "the cat and the dog is in a house"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "text", "doc_id")
    assert(out.where($"doc_id" === 1).head().getAs[String]("pred_lang") == "de")
    assert(out.where($"doc_id" === 2).head().getAs[String]("pred_lang") == "en")
    assert(out.where($"doc_id" === 3).head().getAs[String]("pred_lang") == "und")
  }

  test("CharShingles native expression matches the composed builtins") {
    import graft.functions.TextFns
    val base = planted.select($"doc_id",
      TextFns.normalizeText($"text").as("n"))
    val native = base.select($"doc_id",
      TextFns.shingleSetFromNorm($"n", 5).as("s"))
    val composed = base.select($"doc_id",
      TextFns.shingleSetFromNormComposed($"n", 5).as("s"))
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty)
    assert(composed.except(native).isEmpty)
  }

  test("mixtureSample honors per-group weights and is growth-stable") {
    import graft.operators.Analytics
    val base = docs.select("doc_id", "lang", "source")
    val mixed = Analytics.mixtureSample(base, "lang", "doc_id",
      Map("en" -> 50), defaultPercent = 10)
    val en = base.where($"lang" === "en").count().toDouble
    val enKept = mixed.where($"lang" === "en").count().toDouble
    val rest = base.where($"lang" =!= "en").count().toDouble
    val restKept = mixed.where($"lang" =!= "en").count().toDouble
    assert(math.abs(enKept / en - 0.5) < 0.15, s"en ratio ${enKept / en}")
    assert(math.abs(restKept / rest - 0.1) < 0.08,
      s"rest ratio ${restKept / rest}")
    // growth stability: sampling a subset keeps exactly the subset of
    // the full sample (same ids) — incremental loads stay consistent
    val subset = Analytics.mixtureSample(base.where($"doc_id" < 200),
      "lang", "doc_id", Map("en" -> 50), defaultPercent = 10)
    assert(subset.select("doc_id").except(
      mixed.select("doc_id")).isEmpty)
    // percent 0 and 100 boundaries
    assert(Analytics.mixtureSample(base, "lang", "doc_id", Map(),
      defaultPercent = 100).count() == base.count())
    assert(Analytics.mixtureSample(base, "lang", "doc_id", Map(),
      defaultPercent = 0).count() == 0)
  }

  test("deterministicFraction keeps everything at 100 and nothing at 0") {
    import graft.operators.Analytics
    val n = docs.count()
    assert(Analytics.deterministicFraction(docs, "doc_id", 100).count() == n)
    assert(Analytics.deterministicFraction(docs, "doc_id", 0).count() == 0)
    val half = Analytics.deterministicFraction(docs, "doc_id", 50).count()
    assert(half > n / 4 && half < 3 * n / 4)
  }

  test("Graph.connectedComponents resolves transitive dup clusters") {
    import graft.operators.Graph
    val edges = Seq((10L, 20L), (20L, 30L), (40L, 50L), (60L, 10L))
      .toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(10L, 20L, 30L, 60L).forall(cc(_) == 10L)) // one chain
    assert(Set(40L, 50L).forall(cc(_) == 40L))
    val surv = Graph.dupSurvivors(edges, "a", "b")
    assert(surv.select("survivor").distinct().count() == 2)
  }

  test("Graph.dupSurvivorsBy keeps the best-scoring doc per cluster") {
    import graft.operators.Graph
    // two planted clusters: {10,20,30,60} and {40,50}
    val edges = Seq((10L, 20L), (20L, 30L), (40L, 50L), (60L, 10L))
      .toDF("a", "b")
    // 30 outranks its cluster; 40 and 50 TIE -> min id 40 must win;
    // 60 has no score at all -> ranks below every scored node
    val scores = Seq((10L, 0.5), (20L, 0.7), (30L, 0.9), (40L, 0.4),
      (50L, 0.4)).toDF("id", "score")
    val surv = Graph.dupSurvivorsBy(edges, "a", "b", scores, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(10L, 20L, 30L, 60L).forall(surv(_) == 30L),
      s"quality winner not chosen: $surv")
    assert(Set(40L, 50L).forall(surv(_) == 40L), s"tie not min-id: $surv")
    // degenerates to min-id survivors when every score is equal
    val flat = scores.withColumn("score", lit(1.0))
      .union(Seq((60L, 1.0)).toDF("id", "score"))
    val minId = Graph.dupSurvivorsBy(edges, "a", "b", flat, "id", "score")
    val classic = Graph.dupSurvivors(edges, "a", "b")
    assert(minId.except(classic).isEmpty && classic.except(minId).isEmpty)
  }

  test("VecDot native expression matches the composed builtins") {
    import graft.functions.VecFns
    val pairs = embeddings.select($"vec_id", $"embedding")
      .crossJoin(embeddings.where($"vec_id" < 3)
        .select($"embedding".as("e2")))
    val native = pairs.select(VecFns.dot($"embedding", $"e2").as("d"))
    val composed = pairs.select(VecFns.dotComposed($"embedding", $"e2").as("d"))
    // identical accumulation order and promotions -> bitwise equal
    assert(native.except(composed).isEmpty)
    assert(composed.except(native).isEmpty)
  }

  test("Multimodal plumbing: stub decode and frame sampling") {
    val media = Multimodal.attachBinary(docs.limit(10), "doc_id", "text", "source")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.decodeFeaturesStub(media)
    assert(feats.count() == 10)
    val f = feats.where($"media_id" === 1).head()
    assert(f.getAs[scala.collection.Seq[Double]]("features").length == 8)
    assert(f.getAs[Long]("n_bytes") > 0)
    val frames = Multimodal.sampleFrames(media.where($"media_id" === 1), 32, 16)
    assert(frames.count() >= 1)
    assert(frames.head().getAs[Array[Byte]]("frame").length <= 32)
    // resize: every 4th byte survives, order preserved
    val orig = media.where($"media_id" === 1).head().getAs[Array[Byte]]("payload")
    val resized = Multimodal.resizeStub(media.where($"media_id" === 1), 4)
      .head().getAs[Array[Byte]]("payload")
    assert(resized.length == orig.length / 4)
    assert(resized.take(3).toSeq == Seq(orig(0), orig(4), orig(8)).toSeq)
  }

  test("Multimodal.audioFramesStub: frame count, energy, zcr by hand") {
    import spark.implicits._
    // 48 'bytes': alternating above/below 128 → every adjacent pair
    // crosses zero; samples are ±1 so energy is exactly 1.0
    val payload = Array.tabulate(48)(i =>
      (if (i % 2 == 0) 129 else 127).toByte)
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val out = Multimodal.audioFramesStub(media, frameLen = 32, stride = 16)
      .collect().sortBy(_.getInt(1))
    // (48-32)/16+1 = 2 frames: [0,32) and [16,48)
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(2) == 32L)
      assert(r.getDouble(3) == 1.0)
      assert(r.getDouble(4) == 1.0)
    }
    // short payload: one partial frame, zcr over its 9 samples
    val short = Seq((2L, Array.tabulate(10)(_ => 130.toByte)))
      .toDF("media_id", "payload")
    val s = Multimodal.audioFramesStub(short, 32, 16).collect()
    assert(s.length == 1 && s.head.getLong(2) == 10L &&
      s.head.getDouble(3) == 4.0 && s.head.getDouble(4) == 0.0)
  }

  test("Multimodal.sceneCuts: luma, diffs, cut flags, scene ids by hand") {
    import spark.implicits._
    // 3 non-overlapping 4-byte frames: lumas 40, 44, 80 → diffs
    // 0, +4 (below threshold 10), +36 (cut) → scenes 0, 0, 1
    val payload = (Array.fill(4)(10.toByte) ++
      Array(10, 10, 10, 14).map(_.toByte) ++ Array.fill(4)(20.toByte))
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val out = Multimodal.sceneCuts(media, frameLen = 4, cutThreshold = 10L)
      .orderBy($"frame_idx").collect()
    assert(out.map(_.getLong(2)).sameElements(Array(40L, 44L, 80L)))
    assert(out.map(_.getLong(3)).sameElements(Array(0L, 4L, 36L)))
    assert(out.map(_.getInt(4)).sameElements(Array(0, 0, 1)))
    assert(out.map(_.getInt(5)).sameElements(Array(0, 0, 1)))
    // frame 0 is never a cut, even at threshold 0
    val zero = Multimodal.sceneCuts(media, frameLen = 4, cutThreshold = 0L)
      .orderBy($"frame_idx").collect()
    assert(zero.head.getInt(4) == 0 && zero(1).getInt(4) == 1)
    // sub-frame payload: one partial frame; empty payload: no rows
    val edge = Seq((2L, Array[Byte](1, 2, 3)), (3L, Array.empty[Byte]))
      .toDF("media_id", "payload")
    val e = Multimodal.sceneCuts(edge, frameLen = 4).collect()
    assert(e.length == 1 && e.head.getLong(0) == 2L &&
      e.head.getLong(2) == 6L && e.head.getInt(5) == 0)
  }
}
