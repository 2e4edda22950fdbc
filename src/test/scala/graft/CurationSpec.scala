package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.operators.{Curation, Similarity}
import graft.sources.Tables

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate counts distinct shared n-grams; short docs never flag") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated words about spark shuffles and joins here"),
      (3L, "short doc"), // < n tokens: no grams, never contaminated
      (4L, "the quick brown fox jumps high the quick brown fox jumps")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over everything")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, benchmark, "text", "doc_id",
        n = 5, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // doc 1 shares "the quick brown fox jumps" and "quick brown fox
    // jumps over" (2 distinct 5-grams); doc 4 repeats the first gram
    // but distinct-counts it once
    assert(out(1L) == ((2, 1)))
    assert(out(2L) == ((0, 0)))
    assert(out(3L) == ((0, 0)))
    assert(out(4L) == ((1, 1)))
  }

  test("passageDedup keeps the globally first occurrence and reassembles in order") {
    val a = "a b c d e f g h i j" // one full chunk
    val b = "k l m n o p q r s t"
    val docs = Seq(
      (1L, s"$a $b"),      // both passages first here
      (2L, s"$b zz"),      // chunk "k..t" duplicated from doc 1, then tail
      (3L, s"$a $a")       // within-doc duplicate of chunk a
    ).toDF("doc_id", "text")
    val out = Curation.passageDedup(docs, "text", "doc_id", chunkTokens = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((2, 2, s"$a $b")))
    // doc 2's first chunk is exactly b (10 tokens) -> dropped; "zz" kept
    assert(out(2L) == ((2, 1, "zz")))
    // doc 3: BOTH occurrences of chunk a drop — doc 1 owns the global
    // first occurrence (the CCNet rule: later copies vanish entirely)
    assert(out(3L) == ((2, 0, "")))
  }

  test("passageDedup is a no-op on an all-unique corpus") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(20)
    val out = Curation.passageDedup(docs, "text", "doc_id")
    // every doc keeps at least one passage, and n_kept <= n_passages
    assert(out.where($"n_kept" < 1 || $"n_kept" > $"n_passages").isEmpty)
  }

  test("piiRedact counts and masks emails, phones, ips") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or +1-555-0199 from 192.168.0.1"),
      (2L, "no pii in this row at all"),
      (3L, "two mails a@b.io c@d.net one ip 10.0.0.7")
    ).toDF("doc_id", "text")
    val out = Curation.piiRedact(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L) == ((1, 1, 1, "mail me at [EMAIL] or [PHONE] from [IP]")))
    assert(out(2L) == ((0, 0, 0, "no pii in this row at all")))
    assert(out(3L) == ((2, 1, 0, "two mails [EMAIL] [EMAIL] one ip [IP]")))
  }

  test("bloomAntiJoin equals the plain anti-join exactly") {
    val fp = Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", TextFns.fingerprint($"text").as("fingerprint"))
    val hist = fp.where($"doc_id" % 3 === 0).select("fingerprint")
    val bloom = Curation.bloomAntiJoin(fp, hist, "fingerprint",
      expectedItems = 10000L)
    // using-joins put the key first; align column order for except
    val plain = fp.join(hist, Seq("fingerprint"), "left_anti")
      .select("doc_id", "fingerprint")
    val b = bloom.select("doc_id", "fingerprint")
    assert(b.count() == plain.count())
    assert(b.except(plain).isEmpty && plain.except(b).isEmpty)
  }

  test("bloomAntiJoin passes everything through on an empty history") {
    val fp = Tables.load(spark, TestSpark.sfDir, "documents").limit(10)
      .select($"doc_id", TextFns.fingerprint($"text").as("fingerprint"))
    val empty = fp.where(lit(false)).select("fingerprint")
    assert(Curation.bloomAntiJoin(fp, empty, "fingerprint").count() == 10)
  }

  test("semDedup drops exact-duplicate vectors within a cluster, keeps min id") {
    // 2 tight groups of identical vectors + one distinct singleton
    val mk = (base: Double) => (0 until 8).map(i => (base + i).toFloat)
    val df = Seq(
      (1L, mk(1.0)), (2L, mk(1.0)), (5L, mk(1.0)),  // dup group A
      (3L, mk(100.0)), (4L, mk(100.0)),             // dup group B
      (9L, (0 until 8).map(i => (if (i % 2 == 0) 1.0f else -1.0f)))
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, "vec_id", "embedding",
        nlist = 2, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // identical vectors have cosine 1.0 regardless of cluster; each
    // dup group keeps exactly its smallest id
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(5L))
    assert(kept.contains(3L) && !kept.contains(4L))
    assert(kept.contains(9L))
  }

  test("semDedup output is consistent with its own assignment + cosine rule") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val kept = Similarity.semDedup(e, "vec_id", "embedding",
      nlist = 4, threshold = 0.5)
    val assign = Similarity.kmeansAssign(e, "vec_id", "embedding", nlist = 4)
    // kept ids carry their true cell assignment
    assert(kept.except(assign).isEmpty)
    assert(kept.count() >= 1 && kept.count() <= e.count())
  }
}
