package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tokenize

/** BPE merge training held to hand-computation and an independent
  * in-memory reference implementation. */
class TokenizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent in-memory BPE reference (shares no code with the
    * distributed fold). */
  private def refBpe(words: Map[String, Long],
                     merges: Int): Seq[(Int, String, String, Long)] = {
    var syms = words.map { case (w, n) => w.map(_.toString).toVector -> n }
      .toVector
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((rank, l, r, c))
        syms = syms.map { case (s, n) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.size) {
            if (i + 1 < s.size && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          b.toVector -> n
        }
        rank += 1
      }
    }
    out.toSeq
  }

  private def train(corpus: Seq[String], merges: Int) =
    Tokenize.bpeTrain(corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", merges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("bpeTrain: hand-computed merges on a tiny corpus, with early exhaustion") {
    // words: aaab x2, ab x1. iter0: (a,a)=4 wins; iter1: (a,b)=3;
    // iter2: (aa,ab)=2; then no pairs remain -> stops at 3 of 5
    val got = train(Seq("aaab aaab ab"), merges = 5)
    assert(got == Seq((0, "a", "a", 4L), (1, "a", "b", 3L),
      (2, "aa", "ab", 2L)))
  }

  test("bpeTrain matches the in-memory reference on the sf corpus head") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .where(col("doc_id") < 50)
    val got = Tokenize.bpeTrain(docs, "text", merges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val words = docs.select(explode(split(trim(lower(col("text"))), "\\s+"))
        .as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refBpe(words, 6))
  }

  test("bpeTrain is partition-invariant") {
    val corpus = Seq("the quick brown fox", "the quick red fox",
      "the slow brown bear", "a quick brown fox jumps")
    val a = train(corpus, 4)
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(7)
    val b = Tokenize.bpeTrain(df, "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(a == b)
  }

  test("bpeSegmentCount replays merges in rank order") {
    val df = Seq((1L, "aaab ab"), (2L, "ba")).toDF("doc_id", "text")
    val mergeList = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = Tokenize.bpeSegmentCount(df, "text", "doc_id", mergeList)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // doc 1: aaab -> [aaab] (1), ab -> [ab] (1) = 2 words, 2 tokens;
    // doc 2: ba stays [b, a] = 1 word, 2 tokens
    assert(out(1L) == ((2L, 2L)))
    assert(out(2L) == ((1L, 2L)))
  }

  test("bpeSegmentCount weights repeated words by occurrence count") {
    // the fold runs on DISTINCT words; per-doc counts come from the
    // join-back — a word repeated 3× must contribute 3× its length
    val df = Seq((1L, "ab ab ab ba"), (2L, "ab")).toDF("doc_id", "text")
    val out = Tokenize.bpeSegmentCount(df, "text", "doc_id",
        Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // doc 1: ab×3 -> [ab] each (3 tokens) + ba -> [b, a] (2) = 4 words,
    // 5 tokens; doc 2: 1 word, 1 token
    assert(out(1L) == ((4L, 5L)))
    assert(out(2L) == ((1L, 1L)))
  }
}
