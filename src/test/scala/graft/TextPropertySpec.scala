package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.operators.{Curation, Retrieval}

/** Property-based checks of the RAG chunker and BM25 against
  * independent in-memory reimplementations (plain Scala over token
  * lists — no Spark expression shared with the operators), on random
  * corpora including empty docs, single-token docs, and docs shorter
  * than one chunk. */
class TextPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 500L)
      len <- Gen.frequency(8 -> Gen.choose(1, 12), 1 -> Gen.const(0))
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield (id, toks.mkString(" ")))
  } yield docs.distinctBy(_._1)

  test("chunkForRag equals the in-memory chunker on random docs") {
    val paramGen = for {
      corpus <- corpusGen
      chunk <- Gen.choose(1, 6)
      stride <- Gen.choose(1, chunk)
    } yield (corpus, chunk, stride)
    val prop = Prop.forAll(paramGen) { case (corpus, chunk, stride) =>
      val got = Curation.chunkForRag(corpus.toDF("doc_id", "text"),
          "text", "doc_id", chunkTokens = chunk, stride = stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getInt(2), r.getString(3))).toMap
      val want = corpus.flatMap { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        val nStarts =
          if (t.isEmpty) 0
          else math.ceil(math.max(t.length - chunk, 0) / stride.toDouble)
            .toInt + 1
        (0 until nStarts).map { i =>
          val c = t.slice(i * stride, i * stride + chunk)
          (id, i) -> (c.length, c.mkString(" "))
        }
      }.toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("bm25Batch equals the in-memory scorer on random corpora") {
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val qIds = corpus.map(_._1).sorted.take(2)
      val got = Retrieval.bm25Batch(docs,
          qIds.toDF("doc_id"), "text", "doc_id", k = 1000)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
          (r.getAs[Long]("score_micro"), r.getAs[Int]("n_terms"))).toMap
      // independent replica over plain token maps
      val toks = corpus.map { case (id, text) =>
        id -> text.split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
      val tf = toks.flatMap { case (id, ts) =>
        ts.groupBy(identity).map { case (t, g) => (id, t) -> g.size.toLong }
      }
      val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nDocs = corpus.size.toLong
      val tokTotal = toks.values.map(_.size.toLong).sum
      val want = (for {
        q <- qIds
        qTerms = toks(q).distinct
        (id, ts) <- toks if id != q
        shared = qTerms.filter(ts.contains)
        if shared.nonEmpty
      } yield {
        val dl = ts.size.toLong
        val micros = shared.map { t =>
          val idf = math.log(1.0 +
            (nDocs - df(t) + 0.5) / (df(t) + 0.5))
          val dlNorm = dl.toDouble * nDocs / tokTotal
          val c = idf * (tf((id, t)) * 2.2) /
            (tf((id, t)) + 1.2 * (0.25 + 0.75 * dlNorm))
          math.floor(c * 1000000.0 + 0.5).toLong
        }
        (q, id) -> (micros.sum, shared.size)
      }).toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
