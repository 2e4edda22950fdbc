package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity}
import graft.sources.Tables

/** Hybrid RRF retrieval and the IVF-PQ ANN composition. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")
  lazy val embeddings = Tables.load(spark, TestSpark.sfDir, "embeddings")
    .withColumnRenamed("vec_id", "doc_id")

  test("bm25Batch: closed-form scores, idf rarity, tf saturation, " +
      "length norm, query-doc exclusion") {
    val docsP = Seq(
      (1L, "rare common common"),         // the query doc
      (2L, "rare common"),                // both terms, short
      (3L, "common common common common"),// common only, long
      (4L, "rare"),                       // rare only, shortest
      (5L, "nothing shared here")).toDF("doc_id", "text")
    val out = Retrieval.bm25Batch(docsP,
      docsP.where($"doc_id" === 1L).select($"doc_id"),
      "text", "doc_id", k = 10).collect()
    // query doc excluded, zero-overlap doc absent
    assert(!out.exists(_.getAs[Long]("doc_id") == 1L))
    assert(!out.exists(_.getAs[Long]("doc_id") == 5L))
    assert(out.forall(_.getAs[Long]("query_id") == 1L))
    // closed-form replica of the operator's arithmetic tree:
    // N=5, Σdl=13, df(rare)=df(common)=3
    def micro(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + (5L - df + 0.5) / (df + 0.5))
      val dlNorm = dl.toDouble * 5L / 13L
      val c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dlNorm))
      math.floor(c * 1000000.0 + 0.5).toLong
    }
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("score_micro"), r.getAs[Int]("n_terms"))).toMap
    assert(byDoc(2L) == ((micro(1, 3, 2) + micro(1, 3, 2), 2)))
    assert(byDoc(3L) == ((micro(4, 3, 4), 1)))
    assert(byDoc(4L) == ((micro(1, 3, 1), 1)))
    // two-term short doc beats the long single-term doc (tf saturates,
    // length norm penalizes); ranks are dense and tie-break by id
    val ranks = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    assert(ranks(2L) == 1)
    assert(ranks.values.toSeq.sorted == Seq(1, 2, 3))
  }

  test("moreLikeThis: a planted twin of the query doc ranks first") {
    // doc 2 shares the query's full (distinctive) vocabulary AND its
    // exact embedding: first in both modalities, hence first fused
    val docsP = Seq(
      (1L, "quasar nebula pulsar magnetar blazar"),
      (2L, "quasar nebula pulsar magnetar blazar"),
      (3L, "quasar nebula common words here"),
      (4L, "pulsar only plus other text"),
      (5L, "entirely unrelated vocabulary set")).toDF("doc_id", "text")
    val v = Seq(0.9, 0.1, -0.3, 0.5)
    val embP = Seq(
      (1L, v), (2L, v),
      (3L, Seq(0.1, 0.9, 0.2, -0.4)),
      (4L, Seq(-0.5, 0.2, 0.8, 0.1)),
      (5L, Seq(0.3, -0.7, 0.1, 0.6))).toDF("doc_id", "embedding")
    val out = Retrieval.moreLikeThis(docsP, embP, "text", "doc_id",
      "embedding", queryId = 1L, k = 4)
    val top = out.where($"rank" === 1).head()
    assert(top.getAs[Long]("doc_id") == 2L)
    assert(top.getAs[Int]("kw_rank") == 1 && top.getAs[Int]("vec_rank") == 1)
    // doc 5 shares no terms: keyword sentinel 0, but it still has a
    // vector rank, so it appears in the fused pool
    val d5 = out.where($"doc_id" === 5L).head()
    assert(d5.getAs[Int]("kw_rank") == 0 && d5.getAs[Int]("vec_rank") > 0)
    val ranks = out.select($"rank").collect().map(_.getInt(0)).sorted
    assert(ranks.sameElements(1 to 4))
  }

  test("moreLikeThis: deterministic, and rank 0 marks a missing modality") {
    val a = Retrieval.moreLikeThis(docs, embeddings, "text", "doc_id",
      "embedding", queryId = 0L, k = 10)
    val b = Retrieval.moreLikeThis(docs, embeddings, "text", "doc_id",
      "embedding", queryId = 0L, k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // sentinel semantics: rank 0 never coexists with a positive rrf
    // contribution from that modality; ranks are bounded by the pool
    val bad = a.where($"kw_rank" < 0 || $"vec_rank" < 0 ||
      $"kw_rank" > 50 || $"vec_rank" > 50 ||
      ($"kw_rank" === 0 && $"vec_rank" === 0)).count()
    assert(bad == 0)
  }

  test("moreLikeThisBatch: per-query twins rank first; k rows per query") {
    val docsP = Seq(
      (1L, "quasar nebula pulsar magnetar blazar"),
      (2L, "quasar nebula pulsar magnetar blazar"),
      (3L, "kelvin joule pascal newton tesla"),
      (4L, "kelvin joule pascal newton tesla"),
      (5L, "entirely unrelated vocabulary set here")).toDF("doc_id", "text")
    val va = Seq(0.9, 0.1, -0.3, 0.5)
    val vb = Seq(-0.2, 0.8, 0.4, -0.6)
    val embP = Seq(
      (1L, va), (2L, va), (3L, vb), (4L, vb),
      (5L, Seq(0.3, -0.7, 0.1, 0.6))).toDF("doc_id", "embedding")
    val qids = Seq(Tuple1(1L), Tuple1(3L)).toDF("doc_id")
    val out = Retrieval.moreLikeThisBatch(docsP, embP, qids, "text",
      "doc_id", "embedding", k = 3)
    val tops = out.where($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("doc_id")).toMap
    assert(tops == Map(1L -> 2L, 3L -> 4L))
    // each query gets exactly k fused rows with dense ranks
    val perQ = out.groupBy($"query_id").count().collect()
      .map(r => r.getAs[Long](0) -> r.getLong(1)).toMap
    assert(perQ == Map(1L -> 3L, 3L -> 3L))
    // determinism
    val again = Retrieval.moreLikeThisBatch(docsP, embP, qids, "text",
      "doc_id", "embedding", k = 3)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("residual PQ reconstructs closer than plain PQ at the same budget") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    def meanCos(recon: org.apache.spark.sql.Column): Double =
      e.select(graft.functions.VecFns.cosineFromParts(
          graft.functions.VecFns.dot($"embedding", recon),
          graft.functions.VecFns.norm($"embedding"),
          graft.functions.VecFns.norm(recon)).as("c"))
        .agg(avg($"c")).head().getDouble(0)
    val (_, plainBooks) = Similarity.pqCodes(e, "vec_id", "embedding")
    val plain = meanCos(Similarity.pqReconCol(plainBooks,
      Similarity.pqCellsCol(plainBooks, $"embedding", 2)))
    val (_, cents, rBooks) = Similarity.residualPqCodes(e, "vec_id",
      "embedding")
    val residual = meanCos(Similarity.rpqDecodeCol(cents, rBooks,
      Similarity.rpqEncodeCol(cents, rBooks, $"embedding")))
    assert(residual > plain,
      f"residual $residual%.4f should beat plain $plain%.4f")
  }

  test("ivfPqTopK: k per query, deterministic, candidates from probed cells") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val qs = e.where($"vec_id" < 10)
    val out = Similarity.ivfPqTopK(qs, e, "vec_id", "embedding", k = 5)
    val perQuery = out.groupBy($"query_id").count().collect()
    assert(perQuery.length == 10 && perQuery.forall(_.getLong(1) == 5))
    val again = Similarity.ivfPqTopK(qs, e, "vec_id", "embedding", k = 5)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // every ranked neighbor is a member of the probe candidate set
    val cand = Similarity.ivfPqCandidatePairs(qs, e, "vec_id", "embedding")
    assert(out.select($"query_id", $"neighbor_id")
      .exceptAll(cand.select($"query_id", $"neighbor_id")).isEmpty)
    // and the PQ ranking still finds a fair share of the true top-5
    // (IVF probes 4/16 cells; PQ adds quantization noise on top)
    val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding",
      k = 5).select($"query_id", $"neighbor_id")
    val hit = out.select($"query_id", $"neighbor_id").intersect(exact).count()
    assert(hit >= 10, s"IVF-PQ recall too low: $hit/50")
  }

  test("ivfPqRefineTopK: refine recovers recall lost to PQ coding") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val qs = e.where($"vec_id" < 10)
    val out = Similarity.ivfPqRefineTopK(qs, e, "vec_id", "embedding",
      k = 5)
    val perQuery = out.groupBy($"query_id").count().collect()
    assert(perQuery.length == 10 && perQuery.forall(_.getLong(1) == 5))
    // deterministic end to end
    val again = Similarity.ivfPqRefineTopK(qs, e, "vec_id", "embedding",
      k = 5)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // the final ranking only ever re-orders the PQ refine pool
    val pool = Similarity.ivfPqRefineCandidatePairs(qs, e, "vec_id",
      "embedding")
    assert(out.select($"query_id", $"neighbor_id")
      .exceptAll(pool.select($"query_id", $"neighbor_id")).isEmpty)
    // ... and the pool is bounded: at most `refine` pairs per query
    val poolSizes = pool.groupBy($"query_id").count().collect()
    assert(poolSizes.forall(_.getLong(1) <= 50))
    // refine must recover candidates PQ coding mis-ranked: strictly
    // more true top-5 hits than the unrefined IVF-PQ ranking at the
    // same probe budget (deterministic corpus → fixed numbers)
    val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding",
      k = 5).select($"query_id", $"neighbor_id")
    val plain = Similarity.ivfPqTopK(qs, e, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").intersect(exact).count()
    val refined = out.select($"query_id", $"neighbor_id")
      .intersect(exact).count()
    info(s"true-top-5 hits: ivfpq=$plain/50 refined=$refined/50")
    assert(refined >= plain,
      s"refine lost recall: $refined < $plain (of 50)")
  }
}
