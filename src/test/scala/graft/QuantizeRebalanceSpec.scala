package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFns
import graft.operators.{Analytics, Curation, Similarity}
import graft.sources.Tables

/** Round-6 operators: scalar-quantized ANN, semantic decontamination,
  * span overlap, uniform rebalance. */
class QuantizeRebalanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")
  lazy val embeddings = Tables.load(spark, TestSpark.sfDir, "embeddings")

  test("VecFns.sqReconstruct native == composed (bit-identical)") {
    val dim = 64
    val lo = (0 until dim).map(i => -1.0 - i * 0.01)
    val hi = (0 until dim).map(i => 1.0 + i * 0.02)
    val native = embeddings.select($"vec_id",
      VecFns.sqReconstruct($"embedding", lo, hi).as("r"))
    val composed = embeddings.select($"vec_id",
      VecFns.sqReconstructComposed($"embedding", lo, hi).as("r"))
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("sqReconstruct quantizes to the 255-step lattice within bounds") {
    val lo = Seq(0.0); val hi = Seq(1.0)
    val df = Seq(Tuple1(Seq(0.0f)), Tuple1(Seq(1.0f)), Tuple1(Seq(0.5f)),
      Tuple1(Seq(0.2501f))).toDF("v")
    val out = df.select(VecFns.sqReconstruct($"v", lo, hi).as("r"))
      .collect().map(_.getSeq[Double](0).head)
    assert(out(0) == 0.0 && out(1) == 1.0)
    // every output must be k/255 for integer k
    out.foreach { x =>
      val k = x * 255.0
      assert(math.abs(k - math.round(k)) < 1e-9, s"off-lattice: $x")
    }
    // degenerate dimension (hi == lo) reconstructs the constant
    val const = Seq(Tuple1(Seq(7.0f))).toDF("v")
      .select(VecFns.sqReconstruct($"v", Seq(3.0), Seq(3.0)).as("r"))
      .head().getSeq[Double](0).head
    assert(const == 3.0)
  }

  test("Similarity.sqTopK: high recall vs brute force, self-match top-1") {
    val qs = embeddings.where($"vec_id" < 10)
    val sq = Similarity.sqTopK(qs, embeddings, "vec_id", "embedding",
      k = 5, dim = 64).select($"query_id", $"neighbor_id")
    val exact = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
      "embedding", k = 5).select($"query_id", $"neighbor_id")
    val hit = sq.intersect(exact).count()
    // 8-bit quantization barely moves cosines: near-perfect recall
    // (leave slack for genuinely tied neighbors swapping ranks)
    assert(hit >= 40, s"SQ recall too low: $hit/50")
  }

  test("Similarity.pqTopK: reasonable recall vs brute force, deterministic") {
    val qs = embeddings.where($"vec_id" < 10)
    val pq = Similarity.pqTopK(qs, embeddings, "vec_id", "embedding", k = 5)
    val got = pq.select($"query_id", $"neighbor_id")
    val exact = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
      "embedding", k = 5).select($"query_id", $"neighbor_id")
    // 8× compression costs real recall; the tier's contract is a
    // cheap first pass, not exactness — still most neighbors survive
    val hit = got.intersect(exact).count()
    assert(hit >= 20, s"PQ recall too low: $hit/50")
    // training is deterministic: a re-run reproduces rankings exactly
    val again = Similarity.pqTopK(qs, embeddings, "vec_id", "embedding",
      k = 5)
    assert(pq.exceptAll(again).isEmpty && again.exceptAll(pq).isEmpty)
  }

  test("PQ native kernels == composed twins (bit-identical)") {
    val books = Similarity.trainPqCodebooks(embeddings, "vec_id",
      "embedding", m = 32, ksub = 16, dim = 64, iters = 1)
    val nat = embeddings.select($"vec_id",
      Similarity.pqCellsCol(books, $"embedding", 2).as("c"))
    val comp = embeddings.select($"vec_id",
      Similarity.pqCellsComposed(books, $"embedding", 2).as("c"))
    assert(nat.exceptAll(comp).isEmpty && comp.exceptAll(nat).isEmpty)
    val natR = nat.select($"vec_id",
      Similarity.pqReconCol(books, $"c").as("r"))
    val compR = nat.select($"vec_id",
      Similarity.pqReconComposed(books, $"c").as("r"))
    assert(natR.exceptAll(compR).isEmpty && compR.exceptAll(natR).isEmpty)
  }

  test("HadamardRotate: exactly orthogonal, deterministic, ref-matched") {
    val rot = embeddings.limit(50).select($"vec_id", $"embedding",
      Similarity.rotateCol($"embedding").as("r"))
    val rows = rot.collect()
    // reference implementation, independently coded: signs then the
    // dense H multiply (O(d^2), fine for a test)
    def refRotate(x: Array[Double]): Array[Double] = {
      val n = x.length
      def sign(i: Int): Double = {
        var z = 0x6A09E667F3BCC908L + 0x9E3779B97F4A7C15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        if (((z ^ (z >>> 31)) & 1L) == 1L) 1.0 else -1.0
      }
      val d = x.indices.map(i => sign(i) * x(i))
      // H[i][j] = (-1)^popcount(i & j)
      Array.tabulate(n) { i =>
        var s = 0.0
        var j = 0
        while (j < n) {
          val h = if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0
          s += h * d(j); j += 1
        }
        s / math.sqrt(n.toDouble)
      }
    }
    rows.foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble).toArray
      val y = r.getSeq[Double](2).toArray
      val want = refRotate(x)
      y.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      // orthogonality: the norm is preserved exactly (up to fp)
      val nx = math.sqrt(x.map(v => v * v).sum)
      val ny = math.sqrt(y.map(v => v * v).sum)
      assert(math.abs(nx - ny) < 1e-9, s"norm changed: $nx vs $ny")
    }
    // inner products (hence cosine rankings) are invariant
    val x0 = rows(0).getSeq[Float](1).map(_.toDouble).toArray
    val x1 = rows(1).getSeq[Float](1).map(_.toDouble).toArray
    val y0 = rows(0).getSeq[Double](2).toArray
    val y1 = rows(1).getSeq[Double](2).toArray
    val dotX = x0.zip(x1).map { case (a, b) => a * b }.sum
    val dotY = y0.zip(y1).map { case (a, b) => a * b }.sum
    assert(math.abs(dotX - dotY) < 1e-9)
    // deterministic: a second evaluation is bit-identical
    val again = embeddings.limit(50).select($"vec_id",
      Similarity.rotateCol($"embedding").as("r"))
    assert(rot.select($"vec_id", $"r").exceptAll(again).isEmpty)
  }

  test("HadamardRotate refuses non-array input at analysis time") {
    // the type gate must fire in analysis (AnalysisException), not as
    // a ClassCastException from inside eval/codegen mid-job
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      embeddings.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.HadamardRotate(
          org.apache.spark.sql.GraftColumnBridge.expression(
            org.apache.spark.sql.functions.lit("oops")), 1L))).collect()
    }
    assert(e.getMessage.contains("hadamard_rotate"))
  }

  test("rotation is ranking-invariant: rotated brute force == raw") {
    val qs = embeddings.where($"vec_id" < 5)
    def rotated(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding", Similarity.rotateCol($"embedding"))
    val raw = Similarity.bruteForceTopK(qs, embeddings, "vec_id",
      "embedding", 10).select($"query_id", $"neighbor_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rot = Similarity.bruteForceTopK(rotated(qs), rotated(embeddings),
      "vec_id", "embedding", 10).select($"query_id", $"neighbor_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw == rot, "orthogonal rotation changed the exact ranking")
    // and opqTopK produces a full, well-formed top-k at the same
    // code budget as pqTopK
    val top = Similarity.opqTopK(qs, embeddings, "vec_id", "embedding",
      k = 3)
    assert(top.groupBy($"query_id").count().collect()
      .forall(_.getLong(1) == 3))
  }

  test("Similarity.pqCodes: every code addresses a real centroid") {
    val (codes, books) = Similarity.pqCodes(embeddings, "vec_id",
      "embedding", m = 8, ksub = 16, dim = 64)
    assert(books.length == 8 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 8)))
    val bad = codes.select(explode($"codes").as("c"))
      .where($"c" < 0 || $"c" >= 16).count()
    assert(bad == 0)
    assert(codes.count() == embeddings.count())
  }

  test("Similarity.semanticDecon flags planted near-copies") {
    // corpus vector 900001 IS benchmark vector 0 (shifted id): its max
    // benchmark cosine must be 1.0 against bench_id 0
    val bench = embeddings.where($"vec_id" < 3)
    val corpus = embeddings.where($"vec_id" >= 3 && $"vec_id" < 60)
      .union(bench.where($"vec_id" === 0)
        .select(($"vec_id" + 900001).as("vec_id"), $"embedding", $"label"))
    val out = Similarity.semanticDecon(corpus, bench, "vec_id",
      "embedding", threshold = 0.9)
    val planted = out.where($"vec_id" === 900001).head()
    assert(planted.getAs[Double]("max_bench_sim") == 1.0)
    assert(planted.getAs[Long]("bench_id") == 0L)
    assert(planted.getAs[Int]("contaminated") == 1)
    // every corpus row is scored exactly once
    assert(out.count() == corpus.count())
    // and the argmax must equal the brute-force max over pairs
    val brute = Similarity.cosinePairs(bench, corpus, "vec_id", "embedding")
      .withColumn("cos_sim", graft.functions.CleanFns.roundRepro($"cos_sim", 4))
      .groupBy($"neighbor_id".as("vec_id"))
      .agg(max(struct($"cos_sim".as("s"), (-$"query_id").as("negb"))).as("b"))
      .select($"vec_id", $"b.s".as("exp_sim"), (-$"b.negb").as("exp_bench"))
    val joined = out.join(brute, Seq("vec_id"))
    assert(joined.where($"max_bench_sim" =!= $"exp_sim" ||
      $"bench_id" =!= $"exp_bench").isEmpty)
  }

  test("Curation.spanOverlap: planted shared span is counted on both docs") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta lambda mu"),
      (3L, "completely different words one two three four five six seven"),
      (4L, "short text")).toDF("doc_id", "text")
    val out = Curation.spanOverlap(df, "text", "doc_id", n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Int]("n_shared"))).toMap
    // docs 1/2: 10 tokens -> 3 distinct 8-grams each; they share
    // exactly the first gram (tokens 1-8 identical)
    assert(out(1L) == ((3, 1)) && out(2L) == ((3, 1)))
    assert(out(3L)._2 == 0)
    assert(out(4L) == ((0, 0))) // shorter than n: no grams, ratio 0
  }

  test("Analytics.rebalanceToUniform: oversized groups downsampled, small kept") {
    val rows = (0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1050).map(i => (i.toLong, "small")) ++
      (2000 until 2050).map(i => (i.toLong, "tiny"))
    val df = rows.toDF("doc_id", "lang")
    val out = Analytics.rebalanceToUniform(df, "lang", "doc_id")
    val byLang = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fair share = 1000/3 ≈ 333; "big" (900) downsamples toward it,
    // the others keep everything
    assert(byLang("small") == 50 && byLang("tiny") == 50)
    assert(byLang("big") < 500 && byLang("big") > 200,
      s"big kept ${byLang("big")} of 900, expected ≈333")
    // determinism: the same input keeps the identical row set
    val again = Analytics.rebalanceToUniform(df, "lang", "doc_id")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
