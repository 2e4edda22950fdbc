package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CleanFns, VecFns}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k. The query side is
  *    broadcast, so the corpus streams once with no shuffle —
  *    correctness baseline and perfectly scalable when |queries| is
  *    small.
  *  - `lshTopK`: random-hyperplane LSH bucketing — each query only
  *    compares against corpus vectors sharing its signature bucket,
  *    touching ~|corpus| / 2^bits of the data. The scale path for
  *    large query sets.
  *
  * Norms are computed ONCE PER SIDE before the pair join (the naive
  * cosine would recompute the query norm for every corpus row), and
  * the per-pair dot product is the native VecDot expression.
  */
object Similarity {

  private def withNorm(df: DataFrame, idCol: String, idAs: String,
                       vecCol: String, vecAs: String,
                       normAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      VecFns.norm(col(vecCol)).as(normAs))

  private def pairCos: Column = VecFns.cosineFromParts(
    VecFns.dot(col("__qv"), col("__cv")), col("__qn"), col("__cn"))

  /** The shared asymmetric top-k ranking: a prepared broadcast query
    * frame (query_id, __qv, __qn) against a prepared corpus frame
    * (neighbor_id, __cv, __cn) — exact cosine, rounded BEFORE the
    * per-query rank window, ties to the smaller neighbor id. Every
    * quantized tier and the persisted store rank through this one
    * block, so precision/tie-break rules cannot drift apart. */
  private[graft] def rankTopK(q: DataFrame, c: DataFrame,
                              k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Pairwise cosine for a (small, broadcast) query set × corpus. */
  def cosinePairs(queries: DataFrame, corpus: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val q = broadcast(withNorm(queries, idCol, "query_id", vecCol, "__qv", "__qn"))
    val c = withNorm(corpus, idCol, "neighbor_id", vecCol, "__cv", "__cn")
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", pairCos)
      .drop("__qv", "__cv", "__qn", "__cn")
  }

  /** Exact top-k neighbors per query by cosine (ties broken by id). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cosinePairs(queries, corpus, idCol, vecCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .withColumn("cos_sim", CleanFns.roundRepro(col("cos_sim"), 4))
  }

  /** Bucket-joined (query, corpus) pair frame shared by `lshTopK` and
    * its oracle's candidate dump — vectors and norms ride along. */
  private def lshJoined(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, bits: Int,
                        dim: Int): DataFrame = {
    val sig = (df: DataFrame, id: String, v: String, n: String) =>
      df.select(col(idCol).as(id), col(vecCol).as(v),
        VecFns.norm(col(vecCol)).as(n),
        xxhash64(VecFns.lshSignature(col(vecCol), bits, dim)).as("bucket"))
    val q = broadcast(sig(queries, "query_id", "__qv", "__qn"))
    val c = sig(corpus, "neighbor_id", "__cv", "__cn")
    q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
  }

  /** LSH-bucketed ANN: signature match first, exact cosine within the
    * bucket. Recall < 1 by construction; raise `bits` for precision,
    * lower it for recall. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int, dim: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    lshJoined(queries, corpus, idCol, vecCol, bits, dim)
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** The (query_id, neighbor_id) candidate pairs `lshTopK` ranks —
    * what an independent oracle needs to re-derive the result. */
  def lshCandidatePairs(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, bits: Int,
                        dim: Int): DataFrame =
    lshJoined(queries, corpus, idCol, vecCol, bits, dim)
      .select("query_id", "neighbor_id")

  // ---- IVF (k-means coarse quantizer) -------------------------------

  private def toDoubles(v: Any): Array[Double] = v match {
    case s: scala.collection.Seq[_] => s.map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray
  }

  /** Deterministic Lloyd training over `cvec` = (__id, __v). The
    * centroid set is DRIVER-SMALL by construction (nlist rows), so it
    * is collected and shipped back as literals — which makes every
    * corpus-side stage a pure projection:
    *  - init: `nlist` corpus vectors picked by hash order
    *    (deterministic spread sample, no rand()), collected;
    *  - assign: argmax over nlist literal-centroid dot products in ONE
    *    codegen'd projection per corpus row — ZERO corpus shuffles;
    *  - update: posexplode + per-(cell,dim) mean — map-side partial
    *    aggregation means only nlist×dim rows per task reach the
    *    (tiny) shuffle, and the nlist×dim means are collected.
    * `iters` is small (quantizer quality, not convergence, is the
    * goal). At 100 TB you train on a sample — set
    * `spark.graft.ann.trainFraction` (see [[trainSample]]); the
    * assign path is the part that must stream the full corpus, and it
    * does so shuffle-free. */
  /** Deterministic training sample for the Lloyd trainers, governed
    * by session conf `spark.graft.ann.trainFraction` (default 1.0 =
    * train on everything). At 100 TB the codebooks' quality saturates
    * long before the corpus is exhausted — Lloyd over a hash-picked
    * few-percent sample yields near-identical books at a fraction of
    * the training scans, while ENCODING still streams the full corpus
    * (the part that must see every row). xxhash64-mod keeps the
    * sample deterministic across runs/engines — no rand(). */
  private def trainSample(df: DataFrame, idExpr: Column): DataFrame = {
    val frac = df.sparkSession.conf
      .get("spark.graft.ann.trainFraction", "1.0").toDouble
    require(frac > 0.0 && frac <= 1.0, s"bad trainFraction $frac")
    if (frac >= 1.0) df
    else df.where(pmod(xxhash64(idExpr.cast("string")), lit(1000000L))
      < lit(math.round(frac * 1000000)))
  }

  private def trainCentroids(cvec0: DataFrame, nlist: Int,
                             iters: Int): Array[(Int, Array[Double])] = {
    val cvec = trainSample(cvec0, col("__id"))
    // init: plans as TakeOrderedAndProject (distributed top-k, no
    // global sort), then nlist rows land on the driver
    var cents: Array[(Int, Array[Double])] = cvec
      .orderBy(xxhash64(col("__id").cast("string")), col("__id"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, toDoubles(r.get(1))) }
    for (_ <- 0 until iters) {
      // the assignment is STAGED below the explode: a non-generator
      // expression in the same select as posexplode lands in the
      // Project ABOVE the Generate and recomputes once per EXPLODED
      // row (dim×, not 1×) — measured 11× on the PQ twin of this loop
      val means = withCell(cvec.select(col("__v")), col("__v"),
          cents, "cell")
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      // means rounded to float precision, as the previous formulation
      // stored centroids as array<float> — keeps assignments identical
      cents = means.groupBy(_.getInt(0)).map { case (cell, rs) =>
        (cell,
          rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat.toDouble).toArray)
      }.toArray.sortBy(_._1)
    }
    cents
  }

  /** score_i = (v · c_i) / ||c_i||: same argmax as cosine (1/||v|| is
    * a common positive factor), one native dot per centroid, and the
    * zero-norm centroid degenerates to score 0 exactly like
    * cosineFromParts. argmax via greatest over (score, -cell) structs
    * — ties break to the SMALLEST cell, matching max_by semantics. */
  private def cellOf(cents: Array[(Int, Array[Double])],
                     v: Column): Column = {
    val scored = cents.map { case (cell, c) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      val inv = if (n == 0.0) 0.0 else 1.0 / n
      struct((VecFns.dot(v, typedlit(c.toSeq)) * lit(inv)).as("s"),
        lit(-cell).as("negc"))
    }
    val best =
      if (scored.length == 1) scored.head else greatest(scored.toSeq: _*)
    -best.getField("negc")
  }

  /** Flat argmax stops paying past this many centroids; above it,
    * [[withCell]] switches to the two-level IVF-of-centroids
    * assignment. Gates run nlist ≤ 16 (flat, byte-stable results);
    * the adaptive-nlist corpora cross 64 around ~130k vectors. */
  private val twoLevelFlatMax = 64

  /** Driver-side mirror of [[cellOf]]'s score (v·c/||c||, ties to the
    * smallest index) for the two-level index build — pure Scala over
    * the ALREADY-DRIVER-RESIDENT centroid array, no Spark jobs. */
  private def argBest(sup: Array[Array[Double]],
                      v: Array[Double]): Int = {
    var best = 0; var bs = Double.NegativeInfinity; var i = 0
    while (i < sup.length) {
      val c = sup(i)
      var d = 0.0; var n = 0.0; var j = 0
      while (j < c.length) { d += v(j) * c(j); n += c(j) * c(j); j += 1 }
      val s = if (n == 0.0) 0.0 else d / math.sqrt(n)
      if (s > bs) { bs = s; best = i }
      i += 1
    }
    best
  }

  /** Group `cents` into ~√k super-groups by a tiny driver-side Lloyd
    * over the centroids themselves (k rows — microseconds next to
    * the corpus scan). Returns (super-centroid, member centroids)
    * with empty groups dropped; deterministic (spread-sample init in
    * cell order, fixed 2 iterations, tie-to-smallest). */
  private def twoLevelIndex(cents: Array[(Int, Array[Double])])
      : Array[(Array[Double], Array[(Int, Array[Double])])] = {
    val g = math.max(2, math.round(math.sqrt(cents.length.toDouble)).toInt)
    var sup = Array.tabulate(g)(i =>
      cents((i.toLong * cents.length / g).toInt)._2)
    for (_ <- 0 until 2) {
      val grouped = cents.groupBy(c => argBest(sup, c._2))
      sup = Array.tabulate(g) { i =>
        grouped.get(i) match {
          case Some(ms) =>
            val dim = ms.head._2.length
            val m = new Array[Double](dim)
            ms.foreach { c =>
              var j = 0; while (j < dim) { m(j) += c._2(j); j += 1 } }
            var j = 0; while (j < dim) { m(j) /= ms.length; j += 1 }
            m
          case None => sup(i)
        }
      }
    }
    val byG = cents.groupBy(c => argBest(sup, c._2))
    (0 until g).toArray.flatMap(i =>
      byG.get(i).map(ms => (sup(i), ms.sortBy(_._1))))
  }

  /** `df` + `out` = the k-means cell of `v` under `cents`. Up to
    * [[twoLevelFlatMax]] centroids this is the flat [[cellOf]] argmax
    * (ONE codegen'd projection, n·k MACs). Past it — the adaptive-
    * nlist regime where k ∝ n made flat assignment ~40 % of semDedup
    * cost at sf10 and growing ~quadratically — assignment goes TWO-
    * LEVEL: stage 1 argmaxes ~√k literal super-centroids (trained by
    * [[twoLevelIndex]]); stage 2 argmaxes only the chosen group's
    * members through a lazily-codegen'd CASE — per-row cost ~2√k·dim
    * MACs, still zero shuffles. The super-cell lands in its OWN
    * projection so the CASE conditions reference a computed column,
    * not g recomputations of the stage-1 argmax. The assignment is
    * the standard IVF approximation of the flat argmax and stays
    * fully deterministic; semDedup's oracle embeds the assignment
    * from the SAME path (kmeansAssign), so gate and oracle move
    * together by construction. */
  private def withCell(df: DataFrame, v: Column,
                       cents: Array[(Int, Array[Double])],
                       out: String): DataFrame =
    if (cents.length <= twoLevelFlatMax)
      df.withColumn(out, cellOf(cents, v))
    else {
      val idx = twoLevelIndex(cents)
      // tightly-clustered centroids can collapse every group into one
      // super-centroid (empty groups drop) — stage 1 then has nothing
      // to choose and greatest() needs >= 2 args: flat-assign over
      // the single group's members (== all centroids)
      if (idx.length == 1)
        return df.withColumn(out, cellOf(idx.head._2, v))
      val sScored = idx.zipWithIndex.map { case ((sc, _), i) =>
        val n = math.sqrt(sc.map(x => x * x).sum)
        val inv = if (n == 0.0) 0.0 else 1.0 / n
        struct((VecFns.dot(v, typedlit(sc.toSeq)) * lit(inv)).as("s"),
          lit(-i).as("negc"))
      }
      val staged = df.withColumn("__graft_scell",
        -greatest(sScored.toSeq: _*).getField("negc"))
      val cell = idx.zipWithIndex.foldRight(lit(-1)) {
        case (((_, members), i), acc) =>
          when(col("__graft_scell") === i, cellOf(members, v))
            .otherwise(acc)
      }
      staged.withColumn(out, cell).drop("__graft_scell")
    }

  /** Corpus → k-means cell assignment as ONE projection over the scan
    * (no shuffle; two projections in the two-level regime — see
    * [[withCell]]). Returns (idCol, cell). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   nlist: Int = 16, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")), nlist, iters)
    withCell(df.select(col(idCol), col(vecCol).as("__v")),
        col("__v"), cents, "cell")
      .select(col(idCol), col("cell"))
  }

  /** Probed (query, corpus-cell) pair frame shared by `ivfTopK` and
    * its oracle's candidate dump. */
  private def ivfJoined(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, nlist: Int,
                        nprobe: Int, iters: Int): DataFrame = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cents = trainCentroids(cvec, nlist, iters)
    // corpus → cell assignment: ONE projection over the scan
    val corpusCells = withCell(cvec, col("__v"), cents, "cell")
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        VecFns.norm(col("__v")).as("__cn"), col("cell"))
    // queries → top-nprobe cells each: sort the literal score array
    // ascending by (-score, cell) and keep the first nprobe — no join,
    // no window; the query side stays driver-small and broadcasts
    val probeArr = array_sort(array(cents.map { case (cell, c) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      val inv = if (n == 0.0) 0.0 else 1.0 / n
      struct((-VecFns.dot(col("__qv"), typedlit(c.toSeq)) * lit(inv)).as("negs"),
        lit(cell).as("cell"))
    }.toSeq: _*))
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
          VecFns.norm(col(vecCol)).as("__qn"))
        .select(col("query_id"), col("__qv"), col("__qn"),
          explode(slice(probeArr, 1, nprobe)).as("__pc"))
        .select(col("query_id"), col("__qv"), col("__qn"),
          col("__pc").getField("cell").as("cell")))
    probes.join(corpusCells, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
  }

  /** IVF (inverted-file) ANN — the other classic scale path besides
    * LSH: a coarse k-means quantizer splits the corpus into `nlist`
    * cells, each query probes only its `nprobe` nearest cells, and the
    * exact cosine runs within those cells (~nprobe/nlist of the
    * data). See `trainCentroids` for why no corpus stage shuffles. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    ivfJoined(queries, corpus, idCol, vecCol, nlist, nprobe, iters)
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** The (query_id, neighbor_id) candidate pairs `ivfTopK` ranks —
    * deterministic (hash-order init, float-rounded means), so a
    * second run reproduces the query's probe set exactly. */
  def ivfCandidatePairs(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, nlist: Int = 16,
                        nprobe: Int = 4, iters: Int = 2): DataFrame =
    ivfJoined(queries, corpus, idCol, vecCol, nlist, nprobe, iters)
      .select("query_id", "neighbor_id")

  // ---- IVF-PQ (coarse cells + compressed re-rank) --------------------

  /** Probed (query, corpus-cell) pair frame where the corpus side
    * carries its RESIDUAL-PQ reconstruction (centroid + decoded
    * residual — the FAISS IVF-PQ coding) instead of the raw vector —
    * shared by `ivfPqTopK` and its oracle's candidate dump. Cells are
    * DENSE ARRAY INDICES of the trained centroid list (a Lloyd cell
    * can die; the kernel and the probe side index the same array). */
  private def ivfPqJoined(queries: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, nlist: Int,
                          nprobe: Int, iters: Int, m: Int, ksub: Int,
                          dim: Int, pqIters: Int): DataFrame = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cents = trainCentroids(cvec, nlist, iters).sortBy(_._1).map(_._2)
    val books = trainResidualBooks(corpus, idCol, vecCol, cents, m, ksub,
      dim, pqIters)
    ivfPqJoinedWith(queries, corpus, idCol, vecCol, cents, books, nprobe)
  }

  /** [[ivfPqJoined]] against PRECOMPUTED centroids + codebooks — lets
    * an oracle builder train once and derive both the candidate set
    * and the code table from the same training. */
  private def ivfPqJoinedWith(queries: DataFrame, corpus: DataFrame,
                              idCol: String, vecCol: String,
                              cents: Array[Array[Double]],
                              books: Array[Array[Array[Double]]],
                              nprobe: Int): DataFrame = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // ONE projection over the corpus scan computes cell + codes +
    // reconstruction; at scale (cell, codes) are precomputed columns
    // and this scan reads ~33 bytes/vector instead of 256
    val rc = rpqEncodeCol(cents, books, col("__v"))
    val corpusCells = cvec
      .select(col("__id").as("neighbor_id"), rc.as("__rc"))
      .select(col("neighbor_id"),
        element_at(col("__rc"), 1).as("cell"),
        rpqDecodeCol(cents, books, col("__rc")).as("__cv"))
      .withColumn("__cn", VecFns.norm(col("__cv")))
    val probeArr = array_sort(array(cents.zipWithIndex.map { case (c, cell) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      val inv = if (n == 0.0) 0.0 else 1.0 / n
      struct((-VecFns.dot(col("__qv"), typedlit(c.toSeq)) * lit(inv)).as("negs"),
        lit(cell).as("cell"))
    }.toSeq: _*))
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
          VecFns.norm(col(vecCol)).as("__qn"))
        .select(col("query_id"), col("__qv"), col("__qn"),
          explode(slice(probeArr, 1, nprobe)).as("__pc"))
        .select(col("query_id"), col("__qv"), col("__qn"),
          col("__pc").getField("cell").as("cell")))
    probes.join(corpusCells, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
  }

  /** IVF-PQ ANN — the architecture a 100 TB vector corpus actually
    * runs: an IVF coarse quantizer bounds WHICH vectors each query
    * touches (nprobe/nlist of the corpus), and product quantization
    * bounds WHAT the scan reads per touched vector (codes, not
    * floats). Coding is RESIDUAL PQ (codes over x − centroid(x), the
    * FAISS IVF-PQ scheme — spec-asserted to reconstruct closer than
    * plain PQ at the same budget) and ranking is asymmetric —
    * full-precision query against centroid + decoded residual. Both
    * trainings are deterministic, so the oracle re-derives the
    * ranking from the embedded candidates + cells + centroids +
    * codes + codebooks. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16,
                nprobe: Int = 4, iters: Int = 2, m: Int = 32,
                ksub: Int = 256, dim: Int = 64,
                pqIters: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    ivfPqJoined(queries, corpus, idCol, vecCol, nlist, nprobe, iters,
        m, ksub, dim, pqIters)
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** The (query_id, neighbor_id) candidate pairs `ivfPqTopK` ranks —
    * deterministic, for the oracle's independent re-ranking. */
  def ivfPqCandidatePairs(queries: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String,
                          nlist: Int = 16, nprobe: Int = 4,
                          iters: Int = 2, m: Int = 32, ksub: Int = 256,
                          dim: Int = 64, pqIters: Int = 2): DataFrame =
    ivfPqJoined(queries, corpus, idCol, vecCol, nlist, nprobe, iters,
        m, ksub, dim, pqIters)
      .select("query_id", "neighbor_id")

  /** Candidate pairs against precomputed centroids + codebooks (e.g.
    * the pair returned by [[residualPqCodes]]) — avoids retraining. */
  def ivfPqCandidatePairsWith(queries: DataFrame, corpus: DataFrame,
                              idCol: String, vecCol: String,
                              cents: Array[Array[Double]],
                              books: Array[Array[Array[Double]]],
                              nprobe: Int = 4): DataFrame =
    ivfPqJoinedWith(queries, corpus, idCol, vecCol, cents, books, nprobe)
      .select("query_id", "neighbor_id")

  /** The PQ-ranked refine pool: per query, the `refine` best candidates
    * by the IVF-PQ asymmetric score — the FAISS `IndexRefine` front
    * half. Deterministic (training + rounded scores + id tie-break),
    * so an oracle can re-derive the final ranking from these pairs. */
  private def ivfPqRefinePool(queries: DataFrame, corpus: DataFrame,
                              idCol: String, vecCol: String, nlist: Int,
                              nprobe: Int, iters: Int, m: Int, ksub: Int,
                              dim: Int, pqIters: Int,
                              refine: Int): DataFrame = {
    val wPq = Window.partitionBy(col("query_id"))
      .orderBy(col("__pqs").desc, col("neighbor_id").asc)
    ivfPqJoined(queries, corpus, idCol, vecCol, nlist, nprobe, iters,
        m, ksub, dim, pqIters)
      .withColumn("__pqs", CleanFns.roundRepro(pairCos, 4))
      .withColumn("__pqr", row_number().over(wPq))
      .where(col("__pqr") <= refine)
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("neighbor_id"))
  }

  /** IVF-PQ + refine (FAISS IVFADC + `IndexRefine`): the PQ stage
    * bounds bytes-per-probed-vector (~m+4 B), then only each query's
    * top-`refine` PQ candidates are re-ranked against the SQ8
    * reconstruction (1 B/dim). At 100 TB the refine pool is a
    * per-query constant (`refine` rows joined against the persisted
    * SQ8 store, a key-partitioned join on vector id), so effective
    * scan cost stays ~(m + dim·refine/probed) bytes per probed vector
    * — the standard way to buy back recall lost to 8× PQ compression
    * without rescanning raw floats. Fully deterministic end to end:
    * the pool is PQ-score-ranked with id tie-breaks and SQ8 is floor
    * arithmetic, so an oracle re-derives the refine ranking from the
    * pool pairs + the raw table alone. */
  def ivfPqRefineTopK(queries: DataFrame, corpus: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
                      m: Int = 32, ksub: Int = 256, dim: Int = 64,
                      pqIters: Int = 2, refine: Int = 50): DataFrame = {
    val pool = ivfPqRefinePool(queries, corpus, idCol, vecCol, nlist,
      nprobe, iters, m, ksub, dim, pqIters, refine)
    val (lo, hi) = dimBounds(corpus, vecCol, dim)
    val recon = VecFns.sqReconstruct(col(vecCol), lo.toSeq, hi.toSeq)
    val c = corpus.select(col(idCol).as("neighbor_id"), recon.as("__cv"))
      .select(col("neighbor_id"), col("__cv"),
        VecFns.norm(col("__cv")).as("__cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pool.join(c, Seq("neighbor_id"))
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** The refine-pool pairs `ivfPqRefineTopK` re-ranks — for the
    * oracle's independent SQ8 re-ranking. */
  def ivfPqRefineCandidatePairs(queries: DataFrame, corpus: DataFrame,
                                idCol: String, vecCol: String,
                                nlist: Int = 16, nprobe: Int = 4,
                                iters: Int = 2, m: Int = 32,
                                ksub: Int = 256, dim: Int = 64,
                                pqIters: Int = 2,
                                refine: Int = 50): DataFrame =
    ivfPqRefinePool(queries, corpus, idCol, vecCol, nlist, nprobe,
        iters, m, ksub, dim, pqIters, refine)
      .select("query_id", "neighbor_id")

  // ---- embedding near-dup / SemDeDup --------------------------------

  /** Triangle-block salt count for the embed bucket self-join:
    * 1 (plain join) until the corpus is big enough for hyperplane-
    * bucket skew to matter, then one doubling per decade — the sf10
    * watch item measured the TOP bucket fanning ~2.7×/decade
    * (59→159, sub-linear) while adaptiveBits holds the MEAN at
    * targetBucket, so doubling salts per decade keeps the per-block
    * pair work of the hot bucket bounded. */
  def adaptiveBucketSalts(n: Long, floor: Long = 100000L): Int = {
    var s = 1; var m = n
    while (m >= floor && s < 16) { s *= 2; m /= 10 }
    s
  }

  /** Same-LSH-bucket (doc_a < doc_b) pair frame shared by
    * `cosineNearDupPairs` and its oracle's candidate dump.
    *
    * salts == 1: plain bucket self-join — a hot bucket's whole
    * quadratic pair-space lands on ONE task (real embeddings cluster:
    * the top hyperplane bucket runs ~5× the mean and grows
    * ~2.7×/decade). salts > 1: the Dedup.candidatePairs triangle
    * block — members split into `salts` deterministic id-hash groups
    * and the bucket's pair-space is covered EXACTLY ONCE by the
    * salts*(salts+1)/2 (p <= q) group blocks, each its own shuffle
    * key, so per-task pair work drops ~salts²× for ~(salts+1)/2×
    * more shuffle volume (here the rows carry the vectors, so salt
    * only when skew warrants — [[adaptiveBucketSalts]]). Unlike
    * banded minhash a doc has ONE bucket, so each pair meets in one
    * (bucket, p, q) block and no distinct is needed: the diagonal
    * keeps a < b, an off-diagonal block meets each pair once and
    * least/greatest canonicalizes orientation (cosine is symmetric —
    * the vectors need not follow the swap). */
  private def bucketJoined(df: DataFrame, idCol: String, vecCol: String,
                           bits: Int, dim: Int,
                           salts: Int = 1): DataFrame = {
    val sig = df.select(col(idCol), col(vecCol),
      VecFns.norm(col(vecCol)).as("__n"),
      xxhash64(VecFns.lshSignature(col(vecCol), bits, dim)).as("bucket"))
    if (salts <= 1) {
      val l = sig.select(col("bucket"), col(idCol).as("doc_a"),
        col(vecCol).as("__qv"), col("__n").as("__qn"))
      val r = sig.select(col("bucket"), col(idCol).as("doc_b"),
        col(vecCol).as("__cv"), col("__n").as("__cn"))
      l.join(r, Seq("bucket"))
        .where(col("doc_a") < col("doc_b"))
    } else {
      val g = sig.withColumn("__g",
        pmod(xxhash64(col(idCol)), lit(salts)).cast("int"))
      val l = g.select(col(idCol).as("__a"), col(vecCol).as("__qv"),
        col("__n").as("__qn"), col("bucket"), col("__g").as("p"),
        explode(sequence(col("__g"), lit(salts - 1))).as("q"))
      val r = g.select(col(idCol).as("__b"), col(vecCol).as("__cv"),
        col("__n").as("__cn"), col("bucket"),
        explode(sequence(lit(0), col("__g"))).as("p"),
        col("__g").as("q"))
      l.join(r, Seq("bucket", "p", "q"))
        .where(col("p") =!= col("q") || col("__a") < col("__b"))
        .where(col("__a") =!= col("__b"))
        .withColumn("doc_a", least(col("__a"), col("__b")))
        .withColumn("doc_b", greatest(col("__a"), col("__b")))
    }
  }

  /** Embedding-space near-duplicate pairs: all pairs within the same
    * LSH bucket whose cosine exceeds `threshold` (embedding-cosine
    * near-dup dedup for training corpora). `salts` balances hot
    * buckets without changing the pair set — see [[bucketJoined]]. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bits: Int,
                         dim: Int, salts: Int = 1): DataFrame =
    bucketJoined(df, idCol, vecCol, bits, dim, salts)
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .where(col("cos_sim") >= threshold)
      .select("doc_a", "doc_b", "cos_sim")

  /** The candidate pairs `cosineNearDupPairs` verifies (pre-cosine,
    * pre-threshold) — for the oracle's independent re-check. The
    * salted and plain joins produce the SAME set (the triangle
    * covers each bucket's pair-space exactly once), so the dump
    * never needs the salt parameter. */
  def bucketCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                           bits: Int, dim: Int): DataFrame =
    bucketJoined(df, idCol, vecCol, bits, dim).select("doc_a", "doc_b")

  // ---- scalar-quantized ANN ----------------------------------------

  /** Per-dimension (lo, hi) corpus bounds — `dim` rows by
    * construction, so they collect to the driver and ship back as
    * literals (the literal-centroid pattern). Map-side partial
    * aggregation means only dim×tasks rows reach the (tiny) shuffle. */
  private[graft] def dimBounds(corpus: DataFrame, vecCol: String,
                        dim: Int): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .collect()
    val lo = new Array[Double](dim); val hi = new Array[Double](dim)
    rows.foreach { r =>
      lo(r.getInt(0)) = r.getDouble(1); hi(r.getInt(0)) = r.getDouble(2)
    }
    (lo, hi)
  }

  /** Scalar-quantization (SQ8) ANN: the corpus is quantized to one
    * byte per dimension against per-dimension corpus bounds and ranked
    * by exact cosine against the RECONSTRUCTED vectors (asymmetric
    * distance: the query stays full-precision). The compression tier
    * of an ANN stack — at 100 TB the corpus scan reads 4× fewer bytes
    * than float32 while top-k quality degrades only marginally.
    *
    * Everything on the corpus side is a pure projection over the scan
    * (native SqReconstruct kernel + native VecDot; the bounds are
    * literals), so the only data movement is the top-k window's
    * shuffle of (query_id, neighbor_id, cos) candidate rows — and
    * because quantization is deterministic floor arithmetic, an
    * independent engine re-derives the IDENTICAL result from the raw
    * corpus (full-strength oracle, unlike the bucketing sketches). */
  def sqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int): DataFrame = {
    val (lo, hi) = dimBounds(corpus, vecCol, dim)
    val recon = VecFns.sqReconstruct(col(vecCol), lo.toSeq, hi.toSeq)
    // recon appears in both the vector and its norm; whole-stage
    // codegen's subexpression elimination evaluates the kernel once
    val c = corpus.select(col(idCol).as("neighbor_id"), recon.as("__cv"))
      .select(col("neighbor_id"), col("__cv"),
        VecFns.norm(col("__cv")).as("__cn"))
    rankTopK(withNorm(queries, idCol, "query_id", vecCol, "__qv", "__qn"),
      c, k)
  }

  // ---- product-quantized ANN ---------------------------------------

  /** Deterministic PQ codebooks: `m` subspaces of `dim/m` dimensions,
    * `ksub` centroids each, trained by Lloyd iterations phrased as
    * DataFrame ops. Centroids are driver-small (m×ksub×dim/m values)
    * by construction:
    *  - init: the same `ksub` hash-order corpus vectors seed every
    *    subspace (one TakeOrderedAndProject job, sliced driver-side);
    *  - assign: per subspace, argmin ||x_sub − c||² via the literal-
    *    centroid argmax of (x·c − ||c||²/2) — ONE projection, no
    *    corpus shuffle;
    *  - update: per-(subspace, cell, dim) means via posexplode —
    *    map-side partials mean only m×ksub×(dim/m) rows per task
    *    reach the tiny shuffle.
    * Means are float-rounded like `trainCentroids` so a re-run
    * reproduces codes bit-identically. */
  private[graft] def trainPqCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, dim: Int, iters: Int = 1): Array[Array[Array[Double]]] = {
    val sub = dim / m
    require(sub * m == dim, s"dim $dim not divisible by m $m")
    val train = trainSample(
      corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")),
      col("__id"))
    // init: the same ksub hash-order corpus vectors seed every
    // subspace (TakeOrderedAndProject — distributed top-k, no global
    // sort), sliced driver-side
    var books: Array[Array[Array[Double]]] = {
      val rows = train
        .orderBy(xxhash64(col("__id").cast("string")), col("__id"))
        .limit(ksub).collect()
      Array.tabulate(m)(s => rows.map(r =>
        toDoubles(r.get(1)).slice(s * sub, (s + 1) * sub)))
    }
    for (_ <- 0 until iters) {
      val cells = pqCellsCol(books, col("__v"), sub)
      // staged below the explode (see trainCentroids): inline, the
      // m×ksub argmin recomputes per exploded row — 64× the work,
      // measured 4.0 s → 0.36 s at ksub=256 on sf0.1
      val means = train.select(col("__v"))
        .select(cells.as("__cells"), col("__v"))
        .select(col("__cells"), posexplode(col("__v")).as(Seq("pos", "x")))
        .select((col("pos") / sub).cast("int").as("s"),
          element_at(col("__cells"), (col("pos") / sub).cast("int") + 1)
            .as("cell"),
          pmod(col("pos"), lit(sub)).as("p"), col("x").cast("double").as("x"))
        .groupBy(col("s"), col("cell"), col("p"))
        .agg(avg(col("x")).as("mean"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        // float-rounded, like trainCentroids: re-runs reproduce codes
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDouble(3).toFloat.toDouble
      }
      books = next
    }
    books
  }

  /** Per-row PQ cell assignment for all `m` subspaces as ONE array
    * column: cell_s = argmax over ksub of (x_sub·c − ||c||²/2)
    * (equivalent to argmin L2; ties to the smallest cell). Native
    * kernel ([[graft.plans.PqAssign]]): the composed twin below is
    * m×ksub struct expressions, which Catalyst takes tens of seconds
    * to analyze at m=32 — the same lesson as the LSH signature. */
  private[graft] def pqCellsCol(books: Array[Array[Array[Double]]],
                                    v: Column, sub: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.PqAssign(
      org.apache.spark.sql.GraftColumnBridge.expression(v), books))

  /** Composed-builtins twin of [[pqCellsCol]] — semantic reference,
    * tested bit-identical. Do not use on hot paths. */
  private[graft] def pqCellsComposed(
      books: Array[Array[Array[Double]]], v: Column, sub: Int): Column =
    array(books.zipWithIndex.map { case (book, s) =>
      val xs = slice(v, s * sub + 1, sub)
      val scored = book.zipWithIndex.map { case (c, j) =>
        val half = c.map(x => x * x).sum / 2.0
        struct((VecFns.dot(xs, typedlit(c.toSeq)) - lit(half)).as("sc"),
          lit(-j).as("negj"))
      }
      val best =
        if (scored.length == 1) scored.head else greatest(scored.toSeq: _*)
      (-best.getField("negj")).as(s"c$s")
    }.toSeq: _*)

  /** The PQ-RECONSTRUCTED vector: codes looked up in the codebooks
    * and concatenated — a pure projection over the scan, one native
    * expression node ([[graft.plans.PqReconstruct]]). */
  private[graft] def pqReconCol(books: Array[Array[Array[Double]]],
                                    cells: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.PqReconstruct(
      org.apache.spark.sql.GraftColumnBridge.expression(cells), books))

  /** Composed-builtins twin of [[pqReconCol]] — semantic reference,
    * tested bit-identical. Do not use on hot paths. */
  private[graft] def pqReconComposed(
      books: Array[Array[Array[Double]]], cells: Column): Column =
    flatten(array(books.zipWithIndex.map { case (book, s) =>
      element_at(typedlit(book.map(_.toSeq).toSeq),
        element_at(cells, s + 1) + 1)
    }.toSeq: _*))


  /** Product-quantized ANN: the corpus is encoded as `m` sub-codes
    * (one byte each at ksub ≤ 256 — 32 bytes per 64-dim vector, an 8×
    * compression over float32) and ranked by exact cosine between the
    * full-precision query and the RECONSTRUCTION (concatenated
    * codebook centroids) — asymmetric distance computation. The third
    * tier of the ANN stack: brute force (exact) / SQ8 (4×) / PQ (8×).
    *
    * Corpus-side everything is a projection over the scan (literal
    * codebooks; native dot products); only the top-k window's
    * candidate rows shuffle. Codes are deterministic (hash-order
    * init, float-rounded means), so `pqCodes` re-runs identically and
    * the oracle re-derives the ranking from the embedded codes +
    * codebooks. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 32, ksub: Int = 256,
             dim: Int = 64, iters: Int = 2): DataFrame = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, m, ksub, dim, iters)
    val sub = dim / m
    val recon = pqReconCol(books, pqCellsCol(books, col(vecCol), sub))
    val c = corpus.select(col(idCol).as("neighbor_id"), recon.as("__cv"))
      .select(col("neighbor_id"), col("__cv"),
        VecFns.norm(col("__cv")).as("__cn"))
    rankTopK(withNorm(queries, idCol, "query_id", vecCol, "__qv", "__qn"),
      c, k)
  }

  /** The (id, codes) table `pqTopK` scores, plus the codebooks — what
    * the oracle needs to re-derive the ranking independently. */
  def pqCodes(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 32, ksub: Int = 256, dim: Int = 64, iters: Int = 2)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, m, ksub, dim, iters)
    (corpus.select(col(idCol),
      pqCellsCol(books, col(vecCol), dim / m).as("codes")), books)
  }

  /** OPQ-style rotation: the deterministic randomized-Hadamard
    * orthogonal transform ([[graft.plans.HadamardRotate]]) — cosine
    * rankings are invariant under it, but each coordinate's energy
    * spreads across every PQ subspace. */
  private[graft] def rotateCol(v: Column,
      seed: Long = 0x6A09E667F3BCC908L): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.HadamardRotate(
      org.apache.spark.sql.GraftColumnBridge.expression(v), seed))

  /** PQ ANN behind an OPQ-style rotation: identical code budget to
    * [[pqTopK]] (same m×ksub, same bytes/vector) — both sides are
    * rotated, codebooks are trained on and codes assigned in rotated
    * space, and the asymmetric cosine runs rotated-query vs
    * rotated-reconstruction. Because the transform is orthogonal the
    * ranking target is unchanged; only the quantization error moves
    * (measured: docs/ann_recall.md). */
  def opqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, m: Int = 32, ksub: Int = 256,
              dim: Int = 64, iters: Int = 2): DataFrame =
    pqTopK(queries.withColumn(vecCol, rotateCol(col(vecCol))),
      corpus.withColumn(vecCol, rotateCol(col(vecCol))),
      idCol, vecCol, k, m, ksub, dim, iters)

  /** `opqTopK`'s scored table: (id, codes) in ROTATED space, plus the
    * rotated-space codebooks and the rotation's sign diagonal — with
    * these an oracle re-derives the rotation (dense H from
    * bit_count(i&j), embedded signs), the reconstruction, and the
    * ranking completely independently. */
  def opqCodes(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int = 32, ksub: Int = 256, dim: Int = 64, iters: Int = 2)
      : (DataFrame, Array[Array[Array[Double]]], Array[Int]) = {
    val (codes, books) = pqCodes(
      corpus.withColumn(vecCol, rotateCol(col(vecCol))),
      idCol, vecCol, m, ksub, dim, iters)
    (codes, books, graft.plans.HadamardRotate.signs(0x6A09E667F3BCC908L, dim))
  }

  // ---- residual PQ (the IVF-PQ coding) -------------------------------

  private[graft] def rpqEncodeCol(cents: Array[Array[Double]],
                           books: Array[Array[Array[Double]]],
                           v: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.ResidualPqEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(v), cents, books))

  private[graft] def rpqDecodeCol(cents: Array[Array[Double]],
                           books: Array[Array[Array[Double]]],
                           codes: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.ResidualPqDecode(
        org.apache.spark.sql.GraftColumnBridge.expression(codes), cents,
        books))

  /** Deterministic residual-PQ codebooks: the same Lloyd scheme as
    * [[trainPqCodebooks]] but over RESIDUALS x − centroid(x) against
    * the given coarse quantizer — residuals carry far less energy, so
    * the same code budget reconstructs with less error. Init seeds
    * every subspace with the residuals of the same `ksub` hash-order
    * corpus vectors; per-iteration means come from one posexplode
    * aggregate (the residual value is rebuilt per exploded element
    * with two literal-array lookups, no HOFs); means float-rounded so
    * re-runs reproduce codes bit-identically. */
  private[graft] def trainResidualBooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], m: Int, ksub: Int, dim: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val sub = dim / m
    require(sub * m == dim, s"dim $dim not divisible by m $m")
    val train = trainSample(
      corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")),
      col("__id"))
    var books: Array[Array[Array[Double]]] = {
      val rows = train
        .orderBy(xxhash64(col("__id").cast("string")), col("__id"))
        .limit(ksub).collect()
      val residuals = rows.map { r =>
        val x = toDoubles(r.get(1))
        val cell = graft.plans.ResidualPqEncode.coarseCell(x, cents)
        Array.tabulate(x.length)(i => x(i) - cents(cell)(i))
      }
      Array.tabulate(m)(s => residuals.map(_.slice(s * sub, (s + 1) * sub)))
    }
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    for (_ <- 0 until iters) {
      val rc = rpqEncodeCol(cents, books, col("__v"))
      // staged below the explode (see trainCentroids) — the residual
      // encode is the most expensive assignment of the three trainers
      val means = train.select(col("__v"))
        .select(rc.as("__rc"), col("__v"))
        .select(col("__rc"), posexplode(col("__v")).as(Seq("pos", "x")))
        .select((col("pos") / sub).cast("int").as("s"),
          // codes sit at positions 2.. (1-based); cell at position 1
          element_at(col("__rc"), (col("pos") / sub).cast("int") + 2)
            .as("code"),
          pmod(col("pos"), lit(sub)).as("p"),
          (col("x").cast("double") -
            element_at(element_at(centsLit,
              element_at(col("__rc"), 1) + 1), col("pos") + 1)).as("rx"))
        .groupBy(col("s"), col("code"), col("p"))
        .agg(avg(col("rx")).as("mean"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDouble(3).toFloat.toDouble
      }
      books = next
    }
    books
  }

  /** The (id, codes) table ([cell, code_0..code_{m-1}]) plus the
    * coarse centroids and residual codebooks — everything the oracle
    * needs to re-derive an IVF-PQ ranking independently. */
  def residualPqCodes(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int = 16, iters: Int = 2, m: Int = 32,
                      ksub: Int = 256, dim: Int = 64, pqIters: Int = 2)
      : (DataFrame, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cents = trainCentroids(cvec, nlist, iters).sortBy(_._1).map(_._2)
    val books = trainResidualBooks(corpus, idCol, vecCol, cents, m, ksub,
      dim, pqIters)
    (corpus.select(col(idCol),
      rpqEncodeCol(cents, books, col(vecCol)).as("codes")), cents, books)
  }

  // ---- semantic decontamination ------------------------------------

  /** Semantic (embedding-space) benchmark decontamination: flag every
    * corpus vector whose cosine against ANY benchmark vector reaches
    * `threshold` — the eval-leakage guard n-gram decontamination
    * misses (paraphrases share no grams but sit next to the benchmark
    * item in embedding space).
    *
    * The benchmark set is driver-small by definition, so it ships as
    * literal vectors and the whole operator is ONE projection over the
    * corpus scan: per row, |bench| native dot products, an in-row
    * argmax (greatest over (sim, -bench_id) structs — ties break to
    * the smallest benchmark id), zero joins and zero shuffles. The
    * groupBy alternative would shuffle |corpus|×|bench| pair rows.
    * Returns every corpus row as (idCol, bench_id, max_bench_sim,
    * contaminated). */
  def semanticDecon(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, vecCol: String,
                    threshold: Double): DataFrame = {
    val bench = benchmark.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), toDoubles(r.get(1))))
      .sortBy(_._1)
    require(bench.nonEmpty, "semanticDecon needs a non-empty benchmark")
    val vNorm = VecFns.norm(col(vecCol))
    // cos_i = dot(v, b_i) / (|v| * |b_i|), rounded BEFORE the argmax so
    // the tie-break decision is engine-portable (the oracle re-ranks
    // the same rounded values)
    val scored = bench.map { case (bid, b) =>
      val bn = math.sqrt(b.map(x => x * x).sum)
      val cos = CleanFns.roundRepro(
        VecFns.cosineFromParts(
          VecFns.dot(col(vecCol), typedlit(b.toSeq)), vNorm, lit(bn)), 4)
      struct(cos.as("s"), lit(-bid).as("negb"))
    }
    val best =
      if (scored.length == 1) scored.head else greatest(scored.toSeq: _*)
    corpus.select(col(idCol),
        best.getField("s").as("max_bench_sim"),
        (-best.getField("negb")).as("bench_id"))
      .withColumn("contaminated",
        (col("max_bench_sim") >= threshold).cast("int"))
  }

  /** Cluster count that keeps the expected CELL POPULATION constant
    * as the corpus grows — the within-cell pair stage is quadratic in
    * cell size, so a FIXED nlist turns semantic dedup O(n²/k) (the
    * sf10 stress measured exactly that: 78x CPU at 10x data); with
    * k ∝ n the pair stage is O(n·targetCell), linear. The assignment
    * scan is flat n·k MACs only up to [[twoLevelFlatMax]] centroids;
    * past it [[withCell]] switches to the two-level
    * (IVF-of-centroids) assignment, ~n·2√k. */
  def adaptiveNlist(n: Long, targetCell: Int = 2048,
                    floor: Int = 8): Int =
    math.max(floor, ((n + targetCell - 1) / targetCell).toInt)

  /** Hyperplane-LSH bit count that keeps the expected BUCKET
    * POPULATION constant as the corpus grows (2^bits buckets): fixed
    * bits make the within-bucket all-pairs stage O(n²/2^bits) — the
    * sf10 stress measured 81x CPU at 10x data on 6 bits; one extra
    * bit per doubling keeps it linear. */
  def adaptiveBits(n: Long, targetBucket: Int = 32, floor: Int = 6)
      : Int = {
    var bits = floor
    while ((n >> bits) > targetBucket && bits < 30) bits += 1
    bits
  }

  /** SemDeDup (semantic dedup, Abbas et al. 2023's shape): k-means
    * cluster the embedding space, then WITHIN each cluster drop every
    * vector that has a near-duplicate (cosine >= threshold) with a
    * smaller id — one survivor per semantic near-dup group, and only
    * same-cluster pairs are ever compared (the quadratic stays inside
    * cells). Returns the KEPT rows as (idCol, cell).
    *
    * Cluster assignment is a shuffle-free projection (literal
    * centroids); the within-cell pair join shuffles (id, vec) once on
    * the cell key. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, threshold: Double = 0.5,
               iters: Int = 2): DataFrame = {
    val cents = trainCentroids(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")), nlist, iters)
    val a = withCell(df.select(col(idCol), col(vecCol).as("__v"),
        VecFns.norm(col(vecCol)).as("__n")), col("__v"), cents, "cell")
    val l = a.select(col("cell"), col(idCol).as("__ida"),
      col("__v").as("__qv"), col("__n").as("__qn"))
    val r = a.select(col("cell"), col(idCol).as("__idb"),
      col("__v").as("__cv"), col("__n").as("__cn"))
    val drops = l.join(r, Seq("cell"))
      .where(col("__idb") < col("__ida"))
      .where(CleanFns.roundRepro(pairCos, 4) >= threshold)
      .select(col("__ida").as(idCol)).distinct()
    a.select(col(idCol), col("cell"))
      .join(drops, Seq(idCol), "left_anti")
  }

  /** Johnson–Lindenstrauss sign random projection of the embedding
    * column to `kOut` integer micro-unit components (the
    * dimensionality cut an ANN pipeline takes before LSH/IVF when the
    * raw dimension makes signatures expensive). One corpus scan, zero
    * shuffles — the per-row dim×kOut MAC loop is the native
    * [[graft.plans.SignProject]] codegen kernel, and the seedless
    * md5-parity ±1 matrix makes every component an exact integer an
    * ANSI oracle re-derives. Returns (idCol, dim, value_micro) rows —
    * flat, so downstream LSH banding groups by (dim-block) without
    * array surgery. */
  def randomProject(df: DataFrame, embCol: String, idCol: String,
                    kOut: Int = 16): DataFrame = {
    val proj = org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.SignProject(
        org.apache.spark.sql.GraftColumnBridge.expression(col(embCol)), kOut))
    df.select(col(idCol), posexplode(proj).as(Seq("dim", "value_micro")))
      .select(col(idCol), col("dim").cast("int").as("dim"),
        col("value_micro"))
  }
}
