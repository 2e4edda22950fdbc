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
    * goal). At 100 TB you'd train on a sample; the assign path is the
    * part that must stream the full corpus, and it does so
    * shuffle-free. */
  private def trainCentroids(cvec: DataFrame, nlist: Int,
                             iters: Int): Array[(Int, Array[Double])] = {
    // init: plans as TakeOrderedAndProject (distributed top-k, no
    // global sort), then nlist rows land on the driver
    var cents: Array[(Int, Array[Double])] = cvec
      .orderBy(xxhash64(col("__id").cast("string")), col("__id"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, toDoubles(r.get(1))) }
    for (_ <- 0 until iters) {
      val means = cvec
        .select(cellOf(cents, col("__v")).as("cell"),
          posexplode(col("__v")).as(Seq("pos", "x")))
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

  /** Corpus → k-means cell assignment as ONE projection over the scan
    * (no shuffle). Returns (idCol, cell). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   nlist: Int = 16, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")), nlist, iters)
    df.select(col(idCol), cellOf(cents, col(vecCol)).as("cell"))
  }

  /** Probed (query, corpus-cell) pair frame shared by `ivfTopK` and
    * its oracle's candidate dump. */
  private def ivfJoined(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, nlist: Int,
                        nprobe: Int, iters: Int): DataFrame = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cents = trainCentroids(cvec, nlist, iters)
    // corpus → cell assignment: ONE projection over the scan
    val corpusCells = cvec
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        VecFns.norm(col("__v")).as("__cn"), cellOf(cents, col("__v")).as("cell"))
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

  // ---- embedding near-dup / SemDeDup --------------------------------

  /** Same-LSH-bucket (doc_a < doc_b) pair frame shared by
    * `cosineNearDupPairs` and its oracle's candidate dump. */
  private def bucketJoined(df: DataFrame, idCol: String, vecCol: String,
                           bits: Int, dim: Int): DataFrame = {
    val sig = df.select(col(idCol), col(vecCol),
      VecFns.norm(col(vecCol)).as("__n"),
      xxhash64(VecFns.lshSignature(col(vecCol), bits, dim)).as("bucket"))
    val l = sig.select(col("bucket"), col(idCol).as("doc_a"),
      col(vecCol).as("__qv"), col("__n").as("__qn"))
    val r = sig.select(col("bucket"), col(idCol).as("doc_b"),
      col(vecCol).as("__cv"), col("__n").as("__cn"))
    l.join(r, Seq("bucket"))
      .where(col("doc_a") < col("doc_b"))
  }

  /** Embedding-space near-duplicate pairs: all pairs within the same
    * LSH bucket whose cosine exceeds `threshold` (embedding-cosine
    * near-dup dedup for training corpora). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bits: Int,
                         dim: Int): DataFrame =
    bucketJoined(df, idCol, vecCol, bits, dim)
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .where(col("cos_sim") >= threshold)
      .select("doc_a", "doc_b", "cos_sim")

  /** The candidate pairs `cosineNearDupPairs` verifies (pre-cosine,
    * pre-threshold) — for the oracle's independent re-check. */
  def bucketCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                           bits: Int, dim: Int): DataFrame =
    bucketJoined(df, idCol, vecCol, bits, dim).select("doc_a", "doc_b")

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
    val a = df.select(col(idCol), col(vecCol).as("__v"),
      VecFns.norm(col(vecCol)).as("__n"),
      cellOf(cents, col(vecCol)).as("cell"))
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
}
