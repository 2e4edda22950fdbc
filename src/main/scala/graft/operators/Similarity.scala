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

  /** LSH-bucketed ANN: signature match first, exact cosine within the
    * bucket. Recall < 1 by construction; raise `bits` for precision,
    * lower it for recall. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int, dim: Int): DataFrame = {
    val sig = (df: DataFrame, id: String, v: String, n: String) =>
      df.select(col(idCol).as(id), col(vecCol).as(v),
        VecFns.norm(col(vecCol)).as(n),
        xxhash64(VecFns.lshSignature(col(vecCol), bits, dim)).as("bucket"))
    val q = broadcast(sig(queries, "query_id", "__qv", "__qn"))
    val c = sig(corpus, "neighbor_id", "__cv", "__cn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** IVF (inverted-file) ANN — the other classic scale path besides
    * LSH: a coarse k-means quantizer splits the corpus into `nlist`
    * cells, each query probes only its `nprobe` nearest cells, and the
    * exact cosine runs within those cells (~nprobe/nlist of the data).
    *
    * Training is Lloyd's algorithm expressed as DataFrame ops — no
    * driver-side loops over vectors:
    *  - init: `nlist` corpus vectors picked by hash order (deterministic
    *    spread sample, no rand());
    *  - assign: corpus × broadcast(centroids), argmin by `min_by` —
    *    a map-only stage, no shuffle;
    *  - update: posexplode the vectors, average per (cell, dimension),
    *    rebuild arrays — two narrow shuffles of nlist×dim rows.
    * `iters` is small (quantizer quality, not convergence, is the
    * goal). At 100 TB you'd train on a sample; the assign/probe path
    * is the part that must stream the full corpus, and it does so
    * with broadcast centroids only. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 2): DataFrame = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))

    // deterministic init: nlist vectors in xxhash64(id) order.
    // orderBy+limit plans as TakeOrderedAndProject (distributed top-k)
    // — no global sort; the window below runs over nlist rows only.
    val init = cvec
      .orderBy(xxhash64(col("__id").cast("string")), col("__id"))
      .limit(nlist)
      .select((row_number().over(
          Window.orderBy(xxhash64(col("__id").cast("string")), col("__id")))
          - 1).as("cell"),
        col("__v").as("cvec"))

    // Lloyd iterations: argmin-assign, then per-dimension mean
    val centroids = (0 until iters).foldLeft(init) { (cent, _) =>
      val c = broadcast(cent.select(col("cell"),
        col("cvec"), VecFns.norm(col("cvec")).as("cn")))
      val assigned = cvec
        .join(c, expr("true"))
        .withColumn("__cos", VecFns.cosineFromParts(
          VecFns.dot(col("__v"), col("cvec")),
          VecFns.norm(col("__v")), col("cn")))
        .groupBy(col("__id"), col("__v"))
        .agg(max_by(col("cell"), struct(col("__cos"), -col("cell"))).as("cell"))
      assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"),
          transform(col("pm"), p => p("m").cast("float")).as("cvec"))
    }
    val cent = broadcast(centroids.select(col("cell"), col("cvec"),
      VecFns.norm(col("cvec")).as("cn")))

    // corpus → cell assignment (map-only: broadcast centroids)
    val corpusCells = cvec
      .join(cent, expr("true"))
      .withColumn("__cos", VecFns.cosineFromParts(
        VecFns.dot(col("__v"), col("cvec")),
        VecFns.norm(col("__v")), col("cn")))
      .groupBy(col("__id"), col("__v"))
      .agg(max_by(col("cell"), struct(col("__cos"), -col("cell"))).as("cell"))
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        VecFns.norm(col("__v")).as("__cn"), col("cell"))

    // queries → top-nprobe cells each
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
        .join(cent, expr("true"))
        .withColumn("__cos", VecFns.cosineFromParts(
          VecFns.dot(col("__qv"), col("cvec")),
          VecFns.norm(col("__qv")), col("cn")))
        .withColumn("__pr", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("__cos").desc, col("cell").asc)))
        .where(col("__pr") <= nprobe)
        .select(col("query_id"), col("__qv"),
          VecFns.norm(col("__qv")).as("__qn"), col("cell")))

    // exact cosine only within probed cells
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    probes.join(corpusCells, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Embedding-space near-duplicate pairs: all pairs within the same
    * LSH bucket whose cosine exceeds `threshold` (embedding-cosine
    * near-dup dedup for training corpora). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bits: Int,
                         dim: Int): DataFrame = {
    val sig = df.select(col(idCol), col(vecCol),
      VecFns.norm(col(vecCol)).as("__n"),
      xxhash64(VecFns.lshSignature(col(vecCol), bits, dim)).as("bucket"))
    val l = sig.select(col("bucket"), col(idCol).as("doc_a"),
      col(vecCol).as("__qv"), col("__n").as("__qn"))
    val r = sig.select(col("bucket"), col(idCol).as("doc_b"),
      col(vecCol).as("__cv"), col("__n").as("__cn"))
    l.join(r, Seq("bucket"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("cos_sim", CleanFns.roundRepro(pairCos, 4))
      .where(col("cos_sim") >= threshold)
      .select("doc_a", "doc_b", "cos_sim")
  }
}
