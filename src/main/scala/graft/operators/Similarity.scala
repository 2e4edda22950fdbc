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
    * The centroid set is DRIVER-SMALL by construction (nlist rows), so
    * it is collected and shipped back as literals — which makes every
    * corpus-side stage a pure projection:
    *  - init: `nlist` corpus vectors picked by hash order (deterministic
    *    spread sample, no rand()), collected;
    *  - assign: argmax over nlist literal-centroid dot products,
    *    computed as `greatest` over (score, -cell) structs in ONE
    *    codegen'd projection per corpus row — ZERO corpus shuffles, no
    *    join, no aggregation (cosine argmax == dot/||c|| argmax: the
    *    query-side norm is a common positive factor);
    *  - update: posexplode + per-(cell,dim) mean — map-side partial
    *    aggregation means only nlist×dim rows per task reach the
    *    (tiny) shuffle, and the nlist×dim means are collected.
    * `iters` is small (quantizer quality, not convergence, is the
    * goal). At 100 TB you'd train on a sample; the assign/probe path
    * is the part that must stream the full corpus, and it now does so
    * shuffle-free. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 2): DataFrame = {
    val cvec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))

    def toDoubles(v: Any): Array[Double] = v match {
      case s: scala.collection.Seq[_] => s.map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray
    }

    // deterministic init: the nlist vectors minimal in xxhash64(id)
    // order — plans as TakeOrderedAndProject (distributed top-k, no
    // global sort), then nlist rows land on the driver
    var cents: Array[(Int, Array[Double])] = cvec
      .orderBy(xxhash64(col("__id").cast("string")), col("__id"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, toDoubles(r.get(1))) }

    // score_i = (v · c_i) / ||c_i||: same argmax as cosine (1/||v|| is
    // a common positive factor), one native dot per centroid, and the
    // zero-norm centroid degenerates to score 0 exactly like
    // cosineFromParts. argmax via greatest over (score, -cell) structs
    // — ties break to the SMALLEST cell, matching max_by semantics.
    def scoreStructs(v: Column): Array[Column] = cents.map { case (cell, c) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      val inv = if (n == 0.0) 0.0 else 1.0 / n
      struct((VecFns.dot(v, typedlit(c.toSeq)) * lit(inv)).as("s"),
        lit(-cell).as("negc"))
    }
    def cellOf(v: Column): Column = {
      val scored = scoreStructs(v)
      val best =
        if (scored.length == 1) scored.head else greatest(scored.toSeq: _*)
      -best.getField("negc")
    }

    // Lloyd iterations: projection-assign, tiny aggregated shuffle,
    // collect the nlist×dim means
    for (_ <- 0 until iters) {
      val means = cvec
        .select(cellOf(col("__v")).as("cell"),
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

    // corpus → cell assignment: ONE projection over the scan
    val corpusCells = cvec
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        VecFns.norm(col("__v")).as("__cn"), cellOf(col("__v")).as("cell"))

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
