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
