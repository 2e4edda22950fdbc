package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CleanFns, TextFns, VecFns}

/** Hybrid retrieval: keyword relevance and embedding similarity fused
  * with reciprocal-rank fusion (RRF, Cormack et al. 2009) — the
  * "more like this" query of a corpus-exploration / RAG serving
  * stack, and the standard way to combine lexical and dense rankings
  * without score calibration.
  *
  * Cross-engine determinism is designed in:
  *  - the keyword score is RARITY-WEIGHTED OVERLAP in pure integer
  *    arithmetic — Σ over shared distinct terms of (N − df(term)) —
  *    so no float-sum ordering can flip a rank (idf-style weighting
  *    without the log: rarer term → bigger weight);
  *  - cosine is rounded (engine-portable floor arithmetic) BEFORE
  *    ranking;
  *  - RRF = 1/(K+r₁) + 1/(K+r₂) is a fixed two-term IEEE-double sum —
  *    bit-identical in any engine — and is itself rounded before the
  *    final ordering.
  */
object Retrieval {

  private def normToks(c: Column): Column =
    TextFns.tokens(TextFns.normalizeText(c))

  /** [[moreLikeThis]] for a BATCH of query docs — the shape that
    * scales to thousands of concurrent queries, where shipping each
    * query's terms as literals (the single-query trick) stops
    * working. The query set is still small relative to the corpus,
    * so its term table and vectors BROADCAST; the corpus-side work
    * stays one token scan + one cosine projection regardless of
    * |queries|:
    *  - keyword: corpus (doc, term) rows are semi-joined map-side to
    *    the broadcast query-term vocabulary (only matching slivers
    *    survive), fanned out per interested query by a broadcast
    *    join, and aggregated on (query, doc) — ONE shuffle keyed by
    *    the output;
    *  - rarity weights: N = |docs| and df over the full corpus (query
    *    docs are corpus members here, unlike the single-query
    *    variant which excises its query doc);
    *  - vector: broadcast query vectors × corpus scan (shuffle-free
    *    cosine), then per-query rank windows — all windows are
    *    PARTITIONED by query_id, so no single-task sort anywhere;
    *  - fusion: identical integer-exact scores, rounded cosines, and
    *    fixed two-term RRF as the single-query form.
    * Returns (query_id, idCol, kw_rank, vec_rank, rrf_score, rank),
    * top `k` per query; rank 0 = outside that modality's pool. */
  def moreLikeThisBatch(docs: DataFrame, embeds: DataFrame,
                        queryIds: DataFrame, textCol: String,
                        idCol: String, vecCol: String, k: Int = 10,
                        pool: Int = 50, rrfK: Int = 60): DataFrame = {
    val n = docs.count()
    val corpusToks = docs.select(col(idCol),
      explode(array_distinct(normToks(col(textCol)))).as("t"))
    val qToks = corpusToks.join(queryIds.select(col(idCol)), Seq(idCol),
        "left_semi")
      .select(col(idCol).as("query_id"), col("t"))
    // corpus rows whose term interests ANY query — map-side semi join
    // against the broadcast query vocabulary
    val rel = corpusToks.join(
      broadcast(qToks.select(col("t")).distinct()), Seq("t"), "left_semi")
    val dfByTerm = rel.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val kw = rel
      .join(broadcast(qToks), Seq("t"))
      .where(col(idCol) =!= col("query_id"))
      .join(broadcast(dfByTerm), Seq("t"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(lit(n) - col("df")).as("kw_score"))
    val kwW = Window.partitionBy(col("query_id"))
      .orderBy(col("kw_score").desc, col(idCol).asc)
    val kwRank = kw
      .withColumn("kw_rank", row_number().over(kwW))
      .where(col("kw_rank") <= pool)
      .select(col("query_id"), col(idCol), col("kw_rank"))

    val qEmb = embeds.join(queryIds.select(col(idCol)), Seq(idCol),
      "left_semi")
    val vecW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val vecRank = Similarity.cosinePairs(qEmb, embeds, idCol, vecCol)
      .withColumn("cos_sim", CleanFns.roundRepro(col("cos_sim"), 4))
      .withColumn("vec_rank", row_number().over(vecW))
      .where(col("vec_rank") <= pool)
      .select(col("query_id"), col("neighbor_id").as(idCol),
        col("vec_rank"))

    val rrf =
      coalesce(lit(1.0) / (lit(rrfK) + col("kw_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0))
    val fusedW = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    kwRank.join(vecRank, Seq("query_id", idCol), "full_outer")
      .withColumn("rrf_score", CleanFns.roundRepro(rrf, 6))
      .withColumn("rank", row_number().over(fusedW))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        coalesce(col("kw_rank"), lit(0)).as("kw_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        col("rrf_score"), col("rank"))
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones, Okapi weighting
    * with the Lucene non-negative idf) for a BATCH of query docs:
    * score(q,d) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). The standard lexical
    * ranker a RAG/serving stack runs beside the dense tier — real
    * scores (unlike [[moreLikeThisBatch]]'s rank-only RRF), so
    * downstream fusion can calibrate on them.
    *
    * Cross-engine determinism: every per-term contribution is a fixed
    * arithmetic tree over exact integers (tf, df, dl, N, Σdl) with
    * one `ln` — floor-rounded to MICRO-UNITS (1e-6) and summed as a
    * BIGINT, so no float-sum ordering across engines can flip a
    * score; ranks tie-break on doc id.
    *
    * Scale shape: one corpus token scan feeds tf, dl, and df; the
    * query term table, df table, and corpus-stats scalars broadcast
    * (query batch ≪ corpus; df ≤ vocabulary ~ √corpus by Heaps' law).
    * The per-doc length table rides a broadcast here (|docs| rows at
    * test scale) — at 100 TB it co-partitions with tf on the doc id
    * instead, one shuffle both sides share. Per-query rank windows
    * are partitioned by query_id: no single-task sort. */
  def bm25Batch(docs: DataFrame, queryIds: DataFrame, textCol: String,
                idCol: String, k: Int = 10, k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(normToks(col(textCol))).as("t"))
    val tf = toks.groupBy(col(idCol), col("t"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("tok_total")))
    val qt = tf.join(queryIds.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col("t")).distinct()
    val dlNorm = col("dl").cast("double") * col("n_docs") / col("tok_total")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    tf.join(broadcast(qt), Seq("t"))
      .where(col(idCol) =!= col("query_id"))
      .join(broadcast(dfreq), Seq("t"))
      .join(broadcast(dl), Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("micro",
        floor(contrib * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("micro")).as("score_micro"),
        count(lit(1)).cast("int").as("n_terms"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("n_terms"),
        col("score_micro"), col("rank"))
  }

  /** Top-k docs most similar to `queryId`, by RRF over a keyword
    * ranking and an embedding-cosine ranking (each truncated to
    * `pool` candidates; a doc missing from one modality's pool
    * contributes 0 for that modality).
    *
    * Scale shape: the query doc's terms and vector are driver-small
    * by construction and ship as literals. Keyword side: corpus
    * tokens are filtered to the query's terms MAP-SIDE (an `isin`
    * over a literal set), so only matching (id, term) slivers shuffle
    * into the per-doc score; the df aggregate is at most |qTerms|
    * rows. Vector side: one literal-vector cosine projection over the
    * scan — zero shuffles. Each modality's pool cut is a distributed
    * TakeOrdered (orderBy + limit), and the only unpartitioned window
    * runs AFTER the limit, over ≤ pool rows. */
  def moreLikeThis(docs: DataFrame, embeds: DataFrame, textCol: String,
                   idCol: String, vecCol: String, queryId: Long,
                   k: Int = 10, pool: Int = 50,
                   rrfK: Int = 60): DataFrame = {
    // ---- query artifacts (driver-small: one doc)
    val qTerms: Seq[String] = docs.where(col(idCol) === queryId)
      .select(explode(array_distinct(normToks(col(textCol)))).as("t"))
      .collect().map(_.getString(0)).toSeq.sorted
    val qVec: Seq[Double] = embeds.where(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }
    val n = docs.where(col(idCol) =!= queryId).count()

    // ---- keyword modality: integer rarity-weighted overlap
    val tok = docs.where(col(idCol) =!= queryId)
      .select(col(idCol),
        explode(array_distinct(normToks(col(textCol)))).as("t"))
      .where(if (qTerms.isEmpty) lit(false) else col("t").isin(qTerms: _*))
    val dfByTerm = tok.groupBy(col("t"))
      .agg(count(lit(1)).as("df")) // sets are distinct: count == doc count
    val kw = tok.join(broadcast(dfByTerm), Seq("t"))
      .groupBy(col(idCol))
      .agg(sum(lit(n) - col("df")).as("kw_score"))
    val kwPool = kw
      .orderBy(col("kw_score").desc, col(idCol).asc).limit(pool)
      .withColumn("kw_rank", row_number().over(
        Window.orderBy(col("kw_score").desc, col(idCol).asc)))
      .select(col(idCol), col("kw_rank"))

    // ---- vector modality: literal-query cosine, rounded before rank
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val vec = embeds.where(col(idCol) =!= queryId)
      .select(col(idCol), CleanFns.roundRepro(
        VecFns.cosineFromParts(
          VecFns.dot(col(vecCol), typedlit(qVec)),
          VecFns.norm(col(vecCol)), lit(qNorm)), 4).as("cos_sim"))
    val vecPool = vec
      .orderBy(col("cos_sim").desc, col(idCol).asc).limit(pool)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col(idCol).asc)))
      .select(col(idCol), col("vec_rank"))

    // ---- RRF fusion (fixed two-term double sum, rounded, re-ranked)
    val rrf =
      coalesce(lit(1.0) / (lit(rrfK) + col("kw_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0))
    kwPool.join(vecPool, Seq(idCol), "full_outer")
      .withColumn("rrf_score", CleanFns.roundRepro(rrf, 6))
      .orderBy(col("rrf_score").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col(idCol).asc)))
      // 0 = outside that modality's pool (ranks are 1-based); keeps
      // the output free of nullable ints, which engines hash apart
      .select(col(idCol), coalesce(col("kw_rank"), lit(0)).as("kw_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        col("rrf_score"), col("rank"))
  }
}
