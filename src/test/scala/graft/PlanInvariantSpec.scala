package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape invariants over EVERY batch query at sf0.001 — the
  * review in docs/plans/SUMMARY.md, pinned as assertions so a
  * regression (a join degenerating to a cartesian product, a
  * data-scale nested-loop join, lost parquet pushdown) fails the
  * suite instead of waiting for a human to reread the dumps.
  *
  * Streaming queries are skipped: building their frame EXECUTES the
  * stream (runToBatch), and the resulting batch plan is just the
  * materialized sink. Queries with eager construction (persist +
  * localCheckpoint paths) still expose their final plan here — the
  * invariants below apply to what remains lazy, which includes every
  * join this spec polices.
  */
class PlanInvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // BroadcastNestedLoopJoin is legitimate ONLY as a tiny-broadcast
  // crossJoin (a one-row aggregate or a scalar threshold fanned onto
  // every row). These queries do exactly that, by construction:
  private val bnljByDesign = Set(
    "q_corpus_stats",     // one-row doc stats × one-row vocab
    "q_dsir_select",      // scalar percentile threshold broadcast
    "q_embed_cosine",     // one query vector broadcast to all rows
    "q_embed_cosine_topk",
    "q_embed_sq_topk",    // ≤10 broadcast query vectors × corpus scan
    "q_embed_pq_topk",    // same shape over PQ-reconstructed corpus
    "q_embed_opq_topk",   // same, behind the orthogonal rotation
    "q_hybrid_batch",     // 5 broadcast query vectors × corpus cosine
    "q_epoch_weights",    // one-row band totals broadcast
    "q_lm_score",         // corpus-level model stats broadcast
    "q_tfidf",            // one-row N (doc count) broadcast
    "q_top_terms",        // shares the tfidf shape
    "q_semdedup",         // scalar centroid-count broadcast
    "q_dedup_embed",
    "q_bm25",             // one-row (N, Σdl) stats broadcast
    "q_lm_perplexity",    // one-row vocab size broadcast
    "q_nb_classify",      // L-row label stats + one-row vocab broadcast
    "q_collocations",     // one-row (N, M) totals broadcast
    "q_skew_diag",        // one-row per-column total broadcast
    "q_drift_psi",        // one-row (ref, cur) totals broadcast
    "q_chi2_assoc",       // one-row grand-total broadcast onto cells
    "q_ingest_jsonl")     // one-row bad-line audit count broadcast

  // one construction pass for the whole suite: eager queries run
  // their jobs exactly once, every test reads the cached plan text
  private lazy val plans: Map[String, String] =
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .map { n =>
        n -> SparkEntry.queries(n)(spark, TestSpark.sfDir)
          .queryExecution.executedPlan.toString
      }.toMap

  test("no batch query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin appears only where a tiny broadcast " +
      "is the design") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") &&
        !bnljByDesign(n) => n
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: $offenders — a data-scale " +
        "BNLJ is quadratic; fix the join or justify it in bnljByDesign")
  }

  test("filtering scans keep their parquet pushdown") {
    // queries whose FIRST thing is a selective filter on a base
    // table: the filter must reach the parquet scan
    for (n <- Seq("q_filter_project", "q_pit_join", "q_decontaminate")) {
      val plan = SparkEntry.queries(n)(spark, TestSpark.sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      assert("""PushedFilters: \[[^\]]""".r.findFirstIn(plan).isDefined,
        s"$n lost its parquet filter pushdown")
    }
  }
}
