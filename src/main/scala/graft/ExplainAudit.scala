package graft
import org.apache.spark.sql.SparkSession
/** Plan auditor: dumps explain("formatted") for selected queries so
  * pushdown / broadcast / codegen can be reviewed (tools/plans/). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_filter_project", "q_join_star", "q_agg_pricing",
        "q_pit_join", "q_dedup_minhash", "q_embed_cosine_topk", "q_scd2")
    // lazy twins for queries whose production entry materializes
    // eagerly (the audit wants the full plan, not a Scan ExistingRDD)
    val lazyOverrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "q_dedup_minhash" -> ((s, d) =>
        graft.operators.Dedup.minhashPairs(
          graft.sources.Tables.load(s, d, "documents"), "text", "doc_id",
          threshold = 0.2, materialize = false)),
      "q_dedup_minhash_salted" -> ((s, d) =>
        graft.operators.Dedup.minhashPairs(
          graft.sources.Tables.load(s, d, "documents"), "text", "doc_id",
          threshold = 0.2, materialize = false, salts = 8)),
      "q_tfidf" -> ((s, d) =>
        graft.operators.TextAnalysis.tfidf(
          graft.sources.Tables.load(s, d, "documents"), "text", "doc_id",
          k = 3, materialize = false)))
    names.foreach { n =>
      val plan = lazyOverrides.getOrElse(n, SparkEntry.queries(n))(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$n.txt"), plan)
      println(s"[explain] wrote $out/$n.txt")
    }
    spark.stop()
  }
}
