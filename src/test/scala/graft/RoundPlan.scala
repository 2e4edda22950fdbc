package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the physical plan of ONE connected-components round and ONE
  * pagerank iteration (test scope only) — the loop bodies checkpoint
  * away their plans, so the full-query PlanDump can never show them. */
object RoundPlan {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("round-plan").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.Tables
    import operators.Dedup

    val docs = Tables.load(spark, d, "documents")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.2)

    // --- one CC round, exactly as Graph.connectedComponents builds it
    // (r17 shape: edge cache pre-partitioned on the probe key, and a
    // frontier — here round 1's changed labels — feeding the join)
    val sym = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .repartition(col("b"))
      .cache()
    val labels0 = sym.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node")).localCheckpoint()
    def round(labels: org.apache.spark.sql.DataFrame,
              frontier: org.apache.spark.sql.DataFrame) = {
      val nbrMin = sym.join(frontier, sym("b") === frontier("node"))
        .groupBy(sym("a").as("nbr_node"))
        .agg(min(col("comp")).as("nbr_comp"))
      labels.join(nbrMin, labels("node") === nbrMin("nbr_node"), "left")
        .select(col("node"), col("comp").as("__prev"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .withColumn("__chg", col("comp") =!= col("__prev"))
    }
    val r1 = round(labels0, labels0).localCheckpoint()
    val labels1 = r1.select(col("node"), col("comp"))
    val frontier1 = r1.where(col("__chg")).select(col("node"), col("comp"))
    val r2 = round(labels1, frontier1)
    r2.write.format("noop").mode("overwrite").save()
    println("==== CC round (executed plan) ====")
    println(r2.queryExecution.executedPlan.toString.take(8000))
    sym.unpersist()

    // --- one pagerank iteration, as Graph.pageRank builds it
    def T(n: String) = Tables.load(spark, d, n)
    val pr = T("orders").select(col("o_orderkey"), col("o_custkey"))
      .join(T("lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = pr.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pr.select(col("b").as("src"), col("a").as("dst")))
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ed = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scores = deg.select(col("src").as("node"),
      lit(1000000L).as("sc")).localCheckpoint()
    val inc = ed
      .join(scores.withColumnRenamed("node", "src"), "src")
      .select(col("dst"), expr("sc div deg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
    val nextScores = deg.select(col("src").as("node"))
      .join(inc.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node"),
        (lit(150000L) + expr(
          "(850000 * coalesce(inc, 0)) div 1000000")).as("sc"))
    nextScores.write.format("noop").mode("overwrite").save()
    println("==== PR iteration (executed plan) ====")
    println(nextScores.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
