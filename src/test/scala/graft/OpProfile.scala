package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Operator decomposition profiler (test scope only): time the
  * building blocks of the heavy families — signature build, LSH pair
  * generation, connected components, pagerank — each step twice so
  * the second sample is JIT-warm. `sbt "Test/runMain graft.OpProfile"`. */
object OpProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("op-profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val cpuNanos = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) cpuNanos.addAndGet(m.executorCpuTime): Unit
      }
    })
    def step(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (p <- 1 to 2) {
        val c0 = cpuNanos.get(); val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val dc = (cpuNanos.get() - c0) / 1e9
        println(f"[op] $label%-28s p$p wall $dt%7.2f s  cpu $dc%7.2f s")
      }
    }

    import operators.{Dedup, Graph}
    import graft.sources.Tables
    val docs = Tables.load(spark, d, "documents")

    step("sigs")(Dedup.minhashSignatures(docs, "text", "doc_id"))
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    step("pairs_from_sigs")(
      Dedup.minhashPairsFromSigs(sigs, "doc_id", threshold = 0.2))
    step("pairs_full")(
      Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.2))
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.2)
    step("cc_only")(Graph.connectedComponents(pairs, "doc_a", "doc_b"))

    // pagerank decomposition
    def T(n: String) = Tables.load(spark, d, n)
    val pr = T("orders").select(col("o_orderkey"), col("o_custkey"))
      .join(T("lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    step("pr_edges")(pr)
    val edges = pr.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pr.select(col("b").as("src"), col("a").as("dst")))
    step("pr_full")(Graph.pageRank(edges, "src", "dst", iters = 3))

    spark.stop()
  }
}
