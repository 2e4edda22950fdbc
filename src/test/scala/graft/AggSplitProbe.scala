package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** q_approx_distinct decomposition probe (test scope only): the mixed
  * exact+approx multi-DISTINCT aggregate plans ONE Expand whose
  * grouping keys include BOTH distinct columns — and Spark's
  * RewriteDistinctAggregates carries the non-distinct aggregates'
  * buffers (two rsd=0.01 HLL++ sketches ≈ 24 KB) on EVERY
  * (event_type, user_id, props, gid) group row. Near-unique `props`
  * makes that ~rowcount × 24 KB of buffer allocation + memset per
  * aggregate pass. Variants: fused (current), split (approx and
  * exact in separate aggregates joined on the group key), each with
  * and without the 32-way spread. Two passes each; read p2.
  * `sbt "Test/runMain graft.AggSplitProbe"`. */
object AggSplitProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("agg-split-probe").getOrCreate()
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
        println(f"[agg] $label%-22s p$p wall $dt%7.2f s  cpu $dc%7.2f s")
      }
    }

    val rsd = 0.01
    def ok(approx: Column, exact: Column): Column =
      when(abs(approx.cast("double") - exact) <=
        lit(5 * rsd) * exact + lit(5.0), lit(1)).otherwise(lit(0))
    def ev(spread: Boolean) = {
      val t = graft.sources.Tables.load(spark, d, "events")
      if (spread)
        t.repartition(spark.sparkContext.defaultParallelism, col("event_id"))
      else t
    }

    def fused(spread: Boolean) =
      ev(spread).groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd).as("au"),
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("props"), rsd).as("ap"),
          countDistinct(col("props")).as("exact_props"))
        .select(col("event_type"), col("exact_users"),
          ok(col("au"), col("exact_users")).as("users_ok"),
          ok(col("ap"), col("exact_props")).as("props_ok"))

    def split(spread: Boolean) = {
      val e = ev(spread)
      val approx = e.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("au"),
          approx_count_distinct(col("props"), rsd).as("ap"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          countDistinct(col("props")).as("exact_props"))
      exact.join(approx, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          ok(col("au"), col("exact_users")).as("users_ok"),
          ok(col("ap"), col("exact_props")).as("props_ok"))
    }

    step("fused_spread")(fused(spread = true))
    step("split_spread")(split(spread = true))
    step("split_plain")(split(spread = false))
    step("fused_plain")(fused(spread = false))

    // value equivalence: every variant must produce identical rows
    val base = fused(spread = true).collect().map(_.toSeq).toSet
    for ((n, f) <- Seq("split_spread" -> split(true),
        "split_plain" -> split(false), "fused_plain" -> fused(false))) {
      val got = f.collect().map(_.toSeq).toSet
      println(s"[agg] equal($n) = ${got == base}")
    }
    spark.stop()
  }
}
