package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (test scope only, not shipped). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val ev = graft.sources.Tables.load(spark, d, "events")
    val filtered = ev.where(col("ts") >= lit("2024-06-01").cast("timestamp"))
      .select("event_id", "ts")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println(plan.linesIterator.filter(l =>
      l.contains("PushedFilters") || l.contains("ReadSchema")).mkString("\n"))
    println("rows=" + filtered.count())
    spark.stop()
  }
}
