package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (test scope only, not shipped). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("probe").getOrCreate()
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_sessionize", "q_stream_window_agg",
                  "q_stream_sessionize", "q_stream_interval_join",
                  "q_time_bucket", "q_dedup_latest")) {
      try {
        val r = SparkEntry.queries(q)(spark, d)
        println(s"OK $q rows=" + r.count())
      } catch { case e: Throwable =>
        println(s"FAIL $q: " + e)
      }
    }
    spark.stop()
  }
}
