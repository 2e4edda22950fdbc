package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (test scope only, not shipped): run a
  * handful of SparkEntry queries by name and print row counts —
  * `sbt "Test/runMain graft.Probe q_a q_b"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_agg_pricing")
    for (q <- names) {
      try println(s"OK $q rows=" + SparkEntry.queries(q)(spark, d).count())
      catch { case e: Throwable => println(s"FAIL $q: " + e) }
    }
    spark.stop()
  }
}
