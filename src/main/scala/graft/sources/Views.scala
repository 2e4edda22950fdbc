package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL serving layer — the role Trino/Superset play in the reference:
  * register the lake's tables as views and serve ad-hoc SQL through
  * Spark's own engine.
  */
object Views {

  /** Register every testdata table of an sf directory as a temp view. */
  def register(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Register a directory of parquet tables (e.g. a curated zone
    * written by LakehousePipeline) under their directory names. */
  def registerZone(spark: SparkSession, zoneDir: String): Unit = {
    val d = new java.io.File(zoneDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .foreach(t => spark.read.parquet(t.getPath)
        .createOrReplaceTempView(t.getName))
  }

  /** One-shot ad-hoc query over an sf directory. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
