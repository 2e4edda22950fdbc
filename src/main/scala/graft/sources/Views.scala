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
    * written by LakehousePipeline) under their directory names.
    * Snapshot tables (a `_manifests` dir present) are served at their
    * LATEST version; plain parquet directories read directly. */
  def registerZone(spark: SparkSession, zoneDir: String): Unit = {
    val d = new java.io.File(zoneDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .foreach { t =>
        val df =
          if (new java.io.File(t, "_manifests").isDirectory)
            LakeWriter.readSnapshot(spark, t.getPath)
          else spark.read.parquet(t.getPath)
        df.createOrReplaceTempView(t.getName)
      }
  }

  /** Serve one snapshot table AS OF a version (time-travel SQL). */
  def registerSnapshotAsOf(spark: SparkSession, table: String,
                           viewName: String, version: Long): Unit =
    LakeWriter.readSnapshot(spark, table, Some(version))
      .createOrReplaceTempView(viewName)

  /** One-shot ad-hoc query over an sf directory. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
