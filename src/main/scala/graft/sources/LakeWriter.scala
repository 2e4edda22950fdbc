package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink layer: lakehouse-style table maintenance over native parquet.
  *
  * Twin of the reference's `write_iceberg_dynamic_partition`
  * (/root/reference/airflow/dags/utils/init_spark.py:48-115): create a
  * partitioned table if absent, otherwise overwrite ONLY the
  * partitions present in the incoming frame. No Iceberg jars ship in
  * this image, so the same semantics are built on Spark's native
  * `partitionOverwriteMode=dynamic` — which at 100 TB is exactly the
  * behavior you want: a daily load touches one `datadate` partition,
  * never rewrites the table.
  */
object LakeWriter {

  /** Write `df` to `path` partitioned by `partitionCols`; existing
    * partitions not present in `df` are left untouched. */
  def dynamicPartitionOverwrite(df: DataFrame, path: String,
                                partitionCols: Seq[String]): Unit = {
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"partition columns not in frame: $missing")
    df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Full-table overwrite (initial loads / small dims). */
  def overwrite(df: DataFrame, path: String,
                partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Bucketed + sorted table: co-locates join/aggregation keys at
    * WRITE time so repeated large-to-large joins on `bucketCols` run
    * with NO shuffle on either side — the 100 TB answer to a fact
    * table that is joined on the same key every day. Requires a
    * catalog table (bucketing metadata lives in the catalog). */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Small-file compaction: rewrite a partitioned table so each
    * partition holds one file (hash-repartitioning by the partition
    * columns sends each partition's rows to a single task). Streaming
    * sinks and frequent incremental loads accumulate small files that
    * degrade scan planning — schedule this per zone. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              partitionCols: Seq[String]): Unit = {
    val df = spark.read.parquet(path)
    val compacted =
      if (partitionCols.isEmpty) df.coalesce(1)
      else df.repartition(partitionCols.map(df.col): _*)
    // rewrite through a staging dir: cannot overwrite the input in place
    val tmp = path.stripSuffix("/") + "__compacting"
    (if (partitionCols.isEmpty) compacted.write.mode("overwrite")
     else compacted.write.mode("overwrite").partitionBy(partitionCols: _*))
      .parquet(tmp)
    // swap via rename-aside so a crash never leaves the table missing:
    // live -> __old, staged -> live, delete __old. Recovery after a
    // crash between the renames is the __old directory, still intact.
    // The filesystem must be the TABLE's filesystem, not the default
    // one (they differ whenever the lake lives on s3a/hdfs). Note:
    // S3-like stores lack atomic rename — run compaction there via a
    // catalog swap (or a format with snapshot semantics) instead.
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dst, old), s"compact: could not move $dst aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"compact: could not activate staged rewrite at $dst")
    fs.delete(old, true)
  }

  /** Append (raw-zone landing). */
  def append(df: DataFrame, path: String,
             partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
