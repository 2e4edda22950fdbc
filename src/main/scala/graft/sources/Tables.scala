package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Source layer: batch readers for the lake's raw/staged zones.
  *
  * Reads are deliberately plain `spark.read` so Catalyst keeps full
  * pushdown freedom (predicate pushdown, column pruning, partition
  * pruning all reach the parquet scan).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table from an sf directory.
    *
    * The `events` table carries TIMESTAMP(NANOS) — a parquet type Spark
    * refuses by default. We read it via the legacy nanos-as-long conf
    * and truncate to microsecond timestamps, which matches what any
    * µs-native engine (DuckDB `CAST(ts AS TIMESTAMP)`) produces. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer `div`, not `/`: double division loses precision on
      // ns-epoch magnitudes (> 2^53)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Robust CSV ingestion — mirrors the reference's raw-zone reader
    * (/root/reference/airflow/dags/utils/init_spark.py:23-37
    * `read_data_from_minio`): header, multiLine quoted fields, escaped
    * quotes, permissive mode. Prefer an explicit schema at scale —
    * `inferSchema` costs a full extra pass over 100 TB. */
  def csv(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("quote", "\"")
      .option("encoding", "UTF-8")
      .option("mode", "PERMISSIVE")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  /** JSON lines reader with the same posture. */
  def json(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))
}
