package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

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
    * The `events` table's physical `ts` type has varied across data
    * generations — TIMESTAMP(NANOS) (a parquet type Spark refuses by
    * default, read via the legacy nanos-as-long conf), TIMESTAMP_NTZ,
    * or plain TIMESTAMP. All are normalized to µs-precision
    * `TimestampType` so every downstream operator (epoch arithmetic,
    * watermarks, typed session state) sees ONE type, matching what a
    * µs-native engine (DuckDB `CAST(ts AS TIMESTAMP)`) produces. */
  /** Footer-schema memo: `spark.read.parquet(path)` runs parquet
    * schema INFERENCE on every call (~80 ms against ~10 ms with an
    * explicit schema — measured sf0.1, r17) and the bench/verify
    * drivers load each base table hundreds of times per session. A
    * real deployment reads these schemas from its catalog once; this
    * memo is that catalog entry (metadata only — the scan itself, its
    * pushdown, and its pruning are untouched). Keyed by resolved path;
    * the testdata tables are immutable for a session's lifetime. */
  private val schemaMemo =
    new scala.collection.concurrent.TrieMap[String, StructType]

  /** REJECTED r17 optimization, kept as a warning to the next reader:
    * hash-repartitioning the single-row-group testdata tables on
    * their natural key right after the read (a scan-parallelism
    * floor; every first stage otherwise plans ONE task because a row
    * group is Spark's split atom). It parallelized the whole
    * per-row-kernel tail, but FLIPPED TWO ORACLE ROWS
    * (q_join_composite avg_gap 2759.2513 vs 2759.2512, q_time_bucket
    * avg_value 36.3663 vs 36.3662): float aggregates round to 4
    * decimals for the cross-engine compare, and rows landing ON a
    * rounding boundary are decided by summation ORDER — which today
    * matches DuckDB's sequential scan exactly BECAUSE the gate-SF
    * inputs plan as one partition. Any load-level repartition breaks
    * that implicit contract for every float aggregate at once, so
    * parallelism floors must stay per-operator, on provably
    * order-insensitive paths (the Dedup.spread family: integer/hash
    * kernels). */

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name != "events") {
      val sch = schemaMemo.getOrElseUpdate(path,
        spark.read.parquet(path).schema)
      return spark.read.schema(sch).parquet(path)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val phys = schemaMemo.getOrElseUpdate(path,
      spark.read.parquet(path).schema)
    phys("ts").dataType match {
      case TimestampNTZType =>
        // Read the NTZ column as TimestampType AT THE SCAN (explicit
        // read schema) instead of casting after it: a post-scan cast
        // blocks parquet pushdown of every ts predicate — at 100 TB
        // that is the difference between pruning row groups on a time
        // range and scanning the full table. Values are the
        // generator's UTC wall-times, so reading them as UTC instants
        // (the pre-NTZ Spark behavior) is the intended semantics.
        val readSchema = StructType(phys.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampType) else f))
        spark.read.schema(readSchema).parquet(path)
      case _ => normalizeEventTs(spark.read.schema(phys).parquet(path))
    }
  }

  /** Normalize an events frame's `ts` to `TimestampType` regardless of
    * the physical encoding it was read with. Long = epoch NANOS
    * (legacy nanos-as-long read); NTZ casts in the session timezone
    * (UTC in this harness — and gap/window arithmetic is offset-
    * invariant regardless). Post-scan fallback — `load` prefers fixing
    * the type at the scan itself, which this helper can't (it only
    * sees the frame). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: double division loses precision on
        // ns-epoch magnitudes (> 2^53)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
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

  /** A quarantine-routed CSV load. The underlying read is persisted
    * (Spark refuses corrupt-record filters over a bare file re-read),
    * and the CALLER owns that cache: call `release()` once both
    * frames have been consumed. Lineage is intact, so a lost cached
    * block is recomputed from the files, and nothing runs until an
    * action — unlike a checkpoint, which would be eager and
    * unrecoverable after executor loss. */
  final case class QuarantinedCsv(good: DataFrame, quarantined: DataFrame,
                                  private val raw: DataFrame) {
    def release(): Unit = raw.unpersist(blocking = false)
  }

  /** CSV ingestion with quarantine routing: rows that fail the schema
    * land in a `_corrupt_record` side-channel instead of poisoning the
    * load. */
  def csvWithQuarantine(spark: SparkSession, path: String,
                        schema: StructType): QuarantinedCsv = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    QuarantinedCsv(
      raw.where(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.where(col("_corrupt_record").isNotNull).select("_corrupt_record"),
      raw)
  }

  /** Parquet read across evolving schemas (new columns appear over
    * time in the raw zone): union of all file schemas, missing fields
    * null-filled. */
  def parquetMergeSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** JSON lines reader with the same posture. */
  def json(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))
}
