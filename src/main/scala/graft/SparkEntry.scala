package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CleanFns, TextFns}
import graft.operators.{Analytics, AsOfJoin, Curation, Dedup, Dims, Multimodal, Packing, PitJoin, Retrieval, Scd2, Similarity, Skew, Staging, TextAnalysis}
import graft.sources.Tables
import graft.streaming.Speed
import org.apache.spark.sql.streaming.OutputMode

/** Driver contract — one `queries` entry per operator in SURVEY.md §2,
  * with a DuckDB oracle in `oracleSql` wherever the semantics are
  * ANSI-SQL-expressible. Column names/types are aligned on both sides
  * (aggregates rounded identically) because the driver hash-compares
  * values after sorting columns by name.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship on sf=0.001; driver smoke-checks rows>0. The engine's
    * centerpiece end to end: the daily training-data load (exact +
    * near-dup dedup, quality cascade, PII redaction, single-commit
    * snapshot append) runs on the documents table, and the curated
    * corpus is served back joined to its quality audit. The original
    * warehouse flagship remains `queries("q_join_star")`. */
  /** Shared raw-avro plumbing for the hand-built FOREIGN Iceberg gate
    * fixtures (q_ingest_iceberg / _posdel / _eqdel) — independent of
    * IcebergMirror's builders BY CONSTRUCTION (schema literals and
    * GenericRecords assembled here from the public spec's field-id
    * tables), and shared across the three gates so a field-id fix
    * cannot drift between them. */
  private object IceGateFixture {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

    val bucketPartField: String =
      """{"name":"bucket","type":["null","int"],"default":null,"field-id":1000}"""

    /** manifest_entry schema over `partFields` (avro field JSON of the
      * partition struct; "" = unpartitioned spec). `v3Dv` adds the
      * format-v3 deletion-vector fields (143-145). */
    def entrySchema(partFields: String, v3Dv: Boolean = false): Schema =
      new Schema.Parser().parse(
        s"""{"type":"record","name":"manifest_entry","fields":[
          {"name":"status","type":"int","field-id":0},
          {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
          {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
          {"name":"data_file","type":{"type":"record","name":"r2","fields":[
            {"name":"content","type":"int","field-id":134},
            {"name":"file_path","type":"string","field-id":100},
            {"name":"file_format","type":"string","field-id":101},
            {"name":"partition","type":{"type":"record","name":"r102","fields":[$partFields]},"field-id":102},
            {"name":"record_count","type":"long","field-id":103},
            {"name":"file_size_in_bytes","type":"long","field-id":104},
            {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135}${
          if (v3Dv) """,
            {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
            {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
            {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}"""
          else ""}
          ]},"field-id":2}]}""")

    /** Write one deletion-vector-v1 blob into a fresh puffin file at
      * `path`, per the public Puffin + Iceberg v3 specs: file magic,
      * the framed blob (4-byte BE length of magic+vector, the
      * magic-led portable RoaringBitmapArray, 4-byte BE CRC-32 of
      * magic+vector), and a footer whose JSON payload indexes the
      * blob. Returns (blob offset, blob size) for the manifest entry. */
    def writePuffinDv(path: String, positions: Array[Long],
        referenced: String, snapshotId: Long, seq: Long): (Long, Long) = {
      val vec = graft.sources.DeletionVectors.serialize(positions)
      val crc = new java.util.zip.CRC32(); crc.update(vec)
      val blob = java.nio.ByteBuffer.allocate(vec.length + 8)
      blob.putInt(vec.length); blob.put(vec); blob.putInt(crc.getValue.toInt)
      val magic = Array[Byte]('P', 'F', 'A', '1')
      val payload = (s"""{"blobs":[{"type":"deletion-vector-v1",""" +
        s""""fields":[],"snapshot-id":$snapshotId,""" +
        s""""sequence-number":$seq,"offset":4,""" +
        s""""length":${vec.length + 8},"properties":{""" +
        s""""referenced-data-file":"$referenced",""" +
        s""""cardinality":"${positions.length}"}}],""" +
        """"properties":{}}""").getBytes("UTF-8")
      val footer = java.nio.ByteBuffer
        .allocate(4 + payload.length + 4 + 4 + 4)
      footer.put(magic).put(payload)
      footer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length)
      footer.putInt(0) // flags: payload uncompressed
      footer.put(magic)
      val f = new java.io.File(path)
      f.getParentFile.mkdirs()
      val out = new java.io.FileOutputStream(f)
      try {
        out.write(magic); out.write(blob.array()); out.write(footer.array())
      } finally out.close()
      (4L, vec.length + 8L)
    }

    /** A v3 deletion-vector manifest entry (content=1, puffin). */
    def dvEntry(schema: Schema, sid: Long, seq: Long, puffin: String,
        referenced: String, offset: Long, size: Long,
        cardinality: Long): GenericRecord = {
      val e = manifestEntry(schema, 1, 1, sid, seq, puffin, null,
        cardinality)
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.put("file_format", "PUFFIN")
      df.put("referenced_data_file", referenced)
      df.put("content_offset", java.lang.Long.valueOf(offset))
      df.put("content_size_in_bytes", java.lang.Long.valueOf(size))
      e
    }

    val listSchema: Schema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string","field-id":500},
        {"name":"manifest_length","type":"long","field-id":501},
        {"name":"partition_spec_id","type":"int","field-id":502},
        {"name":"content","type":"int","field-id":517},
        {"name":"sequence_number","type":"long","field-id":515},
        {"name":"min_sequence_number","type":"long","field-id":516},
        {"name":"added_snapshot_id","type":"long","field-id":503},
        {"name":"added_data_files_count","type":"int","field-id":504},
        {"name":"existing_data_files_count","type":"int","field-id":505},
        {"name":"deleted_data_files_count","type":"int","field-id":506},
        {"name":"added_rows_count","type":"long","field-id":512},
        {"name":"existing_rows_count","type":"long","field-id":513},
        {"name":"deleted_rows_count","type":"long","field-id":514}]}""")

    def writeAvro(path: String, schema: Schema,
        recs: Seq[GenericRecord]): Long = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      val f = new java.io.File(path)
      f.getParentFile.mkdirs()
      w.create(schema, f)
      recs.foreach(w.append)
      w.close()
      f.length
    }

    /** One manifest entry; `bucket` lands in the partition struct when
      * non-null (the schema must then carry [[bucketPartField]]). */
    def manifestEntry(schema: Schema, status: Int, content: Int,
        sid: Long, seq: Long, path: String, bucket: Integer, n: Long,
        eqIds: Seq[Int] = Nil): GenericRecord = {
      val e = new GenericData.Record(schema)
      e.put("status", Integer.valueOf(status))
      e.put("snapshot_id", java.lang.Long.valueOf(sid))
      e.put("sequence_number", java.lang.Long.valueOf(seq))
      val dfS = schema.getField("data_file").schema()
      val df = new GenericData.Record(dfS)
      df.put("content", Integer.valueOf(content))
      df.put("file_path", path)
      df.put("file_format", "PARQUET")
      val p = new GenericData.Record(dfS.getField("partition").schema())
      if (bucket != null) p.put("bucket", bucket)
      df.put("partition", p)
      df.put("record_count", java.lang.Long.valueOf(n))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(1L))
      if (eqIds.nonEmpty) {
        val l = new java.util.ArrayList[Integer](eqIds.size)
        eqIds.foreach(i => l.add(Integer.valueOf(i)))
        df.put("equality_ids", l)
      }
      e.put("data_file", df)
      e
    }

    def listRec(path: String, len: Long, sid: Long, seq: Long,
        content: Int = 0, specId: Int = 0): GenericRecord = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", path)
      r.put("manifest_length", java.lang.Long.valueOf(len))
      r.put("partition_spec_id", Integer.valueOf(specId))
      r.put("content", Integer.valueOf(content))
      r.put("sequence_number", java.lang.Long.valueOf(seq))
      r.put("min_sequence_number", java.lang.Long.valueOf(1L))
      r.put("added_snapshot_id", java.lang.Long.valueOf(sid))
      Seq("added_data_files_count", "existing_data_files_count",
        "deleted_data_files_count").foreach(f =>
          r.put(f, Integer.valueOf(0)))
      Seq("added_rows_count", "existing_rows_count",
        "deleted_rows_count").foreach(f =>
          r.put(f, java.lang.Long.valueOf(0L)))
      r
    }
  }

  /** Recursive temp-dir wipe shared by the self-staging queries —
    * closes each directory stream (Files.list holds the handle open). */
  private def wipeDir(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toList.foreach(wipeDir)
      } finally st.close()
    }
    java.nio.file.Files.deleteIfExists(p): Unit
  }

  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Paths.get("/tmp", "graft_entry_curation")
    wipeDir(tmp)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val res = graft.pipeline.CurationPipeline.run(spark, docs, tmp.toString)
    val audit = graft.operators.Curation.filterCascade(docs, "text", "doc_id")
    graft.sources.LakeWriter
      .readSnapshot(spark, s"$tmp/corpus", Some(res.corpusVersion))
      .join(audit.select(col("doc_id"), col("first_fail")), Seq("doc_id"))
      .withColumn("corpus_version", lit(res.corpusVersion))
  }

  /** Shared intermediate for the survivors family (q_dedup_survivors,
    * q_dedup_survivors_quality, q_dup_cluster_stats,
    * q_split_leakage_free): all four re-derive the SAME LSH pair table
    * and connected components — honest standalone cost, but ~4x the
    * single biggest block of the bench. With
    * SPARK_GRAFT_SHARED_INTERMEDIATES=1 the component labels are
    * computed once per sf dir and persisted for the session — the
    * posture a production curation job runs (one dedup resolution
    * feeding every downstream report). Default stays standalone-honest:
    * flag unset → every query recomputes exactly as before. */
  private object SharedCC {
    val enabled: Boolean =
      sys.env.get("SPARK_GRAFT_SHARED_INTERMEDIATES").contains("1")
    private val memo =
      new scala.collection.concurrent.TrieMap[String, DataFrame]
    /** (node, comp) labels of the threshold-0.2 minhash dup graph. */
    def comps(s: SparkSession, d: String): DataFrame = {
      if (!enabled) sharedCCProbe(s, d)
      else memo.getOrElseUpdate(d, sharedCCProbe(s, d).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
  }

  /** The survivors family's shared build (LSH pair table + component
    * labels), never memoized. Bench materializes it once per run to
    * MEASURE the family's standalone premium (3 avoidable rebuilds
    * with sharing off) instead of asserting a documented constant —
    * gate_policy.md §shared_off_premium_sec. */
  def sharedCCProbe(s: SparkSession, d: String): DataFrame =
    operators.Graph.connectedComponents(
      Dedup.minhashPairs(T(s, d, "documents"), "text", "doc_id",
        threshold = 0.2), "doc_a", "doc_b")

  // ---- staging contract used by the alignment queries --------------
  private val stgContract = Seq(
    "symbol" -> "string", "segment" -> "string", "acctbal" -> "double",
    "country" -> "string", "employees" -> "bigint")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- relational / lakehouse core ---------------------------------
    "q_filter_project" -> ((s, d) => {
      T(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
    }),

    "q_agg_pricing" -> ((s, d) => {
      T(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          CleanFns.roundRepro(sum(col("l_quantity")), 2).as("sum_qty"),
          CleanFns.roundRepro(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          CleanFns.roundRepro(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          CleanFns.roundRepro(avg(col("l_quantity")), 4).as("avg_qty"),
          CleanFns.roundRepro(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    "q_stg_normalize" -> ((s, d) => {
      T(s, d, "customer").select(
          col("c_custkey"),
          CleanFns.normSym(col("c_name")).as("name_norm"),
          CleanFns.cleanLong(col("c_name")).as("cust_id_parsed"),
          col("c_mktsegment"),
          col("c_acctbal"),
          when(col("c_acctbal") < 0, lit("NEGATIVE")).otherwise(lit("OK"))
            .as("bal_flag"),
          coalesce(col("c_acctbal"), lit(0.0)).as("acctbal_filled"))
        .where(col("name_norm").isNotNull && col("name_norm") =!= "")
    }),

    "q_schema_align" -> ((s, d) => {
      val src = T(s, d, "customer").select(
        col("c_name").as("symbol"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acctbal"))
      Staging.alignTo(src, stgContract)
    }),

    "q_union_countries" -> ((s, d) => {
      val c = T(s, d, "customer")
      val feedA = c.where(col("c_mktsegment") === "BUILDING").select(
        col("c_name").as("symbol"), col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acctbal"))
      val feedB = c.where(col("c_mktsegment") === "AUTOMOBILE").select(
        col("c_name").as("symbol"), col("c_mktsegment").as("segment"))
      Staging.unionAligned(stgContract.take(3), feedA, feedB)
    }),

    "q_join_star" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val o = T(s, d, "orders")
      val withOrders = li.join(o, col("l_orderkey") === col("o_orderkey"))
      Analytics.starJoin(withOrders, Seq(
          (T(s, d, "customer"), col("o_custkey") === col("c_custkey")),
          (T(s, d, "nation"), col("c_nationkey") === col("n_nationkey")),
          (T(s, d, "region"), col("n_regionkey") === col("r_regionkey"))),
          joinType = "inner")
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          CleanFns.roundRepro(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q_join_composite" -> ((s, d) => {
      T(s, d, "customer")
        .join(T(s, d, "supplier"),
          col("c_nationkey") === col("s_nationkey") &&
            col("c_acctbal") > col("s_acctbal"))
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(
          count(lit(1)).as("n_pairs"),
          CleanFns.roundRepro(avg(col("c_acctbal") - col("s_acctbal")), 4).as("avg_gap"))
    }),

    "q_semi_anti" -> ((s, d) => {
      val c = T(s, d, "customer")
      val o = T(s, d, "orders")
      val has = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("HAS_ORDERS").as("flag"))
      val none = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("NO_ORDERS").as("flag"))
      has.union(none)
    }),

    "q_dim_distinct_sk" -> ((s, d) => {
      Dims.distinctDim(T(s, d, "orders"), Seq("o_orderpriority"), "priority_sk")
        .select(col("o_orderpriority").as("priority_code"), col("priority_sk"))
    }),

    "q_dim_date" -> ((s, d) =>
      Dims.dateDim(T(s, d, "orders"), col("o_orderdate"))),

    "q_scd2" -> ((s, d) =>
      Scd2.build(T(s, d, "events"), Seq("user_id"), Seq("event_type"), "ts")),

    "q_pit_join" -> ((s, d) => {
      val ev = T(s, d, "events")
      val dim = Scd2.build(ev, Seq("user_id"), Seq("event_type"), "ts")
        .withColumnRenamed("event_type", "status")
      PitJoin(ev.select(col("event_id"), col("user_id"), col("ts")),
          dim, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("status"), col("effective_from"))
    }),

    "q_window_analytics" -> ((s, d) => {
      Analytics.sequenceStats(T(s, d, "orders"), Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")), col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"), col("seq"), col("prev_value"),
          CleanFns.roundRepro(col("running_total"), 2).as("running_total"))
    }),

    "q_pct_change" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("prev_price"),
          CleanFns.roundRepro(CleanFns.pctChange(col("o_totalprice"), col("prev_price")), 6)
            .as("pct_change"),
          when(col("prev_price").isNull, lit(null).cast("string"))
            .when(col("o_totalprice") > col("prev_price"), lit("UP"))
            .when(col("o_totalprice") < col("prev_price"), lit("DOWN"))
            .otherwise(lit("FLAT")).as("direction"))
    }),

    "q_dedup_latest" -> ((s, d) => {
      Analytics.latestPerKey(T(s, d, "events"), Seq("user_id"),
          col("ts"), col("event_id"))
        .select(col("user_id"), col("ts").as("last_ts"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"))
    }),

    "q_topk_per_group" -> ((s, d) => {
      Analytics.topKPerGroup(T(s, d, "orders"), Seq("o_orderpriority"),
          col("o_totalprice"), col("o_orderkey"), 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), col("rank"))
    }),

    "q_rollup" -> ((s, d) => {
      T(s, d, "customer")
        .join(broadcast(T(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"))
        .agg(
          CleanFns.roundRepro(sum(col("c_acctbal")), 2).as("total_acctbal"),
          count(lit(1)).as("n_customers"))
    }),

    "q_pivot" -> ((s, d) => {
      T(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(CleanFns.roundRepro(sum(col("value")), 2))
    }),

    "q_time_bucket" -> ((s, d) =>
      Analytics.timeBucket(T(s, d, "events"), "ts", "hour",
        Seq("event_type"), "value")),

    "q_sessionize" -> ((s, d) =>
      Analytics.sessionize(T(s, d, "events"), "user_id", "ts", "value",
        gapMillis = 1800000L)),

    "q_cube" -> ((s, d) => {
      T(s, d, "customer")
        .join(broadcast(T(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(
          CleanFns.roundRepro(sum(col("c_acctbal")), 2).as("total_acctbal"),
          count(lit(1)).as("n_customers"))
    }),

    "q_trailing_window" -> ((s, d) => {
      Analytics.trailingWindow(T(s, d, "orders"), Seq("o_custkey"),
          col("o_orderdate"), col("o_totalprice"), days = 7)
        .select(col("o_orderkey"), col("o_custkey"), col("epoch_day"),
          col("o_totalprice"), col("trailing_sum"), col("trailing_n"))
    }),

    "q_distinct_agg" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
    }),

    "q_percentiles" -> ((s, d) => {
      T(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          CleanFns.roundRepro(percentile(col("o_totalprice"), lit(0.5)), 2)
            .as("p50_price"),
          CleanFns.roundRepro(percentile(col("o_totalprice"), lit(0.9)), 2)
            .as("p90_price"),
          count(lit(1)).as("n_orders"))
    }),

    "q_grouping_sets" -> ((s, d) => {
      T(s, d, "customer")
        .join(broadcast(T(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("c_mktsegment")), Seq(col("n_name")),
            Seq()),
          col("n_name"), col("c_mktsegment"))
        .agg(
          CleanFns.roundRepro(sum(col("c_acctbal")), 2).as("total_acctbal"),
          count(lit(1)).as("n_customers"))
    }),

    "q_interval_join" -> ((s, d) => {
      // batch twin of the streaming interval join: each click left-
      // joined to the same user's purchases within the following hour
      val ev = T(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("p_ts") > col("ts") &&
            col("p_ts") <= col("ts") + expr("INTERVAL 1 HOUR"), "left")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_event_id"), col("p_ts"), col("p_value"))
    }),

    "q_salted_agg" -> ((s, d) => {
      // skew-proof two-phase aggregation — oracle-checked against the
      // plain GROUP BY, proving the salted path is exact
      Skew.saltedAgg(T(s, d, "lineitem"), Seq("l_returnflag"),
          col("l_quantity"), col("l_orderkey"), salts = 16)
        .select(col("l_returnflag"),
          CleanFns.roundRepro(col("total"), 2).as("total_qty"),
          col("n"),
          CleanFns.roundRepro(col("avg"), 4).as("avg_qty"))
    }),

    "q_join_salted" -> ((s, d) =>
      // skew-proof equi-join: lineitem's hot suppkeys spread over 8
      // salted tasks, supplier replicated 8x — oracle-checked against
      // the plain join, proving the salted path is row-exact (the
      // companion to q_salted_agg: the two shapes AQE's skew handling
      // does not cover)
      Skew.saltedJoin(
          T(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
            col("l_quantity")),
          T(s, d, "supplier").select(col("s_suppkey").as("l_suppkey"),
            col("s_nationkey")),
          "l_suppkey", saltFrom = col("l_orderkey"), salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          CleanFns.roundRepro(sum(col("l_quantity")), 2).as("total_qty"))),

    "q_approx_percentile" -> ((s, d) => {
      // sketch-based percentiles (KLL/GK-style) — the 100 TB path
      // where exact interpolation's global sort per group is not an
      // option. Oracle strategy (bounded-error): the sketch guarantee
      // is |exact_rank(returned value) − q·n| ≤ n/accuracy, so a
      // second map-side-combinable pass computes the returned value's
      // rank range per group and emits ok-flags the DuckDB oracle can
      // assert as constant 1 — the rows-only sketch becomes a
      // hash-checkable bounded-error contract.
      val orders = T(s, d, "orders")
      val acc = 1000
      val sk = orders.groupBy(col("o_orderpriority"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(acc)).as("p50a"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(acc)).as("p90a"))
      def rankOk(q: Double, v: Column): Column = {
        // rank of v within the group is the interval [rlow, rhigh]
        // (ties); the sketch passes if q·n intersects it ± n/acc + 1
        val rlow = sum(when(col("o_totalprice") < v, 1L).otherwise(0L))
        val rhigh = sum(when(col("o_totalprice") <= v, 1L).otherwise(0L))
        val n = count(lit(1))
        val slack = n / lit(acc.toDouble) + lit(1.0)
        when(lit(q) * n >= rlow - slack && lit(q) * n <= rhigh + slack,
          lit(1)).otherwise(lit(0))
      }
      orders.join(broadcast(sk), Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          rankOk(0.5, col("p50a")).as("p50_ok"),
          rankOk(0.9, col("p90a")).as("p90_ok"))
    }),

    // -- LLM-training-data pipeline ----------------------------------
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(T(s, d, "documents"), "text", "doc_id")),

    "q_doc_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprints(T(s, d, "documents"), "text", "doc_id")),

    "q_token_count" -> ((s, d) =>
      TextAnalysis.tokenCounts(T(s, d, "documents"), "text", "doc_id")),

    "q_text_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(T(s, d, "documents"), "text", "doc_id")),

    "q_lang_id" -> ((s, d) =>
      TextAnalysis.langId(T(s, d, "documents"), "text", "doc_id")),

    "q_repetition" -> ((s, d) =>
      TextAnalysis.repetition(T(s, d, "documents"), "text", "doc_id")),

    "q_lm_score" -> ((s, d) =>
      TextAnalysis.lmScore(T(s, d, "documents"), "text", "doc_id")),

    "q_lm_perplexity" -> ((s, d) => {
      // CCNet-style held-out quality filter: Laplace bigram LM trained
      // on the even-id reference half, every doc scored by avg
      // conditional NLL (micro-units, integer-exact)
      val docs = T(s, d, "documents")
      TextAnalysis.perplexityScore(docs,
        docs.where(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id")
    }),

    "q_nb_classify" -> ((s, d) => {
      // in-engine trained multinomial Naive Bayes language classifier:
      // Laplace token models fit on the doc_id%5!=0 split, every doc
      // scored against every label (integer micro-NLL, exact argmax)
      val docs = T(s, d, "documents")
      TextAnalysis.nbClassify(docs,
        docs.where(pmod(col("doc_id"), lit(5)) =!= 0),
        "text", "doc_id", "lang")
    }),

    "q_winnow_fingerprint" -> ((s, d) =>
      // rolling-hash winnowing sketch, summarized per document
      TextAnalysis.winnowingFingerprints(T(s, d, "documents"), "text",
          "doc_id")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fp"),
          min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"))),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(T(s, d, "documents"), "text", "doc_id",
        threshold = 0.2)),

    // identical pair semantics, skew-robust candidate stage: the
    // bucket self-join is triangle-blocked over 8 salt groups so a
    // boilerplate-heavy bucket's quadratic pair-space spreads over 36
    // shuffle keys instead of one. Shares q_dedup_minhash's oracle —
    // the output must hash-match the unsalted derivation exactly.
    "q_dedup_minhash_salted" -> ((s, d) =>
      Dedup.minhashPairs(T(s, d, "documents"), "text", "doc_id",
        threshold = 0.2, salts = 8)),

    // the ONE-PERMUTATION variant through the gate: OPH signatures
    // (one hash per shingle + rotation densification — the cheapest
    // signature build at 100 TB) feed the SAME banding/cap/estimate
    // machinery; the oracle re-derives banding and estimation in SQL
    // over the embedded OPH signatures, like q_dedup_minhash's
    "q_dedup_oph" -> ((s, d) => {
      val sigs = Dedup.minhashSignaturesOPH(
        T(s, d, "documents"), "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = Dedup.minhashPairsFromSigs(sigs, "doc_id",
        threshold = 0.2).localCheckpoint(true)
      sigs.unpersist(blocking = false)
      out
    }),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(T(s, d, "documents"), "text", "doc_id",
        maxHamming = 3)),

    // skew-robust twin (triangle-blocked band self-join, 8 salts) —
    // held to the same brute-force hamming oracle as q_dedup_simhash
    "q_dedup_simhash_salted" -> ((s, d) =>
      Dedup.simhashPairs(T(s, d, "documents"), "text", "doc_id",
        maxHamming = 3, salts = 8)),

    "q_dedup_delta" -> ((s, d) => {
      // INCREMENTAL near-dup: today's load (doc_id % 10 == 0) against
      // the PERSISTED signature table of the standing corpus (staged
      // here via upsertSignatureSnapshot, exactly the production
      // loop) — only the delta's text is scanned, the standing corpus
      // participates as a parquet signature read; daily growth costs
      // O(delta scan + signature-table shuffle), never a 100 TB
      // re-scan. (Feeding minhashSignatures(oldDocs) directly instead
      // re-derived 90% of the corpus's signatures per downstream use
      // — 39.6 CPU-s vs 14.8 for the FULL run. Staged: ~27 CPU-s
      // total, of which the one-time signature-table build is ~14 —
      // the recurring delta portion is ~12, genuinely below the full
      // run, and at scale the build amortizes across loads.)
      // Result == the full run's pairs
      // restricted to those touching a new doc (the oracle asserts
      // exactly that restriction).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_dedup_delta_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val sigTable = s"$tmp/sigs"
      val docs = T(s, d, "documents")
      Dedup.upsertSignatureSnapshot(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 0), "text",
        "doc_id", sigTable)
      val newDocs = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      Dedup.minhashPairsDelta(newDocs, "text", "doc_id",
        graft.sources.LakeWriter.readSnapshot(s, sigTable),
        threshold = 0.2)
    }),

    "q_ngram_jaccard" -> ((s, d) => {
      // the production shape: LSH candidates -> exact Jaccard verify.
      // materialize=false: the pair frame is consumed exactly once by
      // the verify join, so the eager signature persist + checkpoint
      // would be pure overhead here (one fused lazy plan instead)
      val docs = T(s, d, "documents")
      val cand = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.1,
          materialize = false)
        .select(col("doc_a"), col("doc_b"))
      Dedup.ngramJaccard(cand, docs, "text", "doc_id", shingleN = 3,
        threshold = 0.1)
    }),

    "q_url_canonicalize" -> ((s, d) => {
      // web-corpus URL canonicalization ahead of URL dedup: casing,
      // default ports, fragments, tracking params, query order — all
      // normalized by pure codegen string ops
      val urls = T(s, d, "documents").select(col("doc_id"), concat(
        when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP://WWW."))
          .otherwise(lit("https://www.")),
        col("source"), lit(".Example.COM"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(":80"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit(":8080"))
          .otherwise(lit("")),
        lit("/Docs/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&b="), pmod(col("doc_id"), lit(5)).cast("string"),
        lit("&a=1"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("#sec"))
          .otherwise(lit(""))).as("url"))
      urls.select(col("doc_id"), col("url"),
        Curation.canonicalizeUrl(col("url")).as("canonical_url"))
    }),

    "q_url_dedup" -> ((s, d) => {
      // URL-first web dedup (the crawl's cheapest tier, ahead of any
      // text hashing): raw URLs differing in case / default port /
      // fragment / trailing slash / tracking params collapse to one
      // canonical URL; keep the best doc per URL (longest text, tie
      // to the smaller id) and count what was dropped. Groups are
      // (source, doc_id%50) by construction — all variants of a
      // group share scheme, so canonicalization provably unifies them
      val docs = T(s, d, "documents")
      val urls = docs.select(col("doc_id"), col("n_chars"), concat(
        when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTPS://WWW."))
          .otherwise(lit("https://www.")),
        col("source"), lit(".Example.COM"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(":443"))
          .otherwise(lit("")),
        lit("/Docs/"), pmod(col("doc_id"), lit(50)).cast("string"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("/"))
          .otherwise(lit("")),
        lit("?utm_source=feed&a=1"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("#sec"))
          .otherwise(lit(""))).as("url"))
      urls
        .withColumn("canonical_url",
          Curation.canonicalizeUrl(col("url")))
        .groupBy(col("canonical_url"))
        .agg(min_by(col("doc_id"),
            struct((-col("n_chars")).as("a"), col("doc_id").as("b")))
          .as("keep_doc_id"),
          count(lit(1)).as("n_dups"))
    }),

    "q_bpe_train" -> ((s, d) =>
      // tokenizer training IN the engine: 8 BPE merges learned over
      // the corpus; all iterative state is vocabulary-sized
      operators.Tokenize.bpeTrain(T(s, d, "documents"), "text",
        merges = 8)),

    "q_bpe_encode" -> ((s, d) => {
      // the tokenizer loop closed: train 8 merges in-engine, then
      // segment the corpus under them — per-doc BPE token counts.
      // The merge table is driver-tiny by construction (8 rows);
      // the apply fold runs on the DISTINCT-word table only
      val docs = T(s, d, "documents")
      val merges = operators.Tokenize.bpeTrain(docs, "text", merges = 8)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      operators.Tokenize.bpeSegmentCount(docs, "text", "doc_id", merges)
    }),

    "q_ngram_containment" -> ((s, d) => {
      // asymmetric excerpt detection: containment |A∩B|/|A| flags a
      // doc as a sub-document of another even when Jaccard is tiny
      val docs = T(s, d, "documents")
      val cand = Dedup.minhashPairs(docs, "text", "doc_id",
          threshold = 0.1, materialize = false)
        .select(col("doc_a"), col("doc_b"))
      Dedup.ngramContainment(cand, docs, "text", "doc_id", shingleN = 3,
        threshold = 0.1)
    }),

    "q_embed_cosine" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.cosinePairs(e.where(col("vec_id") < 10),
          e.where(col("vec_id") < 50), "vec_id", "embedding")
        .withColumn("cos_sim", CleanFns.roundRepro(col("cos_sim"), 4))
    }),

    "q_embed_project" -> ((s, d) =>
      // JL sign random projection 64->16 dims: native fused MAC
      // kernel, exact ±micro integer sums, zero shuffles — the
      // dimensionality cut before LSH/IVF signatures
      Similarity.randomProject(T(s, d, "embeddings"), "embedding",
        "vec_id", kOut = 16)),

    "q_weighted_sample" -> ((s, d) =>
      // Efraimidis-Spirakis weighted k-sample per lang, weight =
      // n_chars, u from 52 md5 bits — reproducible mixture draws
      Analytics.weightedSample(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("source"), col("n_chars")),
        Seq("lang"), "doc_id", "n_chars", k = 10)),

    "q_embed_cosine_topk" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.bruteForceTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    "q_embed_lsh_ann" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.lshTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, bits = 8, dim = 64)
    }),

    "q_embed_ivf_ann" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.ivfTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, nlist = 8, nprobe = 2)
    }),

    "q_dedup_embed" -> ((s, d) => {
      // embedding-space near-duplicate pairs (bucketed; rows-only).
      // Bit count scales with the corpus so bucket population stays
      // constant — fixed bits measured 81x CPU at 10x data (sf10);
      // past 100k vectors the triangle-block salt splits hot
      // buckets' pair work across tasks (same pair set — the sf10
      // watch item: top bucket ~5x the mean, fanning 2.7x/decade)
      val e = T(s, d, "embeddings")
      val n = e.count()
      Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
        threshold = 0.3, bits = Similarity.adaptiveBits(n),
        dim = 64, salts = Similarity.adaptiveBucketSalts(n))
    }),

    "q_multimodal_features" -> ((s, d) => {
      // oracle-compared floats are repr-rounded on both sides
      val f = Multimodal.decodeFeaturesFlatStub(
        Multimodal.attachBinary(T(s, d, "documents"), "doc_id", "text",
          "source"))
      (0 until 8).foldLeft(
        f.withColumn("byte_mean", CleanFns.roundRepro(col("byte_mean"), 6))) {
        (df, i) => df.withColumn(s"f$i", CleanFns.roundRepro(col(s"f$i"), 6))
      }
    }),

    "q_image_features" -> ((s, d) => {
      // REAL PNG decode (javax.imageio): payloads are genuine PNGs
      // synthesized from a closed-form pixel formula; the oracle
      // re-derives every feature from the formula, never the bytes —
      // proving the encode→decode roundtrip faithful
      val media = Multimodal.encodeSyntheticPng(T(s, d, "documents"), "doc_id")
      val f = Multimodal.decodeImageFeatures(media)
      Seq("mean_r", "mean_g", "mean_b", "l0", "l1", "l2", "l3")
        .foldLeft(f)((df, c) =>
          df.withColumn(c, CleanFns.roundRepro(col(c), 6)))
    }),

    "q_image_resize" -> ((s, d) => {
      // decode → nearest-neighbor resample to 8×8 → re-encode PNG →
      // decode again; oracle computes features at the NN-mapped
      // source coordinates (x·w/8, y·h/8)
      val media = Multimodal.encodeSyntheticPng(T(s, d, "documents"), "doc_id")
      val f = Multimodal.decodeImageFeatures(
        Multimodal.resizeImageNN(media, 8, 8))
      Seq("mean_r", "mean_g", "mean_b", "l0", "l1", "l2", "l3")
        .foldLeft(f)((df, c) =>
          df.withColumn(c, CleanFns.roundRepro(col(c), 6)))
    }),

    "q_image_phash" -> ((s, d) => {
      // perceptual-hash image dedup: decode real PNGs, 8×8 aHash,
      // exact-hash duplicate counts; the oracle re-derives every bit
      // from the closed-form pixel formula, never the bytes
      val media = Multimodal.encodeSyntheticPng(T(s, d, "documents"), "doc_id")
      val h = Multimodal.imageAHash(media)
      h.withColumn("n_same_hash",
        count(lit(1)).over(Window.partitionBy(col("hash_hi"),
          col("hash_lo"))))
    }),

    "q_image_dedup" -> ((s, d) => {
      // perceptual NEAR-dup images: decoded aHash halves recombined
      // into one 64-bit signature, then the SAME pigeonhole banding
      // as text simhash (4×16-bit bands — hamming ≤ 3 always shares
      // a band), exact bit_count verify, collapsed to SURVIVORS
      // (min-id per transitive cluster) — the production posture.
      // The gate returns the collapse, not the raw pairs: the
      // synthetic phash space saturates as sf grows, so a pair
      // output is quadratic in the saturation (the r14 sf1 outlier,
      // 2.1 M rows) while the survivor map stays O(medias). The
      // brute-force-pairs + recursive-closure oracle still proves
      // the bands complete — a missed pair splits a cluster and
      // shifts its survivor.
      // the corpus itself is CAPPED (doc_id < 5000 — full coverage
      // at the gate SFs, bounded at sf1+): the synthetic pixel
      // formula folds media_id mod 256, so its aHash space SATURATES
      // as the corpus grows and the candidate-pair table explodes
      // quadratically in the saturation — a property of the fixture,
      // not the operator (real phash spaces don't collapse; the
      // banding itself is pigeonhole-bounded, proven scaling on the
      // non-saturating text simhash by q_dedup_simhash). The cap
      // keeps the gate measuring the operator at 10x data.
      val media = Multimodal.encodeSyntheticPng(
        T(s, d, "documents").where(col("doc_id") < 5000), "doc_id")
      val h = Multimodal.imageAHash(media)
        .select(col("media_id"),
          shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo"))
            .as("phash"))
      val pairs = Dedup.hammingPairs(h, "media_id", "phash",
        maxHamming = 3)
      operators.Graph.dupSurvivorsFromComps(
        operators.Graph.connectedComponents(pairs, "doc_a", "doc_b"))
    }),

    "q_audio_resample" -> ((s, d) =>
      // REAL linear-interpolation resample of the 8-bit-PCM view to a
      // fixed 64-sample thumbnail; all-integer operands + one double
      // divide, so the oracle re-derives every sample bit-for-bit
      Multimodal.audioResampleLinear(
          Multimodal.attachBinary(T(s, d, "documents"), "doc_id", "text",
            "source"), outLen = 64)
        .withColumn("sample", CleanFns.roundRepro(col("sample"), 6))),

    "q_video_scenes" -> ((s, d) =>
      // shot-boundary detection over the frame-sampled payload view:
      // per-frame integer luma proxy through the decode seam, then
      // declarative lag-diff / cut-flag / running-sum scene ids —
      // integer math end to end, oracle-exact
      Multimodal.sceneCuts(
        Multimodal.attachBinary(T(s, d, "documents"), "doc_id", "text",
          "source", mime = "video/raw"),
        frameLen = 64, cutThreshold = 300L)),

    "q_connected_components" -> ((s, d) => {
      // edges: same-nation customers with near-equal balances; comp =
      // transitive closure min-id (dup-cluster resolution shape)
      val c = T(s, d, "customer")
      val a = c.select(col("c_custkey").as("src"),
        col("c_nationkey").as("nk"), col("c_acctbal").as("ab"))
      val b = c.select(col("c_custkey").as("dst"),
        col("c_nationkey").as("nk"), col("c_acctbal").as("bb"))
      val edges = a.join(b, Seq("nk"))
        .where(col("src") < col("dst") && abs(col("ab") - col("bb")) < 1.0)
        .select("src", "dst")
      operators.Graph.connectedComponents(edges, "src", "dst")
    }),

    "q_cc_incremental" -> ((s, d) => {
      // INCREMENTAL CC through the gate: the edge set splits into a
      // STANDING graph (labeled once) and a DELTA ((src+dst)%3==0 —
      // merges components, introduces brand-new nodes, and leaves
      // some components untouched); the delta folds in via
      // contraction and the result must equal the full closure over
      // the union — which is exactly what the oracle computes. The
      // daily-dedup-load path: the standing corpus participates only
      // through its node-sized label table.
      val c = T(s, d, "customer")
      val a = c.select(col("c_custkey").as("src"),
        col("c_nationkey").as("nk"), col("c_acctbal").as("ab"))
      val b = c.select(col("c_custkey").as("dst"),
        col("c_nationkey").as("nk"), col("c_acctbal").as("bb"))
      val edges = a.join(b, Seq("nk"))
        .where(col("src") < col("dst") && abs(col("ab") - col("bb")) < 1.0)
        .select("src", "dst")
      val isDelta = pmod(col("src") + col("dst"), lit(3)) === 0
      val labels = operators.Graph.connectedComponents(
        edges.where(!isDelta), "src", "dst")
      operators.Graph.connectedComponentsIncremental(
        labels, edges.where(isDelta), "src", "dst")
    }),

    "q_dedup_survivors" -> ((s, d) =>
      // the full dedup pipeline: LSH candidates -> transitive clusters
      // -> one survivor per cluster (what a curation job actually runs)
      operators.Graph.dupSurvivorsFromComps(SharedCC.comps(s, d))),

    "q_dedup_survivors_incr" -> ((s, d) => {
      // the DAILY-LOAD dedup resolution: the LSH pair table splits
      // into a STANDING graph (labeled once) and a DELTA
      // ((doc_a+doc_b)%3==0), the delta folds in by contraction, and
      // the survivors must equal the from-scratch resolution over the
      // full pair set — the oracle (shared with q_dedup_survivors) is
      // the full recursive closure, blind to the split. At 100 TB
      // this is the path that makes daily dedup O(delta), not
      // O(corpus): pairs from minhashPairsDelta, labels from the
      // standing snapshot, one fold.
      val pairs = Dedup.minhashPairs(T(s, d, "documents"), "text",
        "doc_id", threshold = 0.2)
      val isDelta = pmod(col("doc_a") + col("doc_b"), lit(3)) === 0
      val labels = operators.Graph.connectedComponents(
        pairs.where(!isDelta), "doc_a", "doc_b")
      operators.Graph.dupSurvivorsFromComps(
        operators.Graph.connectedComponentsIncremental(
          labels, pairs.where(isDelta), "doc_a", "doc_b"))
    }),

    "q_dedup_survivors_quality" -> ((s, d) => {
      // survivor = the highest-QUALITY doc of each dup cluster (min-id
      // tie-break), not the smallest id — the curation-grade variant
      val docs = T(s, d, "documents")
      val scores = TextAnalysis.qualityScore(docs, "text", "doc_id")
      operators.Graph.dupSurvivorsByFromComps(SharedCC.comps(s, d),
        scores, "doc_id", "quality_score")
    }),

    "q_mixture_sample" -> ((s, d) =>
      // training-data mixing: 50% en, 25% de, 10% of everything else
      Analytics.mixtureSample(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("source")),
        "lang", "doc_id", Map("en" -> 50, "de" -> 25),
        defaultPercent = 10)),

    "q_sample_per_group" -> ((s, d) => {
      Analytics.deterministicSample(
          T(s, d, "documents").select(col("doc_id"), col("lang"),
            col("source"), col("n_chars")),
          Seq("lang"), "doc_id", k = 5)
    }),

    "q_asof_join" -> ((s, d) => {
      // each click joined to the user's most recent prior purchase
      val ev = T(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      AsOfJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
          tieBreak = Seq("p_event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_event_id"), col("p_value"))
    }),

    "q_lookup_enrich" -> ((s, d) => {
      // static in-memory lookup (the reference's pycountry/FX-rate
      // pattern) broadcast onto lake data
      val lookup = s.createDataFrame(Seq(
        ("AFRICA", "AF", 1.0), ("AMERICA", "AM", 1.1), ("ASIA", "AS", 0.9),
        ("EUROPE", "EU", 1.2), ("MIDDLE EAST", "ME", 0.8)))
        .toDF("r_name", "region_code", "weight")
      Dims.lookupEnrich(
          T(s, d, "region").join(T(s, d, "nation"),
            col("r_regionkey") === col("n_regionkey")),
          lookup, Seq("r_name"))
        .select(col("n_name"), col("r_name"), col("region_code"),
          col("weight"))
    }),

    "q_json_extract" -> ((s, d) => {
      // semi-structured props column: '{"k": 69}'
      T(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        when(get_json_object(col("props"), "$.k").cast("int") >= 50,
          lit("HIGH")).otherwise(lit("LOW")).as("k_band"))
    }),

    "q_approx_distinct" -> ((s, d) => {
      // HLL++ sketch per group. Oracle strategy (bounded-error): the
      // exact distinct count rides the same aggregate, and the output
      // carries ok-flags asserting |approx − exact| ≤ 5·rsd·exact + 5
      // (5σ of the sketch's standard error, plus absolute slack for
      // tiny groups) — constant 1 on the DuckDB side, so the sketch's
      // accuracy contract is hash-checked. At 100 TB only the sketch
      // column runs; the exact twin exists for the verification gate.
      val rsd = 0.01
      def ok(approx: Column, exact: Column): Column =
        when(abs(approx.cast("double") - exact) <=
          lit(5 * rsd) * exact + lit(5.0), lit(1)).otherwise(lit(0))
      // SPLIT aggregates (r18): one fused agg mixing exact
      // countDistinct with approx_count_distinct plans a single
      // Expand whose grouping keys include BOTH distinct columns,
      // and Spark's RewriteDistinctAggregates carries the
      // non-distinct aggregates' buffers — two rsd=0.01 HLL++
      // sketches ≈ 24 KB — on EVERY (event_type, user_id, props,
      // gid) group row; near-unique `props` makes that ~rowcount ×
      // 24 KB of aggregation-buffer traffic per pass (AggSplitProbe:
      // fused 42 CPU-s warm vs 1.1 split at sf0.1; the r17 32-way
      // spread multiplied it further and is REVERTED — it was the
      // round's one measured regression, 0.92× at the driver).
      // Split, each aggregate is the cheap shape: the approx branch
      // keeps one sketch pair per GROUP (no Expand), the exact
      // branch's Expand carries count-only buffers. Results are
      // bit-identical (HLL registers are max-merged — partitioning
      // and order independent; countDistinct is exact integers) and
      // the oracle sorts rows, so the join's output order is free.
      val ev = T(s, d, "events")
      val approxAgg = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("au"),
          approx_count_distinct(col("props"), rsd).as("ap"))
      val exactAgg = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          countDistinct(col("props")).as("exact_props"))
      exactAgg.join(approxAgg, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          ok(col("au"), col("exact_users")).as("users_ok"),
          ok(col("ap"), col("exact_props")).as("props_ok"))
    }),

    // -- streaming (speed layer) -------------------------------------
    "q_stream_window_agg" -> ((s, d) =>
      Speed.runToBatch(s,
        Speed.windowedAgg(Speed.eventStream(s, d)),
        name = "stream_window_agg", mode = OutputMode.Complete())),

    "q_stream_topk" -> ((s, d) =>
      // lambda serving view: trending top-3 event types per day over
      // the speed-layer windowed rollup (rank on the completed agg)
      Speed.topKPerWindow(
        Speed.runToBatch(s,
          Speed.windowedAgg(Speed.eventStream(s, d)),
          name = "stream_topk", mode = OutputMode.Complete()), k = 3)),

    "q_stream_ohlc" -> ((s, d) =>
      // speed-layer OHLC candles: 7-day tumbling windows, open/close
      // via struct-argmin state — deterministic under any micro-batch
      // arrival order
      Speed.runToBatch(s,
        Speed.ohlcPerWindow(Speed.eventStream(s, d)),
        name = "stream_ohlc", mode = OutputMode.Complete())),

    "q_stream_enrich" -> ((s, d) =>
      // stream-static enrichment: each micro-batch broadcast-joins
      // the driver-side dim snapshot — stateless, append-mode, and
      // the dim re-resolves per batch (slowly-changing dims are
      // picked up mid-stream). The speed layer's lookup join.
      Speed.runToBatch(s,
        Speed.enrichStream(Speed.eventStream(s, d),
          T(s, d, "customer").select(col("c_custkey").as("user_id"),
            col("c_mktsegment"), col("c_nationkey")),
          Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("c_mktsegment"), col("c_nationkey")),
        name = "stream_enrich", mode = OutputMode.Append())),

    "q_stream_dedup" -> ((s, d) =>
      Speed.runToBatch(s,
        Speed.streamingDedup(Speed.eventStream(s, d),
            Seq("user_id", "event_type"))
          .select(col("user_id"), col("event_type")),
        name = "stream_dedup", mode = OutputMode.Append())),

    "q_stream_dedup_within" -> ((s, d) =>
      // bounded-state dedup: state evicted past the watermark horizon
      Speed.runToBatch(s,
        Speed.streamingDedupWithinWatermark(Speed.eventStream(s, d),
            Seq("user_id", "event_type"))
          .select(col("user_id"), col("event_type")),
        name = "stream_dedup_within", mode = OutputMode.Append())),

    "q_stream_sessionize" -> ((s, d) =>
      // stateful flatMapGroupsWithState sessionization with event-time
      // timeout flush (sessions closed by gap OR by watermark expiry).
      // The sentineled source runs the finite stream as three batches,
      // so the watermark actually passes every real session's timeout
      // and the result EQUALS batch q_sessionize (oracle-checked);
      // sentinel-user sessions are excluded.
      Speed.runToBatch(s,
        Speed.sessionizeStream(Speed.eventStreamSentineled(s, d),
          gapMillis = 1800000L, flushOnTimeout = true),
        name = "stream_sessionize", mode = OutputMode.Append())
        .where(col("user_id") >= 0)),

    "q_stream_anomaly" -> ((s, d) =>
      // streaming z-score drift monitor: per event_type running
      // (n, Σ, Σ²) in constant state, each event flagged against the
      // distribution seen so far — exact BigInt comparison, so the
      // finite run equals the batch prefix-window oracle bit-for-bit
      Speed.runToBatch(s,
        Speed.anomalyStream(Speed.eventStream(s, d)),
        name = "stream_anomaly", mode = OutputMode.Append())),

    "q_stream_bloom_dedup" -> ((s, d) => {
      // HISTORY dedup as a speed-layer member: each micro-batch is
      // Bloom-prefiltered + exact-anti-joined against a durable
      // history table, then appended to it. The sentineled source
      // forces TWO batches, so batch 2's sentinel keys genuinely
      // exercise the seen-in-history drop path; a fresh per-run
      // history dir keeps the result deterministic.
      // ONE fixed staging dir per source dir, wiped at the start of
      // each run: repeated Bench/Verify invocations reuse the path
      // instead of leaking a history+checkpoint copy per call
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_bloom_dedup_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      java.nio.file.Files.createDirectories(tmp)
      val q = Speed.streamingHistoryDedup(
        Speed.eventStreamSentineled(s, d)
          .select(col("user_id"), col("event_type")),
        Seq("user_id", "event_type"),
        tmp.resolve("history").toString,
        tmp.resolve("ckpt").toString)
      q.awaitTermination()
      s.read.parquet(tmp.resolve("history").toString)
        .where(col("user_id") >= 0)
        .select(col("user_id"), col("event_type"))
    }),

    "q_stream_hll" -> ((s, d) => {
      // speed-layer approx-distinct: per-key HLL sketches as
      // STREAMING aggregation state (constant bytes per key, the
      // sketch IS the state) — the serving-view twin of q_mv_hll's
      // batch MV. The finite run's estimate is deterministic
      // (DataSketches hashing), so the 5σ-bound flag vs the exact
      // twin pins to 1 in the oracle.
      val est = Speed.runToBatch(s,
        Speed.eventStream(s, d).groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("hll")),
        name = "stream_hll", mode = OutputMode.Complete())
        .select(col("event_type"),
          hll_sketch_estimate(col("hll")).as("__est"))
      val truth = T(s, d, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(truth, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__est") - col("exact_users")) <=
            greatest(col("exact_users") * 0.08, lit(5.0)))
            .cast("int").as("hll_ok"))
    }),

    "q_stream_sample" -> ((s, d) =>
      // streaming reservoir: k uniform draws per event type in ≤ k
      // pairs of state (native bounded k-min aggregate) — exact and
      // micro-batch-order-invariant because the reservoir is a pure
      // order statistic over md5 priorities. Sentinels (user_id < 0)
      // are dropped PRE-aggregation so they force batches without
      // occupying reservoir slots.
      Speed.runToBatch(s,
        Speed.reservoirPerKey(
          Speed.eventStreamSentineled(s, d).where(col("user_id") >= 0),
          "event_type", "event_id", k = 10),
        name = "stream_sample", mode = OutputMode.Complete())),

    "q_stream_upsert" -> ((s, d) => {
      // CDC apply-changes to the lake: each micro-batch reduces to
      // its latest row per key and MERGEs copy-on-write into a
      // snapshot table — one time-travelable version per batch. The
      // sentinel keys (user_id −1) span both batches, so the
      // cross-batch overwrite path genuinely runs; real keys all
      // land in batch 1 (single staged file), so the finite run's
      // final state is exactly latest-per-key. Fixed per-sfdir
      // staging dir, wiped per run (the bloom-dedup discipline).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_stream_upsert_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      java.nio.file.Files.createDirectories(tmp)
      val q = Speed.upsertToSnapshot(
        Speed.eventStreamSentineled(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value")),
        tmp.resolve("tbl").toString,
        Seq("user_id", "event_type"), "ts", "event_id",
        tmp.resolve("ckpt").toString)
      q.awaitTermination()
      graft.sources.LakeWriter
        .readSnapshot(s, tmp.resolve("tbl").toString)
        .where(col("user_id") >= 0)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), col("value"))
    }),

    "q_stream_interval_join" -> ((s, d) => {
      // stream-stream LEFT interval join (null fill on watermark pass).
      // Sentineled source: the final batch runs with the watermark past
      // every real click's join horizon, so unmatched clicks ARE
      // null-filled and the result equals the batch LEFT interval join
      // (oracle-checked).
      val ev = Speed.eventStreamSentineled(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      Speed.runToBatch(s,
        Speed.intervalJoinLeft(clicks, purchases, "user_id",
            "ts", "p_ts", withinMillis = 3600000L),
        name = "stream_interval_join", mode = OutputMode.Append())
        .where(col("user_id") >= 0)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_event_id"), col("p_value"))
    }),

    // -- corpus curation ---------------------------------------------
    "q_decontaminate" -> ((s, d) => {
      // benchmark set = every 50th doc; flag corpus docs sharing any
      // 5-gram with it (eval-leakage guard)
      val docs = T(s, d, "documents")
      Curation.decontaminate(docs, docs.where(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 5, minOverlap = 1)
    }),

    "q_passage_dedup" -> ((s, d) =>
      Curation.passageDedup(T(s, d, "documents"), "text", "doc_id",
        chunkTokens = 10)),

    // skew-robust twin: two-phase agg + join instead of the
    // per-passage window — a viral boilerplate passage partial-
    // aggregates in parallel instead of buffering one task's window.
    // Same oracle as q_passage_dedup (identical output required).
    "q_passage_dedup_robust" -> ((s, d) =>
      Curation.passageDedup(T(s, d, "documents"), "text", "doc_id",
        chunkTokens = 10, skewRobust = true)),

    "q_chunk_overlap" -> ((s, d) =>
      // RAG chunker: 32-token windows every 24 tokens (25% overlap),
      // full tail coverage — the indexing-prep fan-out
      Curation.chunkForRag(T(s, d, "documents"), "text", "doc_id",
        chunkTokens = 32, stride = 24)),

    "q_cdc_chunks" -> ((s, d) =>
      // content-defined chunking (rsync/FastCDC boundary rule): chunk
      // grain for byte-level dedup/delta storage — one O(n) codegen
      // loop per doc, per-CHUNK (not per-char) fan-out, zero shuffles
      Curation.cdcChunks(T(s, d, "documents"), "text", "doc_id",
        divisor = 64)),

    "q_cdc_dedup" -> ((s, d) =>
      // byte-level dedup report over the CDC chunks: per doc, the
      // share of chars living in chunks that recur in >= 2 documents
      Curation.cdcDedupStats(T(s, d, "documents"), "text", "doc_id",
        divisor = 64)),

    "q_ingest_jsonl" -> ((s, d) => {
      // the INGEST side of the JSONL shard layout, roundtripped:
      // documents export to hive-sharded JSONL, two mangled lines are
      // planted in a shard, and the schema-on-read PERMISSIVE parse
      // must recover every good row exactly while COUNTING the bad
      // ones (audit, never a silent drop) — the reference stack's
      // API-landing-zone ingest as one operator
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_ingest_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val docs = T(s, d, "documents")
      operators.Packing.exportJsonlShards(
        docs.withColumn("shard",
          pmod(col("doc_id"), lit(4)).cast("int")),
        "shard", s"$tmp/shards").count()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/shards/shard=0/zz_bad.txt"),
        "{\"doc_id\": not-json\ngarbage line\n".getBytes("UTF-8"))
      val parsed = operators.Packing.readJsonlShards(s,
        s"$tmp/shards",
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      val good = parsed.where(col("_corrupt").isNull)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      // cache-free audit: bad = non-empty physical lines − good rows.
      // count(doc_id) (not count(*)) keeps a DATA column in the
      // pruned schema — count(*) would prune to _corrupt alone and
      // trip QUERY_ONLY_CORRUPT_RECORD_COLUMN; doc_id is never null
      // on a good row (the exporter always writes it)
      val bad = operators.Packing.jsonlLineCount(s, s"$tmp/shards")
        .crossJoin(broadcast(
          good.agg(count(col("doc_id")).as("__n_good"))))
        .select((col("n_lines") - col("__n_good")).as("n_bad"))
      good.crossJoin(broadcast(bad))
    }),

    "q_export_tar" -> ((s, d) => {
      // WebDataset-style tar shard export: byte-deterministic ustar
      // shards + a manifest whose total_bytes the oracle re-derives
      // from the tar size law
      val out = java.nio.file.Paths.get("/tmp",
        "graft_tar_" + d.replaceAll("[^A-Za-z0-9]", "_")).toString
      graft.sources.TarShards.exportTarShards(T(s, d, "documents"),
        "text", "doc_id", out, shardDocs = 100)
    }),

    "q_boilerplate" -> ((s, d) =>
      // CCNet/RefinedWeb-style boilerplate removal: a 2-token passage
      // recurring in >= 3 distinct docs of the same source is template
      // text and is dropped from EVERY doc (vs passage_dedup, which
      // keeps the global first occurrence)
      Curation.boilerplateRemove(T(s, d, "documents"), "text", "doc_id",
        "source", chunkTokens = 2, minDocs = 3)),

    "q_pii_redact" -> ((s, d) => {
      // the corpus has no PII — append a deterministic contact line
      // per doc (same derivation in the oracle) so the regexes do
      // real matching work
      val aug = T(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@mail.example.com at 10.0."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") % 100).cast("string"), lit(" or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      Curation.piiRedact(aug, "text", "doc_id")
    }),

    "q_bloom_antijoin" -> ((s, d) => {
      // daily-load dedup shape: docs with doc_id % 3 == 0 were already
      // ingested (their fingerprints are the history); the whole batch
      // re-arrives and only genuinely-new docs may pass
      val fp = T(s, d, "documents").select(col("doc_id"),
        TextFns.fingerprint(col("text")).as("fingerprint"))
      Curation.bloomAntiJoin(fp,
        fp.where(col("doc_id") % 3 === 0).select("fingerprint"),
        "fingerprint", expectedItems = 100000L)
    }),

    "q_semdedup" -> ((s, d) => {
      // cluster count scales with the corpus so cell population stays
      // constant — fixed nlist measured 78x CPU at 10x data (sf10)
      val e = T(s, d, "embeddings")
      Similarity.semDedup(e, "vec_id", "embedding",
        nlist = Similarity.adaptiveNlist(e.count()), threshold = 0.3)
    }),

    "q_filter_cascade" -> ((s, d) =>
      // quality-filter cascade with per-doc audit: which rule dropped it
      Curation.filterCascade(T(s, d, "documents"), "text", "doc_id")),

    "q_domain_cap" -> ((s, d) =>
      // anti-boilerplate guard: at most 10 docs per source, longest kept
      Curation.domainCap(
        T(s, d, "documents").select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "doc_id", cap = 10, priority = Seq(col("n_chars").desc))),

    "q_split_stratified" -> ((s, d) =>
      // exact-proportion 80/10/10 split within each language stratum
      Curation.stratifiedSplit(
        T(s, d, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", trainPct = 80, valPct = 10)),

    "q_tfidf" -> ((s, d) =>
      TextAnalysis.tfidf(T(s, d, "documents"), "text", "doc_id", k = 3)),

    "q_seq_pack" -> ((s, d) => {
      // pack docs into 256-token training sequences across 8 shards
      val docs = T(s, d, "documents")
      Packing.packSequences(
        docs.select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 256, shards = 8)
    }),

    "q_seq_pack_bfd" -> ((s, d) => {
      // best-fit-decreasing packing: same layout contract as
      // q_seq_pack, materially less padding (11/9·OPT bound)
      val docs = T(s, d, "documents")
      Packing.packSequencesBFD(
        docs.select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 256, shards = 8)
    }),

    "q_corpus_stats" -> ((s, d) =>
      // the before/after profile every curation stage reports
      TextAnalysis.corpusStats(T(s, d, "documents"), "text", "doc_id")),

    "q_profile" -> ((s, d) =>
      // per-COLUMN data-quality profile (nulls/cardinality/range/mean)
      // in one aggregate scan; complements q_corpus_stats' corpus-level
      // text profile
      operators.Profiling.profile(T(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))),

    "q_skew_diag" -> ((s, d) =>
      // partition-strategy pre-flight: per candidate join/agg key, the
      // hottest key's share + distribution entropy — the numbers that
      // decide salting vs AQE skew-join vs plain hash partitioning
      operators.Profiling.skewDiag(T(s, d, "events"),
          Seq("event_type", "user_id"))
        .unionAll(operators.Profiling.skewDiag(T(s, d, "orders"),
          Seq("o_custkey")))),

    "q_heavy_hitters" -> ((s, d) => {
      // hot-key detection with CONSTANT executor state: count-min
      // sketch over the corpus token stream; the exact top-20 rides
      // as the gate's verification twin, the ok-flag asserts every
      // estimate obeys the CMS one-sided bound
      val toks = T(s, d, "documents").select(
        explode(TextFns.tokens(TextFns.normalizeText(col("text"))))
          .as("tok"))
      operators.Sketches.heavyHitters(s, toks, "tok", k = 20)
    }),

    "q_ohlc" -> ((s, d) =>
      // the reference domain's core rollup: weekly OHLC candles per
      // event type — open/close via min_by/max_by over (ts, id), one
      // aggregate, no window
      Analytics.ohlcResample(T(s, d, "events"), "event_type", "ts",
        "event_id", "value", unit = "week")),

    "q_vwap" -> ((s, d) =>
      // volume-weighted average value per type per day; weight =
      // props.k — micro-unit integer Σ(p·w) so the ratio is
      // engine-exact
      Analytics.vwap(
        T(s, d, "events").withColumn("w",
          get_json_object(col("props"), "$.k").cast("long")),
        "event_type", "ts", "value", "w")),

    "q_mad_outlier" -> ((s, d) =>
      // robust outlier gate: median/MAD per event type — the report
      // extreme points cannot drag, unlike q_anomaly's mean/stddev
      Analytics.madOutliers(T(s, d, "events"), "event_type", "value")),

    "q_pagerank" -> ((s, d) => {
      // integer-exact 3-iteration PageRank over the procurement
      // graph (customer↔supplier trading pairs, undirected): the
      // centrality primitive — also what ranks authoritative docs
      // inside near-dup clusters. Nodes ride as LONGS through the
      // distinct + 3 shuffle rounds (customer 2k, supplier 2k+1 —
      // the "C#"/"S#" labels render once on the node-sized result;
      // string keys through every exchange measured ~2x the CPU)
      val pairs = T(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(T(s, d, "lineitem").select(col("l_orderkey"),
          col("l_suppkey")), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      // edgesDistinct: `pairs` is distinct and the reversed union is
      // DISJOINT from it by construction (customer nodes even,
      // supplier nodes odd — src parity differs between the halves),
      // so pageRank's defensive dedup pass would re-shuffle 2x the
      // edge list to remove nothing
      operators.Graph.pageRank(edges, "src", "dst", iters = 3,
        edgesDistinct = true)
        .select(
          when(pmod(col("node"), lit(2)) === 0,
            concat(lit("C"), expr("node div 2").cast("string")))
            .otherwise(concat(lit("S"), expr("node div 2").cast("string")))
            .as("node"),
          col("degree"), col("rank_micro"))
    }),

    "q_triangle_count" -> ((s, d) => {
      // exact triangles over the co-purchase graph (parts co-ordered
      // within an order — basket-bounded pair fanout, so the edge
      // derivation stays linear in lineitems). Degree-oriented
      // enumeration: every triangle generated once at its
      // min-(deg,id) corner; a hub part is never a wedge center
      val li = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"), "l_orderkey")
        .where(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      operators.Graph.triangleCounts(edges, "u", "v")
        .select(col("node").as("l_partkey"), col("n_triangles"))
    }),

    "q_topk_sketch" -> ((s, d) => {
      // the NATIVE Misra-Gries aggregate (custom
      // TypedImperativeAggregate): constant counter state per
      // partial, merge-order-invariant guarantee asserted per
      // exact-top-20 token
      val toks = T(s, d, "documents").select(
        explode(TextFns.tokens(TextFns.normalizeText(col("text"))))
          .as("tok"))
      operators.Sketches.topKGuaranteed(s, toks, "tok", k = 20,
        capacity = 256)
    }),

    "q_fuzzy_join" -> ((s, d) => {
      // entity resolution: a deterministically-dirtied part name (one
      // char deleted at position p_partkey % (len-2) + 2) resolved
      // back to the clean dimension by blocked levenshtein
      val dirty = T(s, d, "part").select(col("p_partkey"), expr(
        """concat(
          |  substring(p_name, 1,
          |    cast(p_partkey % (length(p_name) - 2) + 1 as int)),
          |  substring(p_name,
          |    cast(p_partkey % (length(p_name) - 2) + 3 as int)))"""
          .stripMargin).as("dirty_name"))
      operators.Linkage.fuzzyResolve(dirty, "p_partkey", "dirty_name",
        T(s, d, "part"), "p_name", maxDist = 2)
    }),

    "q_er_clusters" -> ((s, d) => {
      // dimension-free entity resolution: clean + dirtied part names
      // as separate RECORDS, blocked pairwise levenshtein edges,
      // transitive closure — every record labeled with its entity
      // (clean rec 2k, dirty rec 2k+1; the two spellings of part k
      // must land in one cluster even when only the clean name
      // bridges them)
      val part = T(s, d, "part")
      val dirty = part.select(col("p_partkey"), expr(
        """concat(
          |  substring(p_name, 1,
          |    cast(p_partkey % (length(p_name) - 2) + 1 as int)),
          |  substring(p_name,
          |    cast(p_partkey % (length(p_name) - 2) + 3 as int)))"""
          .stripMargin).as("dirty_name"))
      val recs = part
        .select((col("p_partkey") * 2).as("rec_id"),
          col("p_name").as("name"))
        .unionByName(dirty.select((col("p_partkey") * 2 + 1).as("rec_id"),
          col("dirty_name").as("name")))
      operators.Linkage.erClusters(recs, "rec_id", "name", maxDist = 2)
    }),

    "q_top_terms" -> ((s, d) =>
      // vocabulary head: top-20 tokens by corpus frequency
      TextAnalysis.topTerms(T(s, d, "documents"), "text", "doc_id",
        k = 20)),

    "q_collocations" -> ((s, d) =>
      // word2phrase collocation mining: adjacent-bigram PMI in
      // micro-nats over one token scan, count-pruned before the joins
      TextAnalysis.collocations(T(s, d, "documents"), "text", "doc_id",
        minCount = 10L)),

    "q_corr" -> ((s, d) =>
      // exact-integer Pearson correlation (value-cents vs hour of
      // day, per event type): moment sums in decimal(38,0), one
      // IEEE division + sqrt at the end — engine-reproducible to the
      // bit, unlike stock corr()'s running-update float accumulation
      operators.Profiling.corrExact(T(s, d, "events"),
        Seq("event_type"), hour(col("ts")),
        floor(col("value") * 100 + lit(0.5)).cast("long"))),

    "q_chi2_assoc" -> ((s, d) =>
      // corpus-composition drift: chi-square association between
      // lang and source in EXACT integer micro-units (no
      // transcendentals) — one corpus-sized count, everything after
      // is cardinality-sized
      operators.Profiling.chi2Assoc(T(s, d, "documents"),
        "lang", "source")),

    "q_topk_grouped" -> ((s, d) =>
      // per-SOURCE Misra-Gries heavy hitters: one bounded sketch per
      // group, contract check fully columnar (group cardinality
      // unbounded — nothing reaches the driver but the result)
      operators.Sketches.topKGuaranteedByGroup(
        T(s, d, "documents").select(col("source"),
          explode(TextFns.tokens(TextFns.normalizeText(col("text"))))
            .as("tok")),
        "source", "tok", k = 5, capacity = 128)),

    "q_drift_psi" -> ((s, d) =>
      // ingest drift monitor: population-stability-index terms between
      // the even- and odd-id halves of the events value distribution,
      // 20 fixed cent-width buckets, Laplace-smoothed micro-nat terms
      operators.Profiling.psiDrift(T(s, d, "events"), "value",
        isRef = pmod(col("event_id"), lit(2)) === 0)),

    "q_drift_ks" -> ((s, d) =>
      // the distribution-free drift twin: exact-integer two-sample
      // Kolmogorov-Smirnov distance per event type between the even-
      // and odd-id halves of the value distribution (cent-quantized
      // so the ECDF domain is integral) — no bucket widths to tune,
      // catches any ECDF divergence PSI's bins can miss
      operators.Profiling.ksDrift(
        T(s, d, "events").withColumn("value_cents",
          floor(col("value") * 100 + lit(0.5)).cast("long")),
        "event_type", "value_cents",
        isRef = pmod(col("event_id"), lit(2)) === 0)),

    "q_corpus_delta" -> ((s, d) => {
      // incremental corpus stats: three snapshot commits (two appends
      // on a base load), then per-version growth derived from each
      // commit's DELTA FILES only — the versioned-lake answer to
      // "how did today's load change the corpus" that never re-scans
      // history. Fixed per-sfdir staging table, wiped per run.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_corpus_delta_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      val docs = T(s, d, "documents").select(col("doc_id"), col("text"))
      import graft.sources.LakeWriter
      LakeWriter.commitSnapshot(docs.where(pmod(col("doc_id"), lit(4)) <= 1),
        table)
      LakeWriter.commitSnapshot(docs.where(pmod(col("doc_id"), lit(4)) === 2),
        table, mode = "append")
      LakeWriter.commitSnapshot(docs.where(pmod(col("doc_id"), lit(4)) === 3),
        table, mode = "append")
      TextAnalysis.corpusStatsDelta(s, table, "text", "doc_id")
    }),

    "q_snapshot_delete" -> ((s, d) => {
      // copy-on-write DELETE WHERE over a versioned corpus: commit
      // the documents table, delete the short English docs, read the
      // post-delete version. The delete is FILE-PRUNED (only files
      // containing a matching row rewrite) and keeps NULL-predicate
      // rows — SQL DELETE semantics, oracle-matched via the coalesce
      // form. The pre-delete version stays time-travelable; physical
      // erasure is delete + vacuum (docs/snapshot_format.md).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_del_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      LakeWriter.commitSnapshot(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("source"), col("n_chars")), table)
      LakeWriter.deleteFromSnapshot(s, table,
        col("lang") === "en" && col("n_chars") < 200)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_bloomskip" -> ((s, d) => {
      // BLOOM FILE INDEX point lookup: four interleaved-id commits
      // make every file's doc_id/fp min-max span the whole range (so
      // min/max stats cannot prune), then a fingerprint equality
      // resolves through the per-file blooms — the Delta
      // bloom-filter-index shape for needle-in-100TB lookups. The
      // pruning itself (pruned files never open) is proven
      // corrupt-in-place by BloomIndexSpec; this gate checks the
      // lookup's end-to-end correctness.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_bloom_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val docs = T(s, d, "documents").select(col("doc_id"), col("lang"),
        col("n_chars"), TextFns.fingerprint(col("text")).as("fp"))
      (0 until 4).foreach { i =>
        LakeWriter.commitSnapshot(
          docs.where(pmod(col("doc_id"), lit(4)) === i).coalesce(1),
          table, if (i == 0) "overwrite" else "append")
      }
      LakeWriter.setBloomIndex(s, table, Map("fp" -> 10000L))
      val target = docs.where(col("doc_id") === 42).select(col("fp"))
        .head().getString(0)
      LakeWriter.readSnapshotWhere(s, table, col("fp") === target)
    }),

    "q_snapshot_clone" -> ((s, d) => {
      // SHALLOW CLONE: a zero-copy table fork. The source commits two
      // versions, the clone forks at latest (metadata-only — no data
      // bytes move, stats/checks/colmap carry verbatim), then the two
      // diverge: an append lands only on the clone, a DELETE only on
      // the source. Output = both tables' final per-lang profiles.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_clone_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val src = s"$tmp/src"
      val cln = s"$tmp/clone"
      import graft.sources.LakeWriter
      val docs = T(s, d, "documents").select(col("doc_id"), col("lang"),
        col("source"), col("n_chars"))
      LakeWriter.commitSnapshot(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), src)
      LakeWriter.commitSnapshot(
        docs.where(pmod(col("doc_id"), lit(4)) === 1), src,
        mode = "append")
      LakeWriter.cloneSnapshot(s, src, cln)
      LakeWriter.commitSnapshot(
        docs.where(pmod(col("doc_id"), lit(4)) === 3), cln,
        mode = "append")
      LakeWriter.deleteFromSnapshot(s, src, col("lang") === "de")
      LakeWriter.readSnapshot(s, src).withColumn("tbl", lit("source"))
        .unionByName(
          LakeWriter.readSnapshot(s, cln).withColumn("tbl", lit("clone")))
        .groupBy(col("tbl"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),

    "q_snapshot_export" -> ((s, d) => {
      // OPEN-FORMAT EXPORT bridge through the gate: a snapshot with
      // real history (append + DELETE) exports as plain
      // hive-partitioned parquet + a manifest TABLE, and the DuckDB
      // oracle reads the EXPORTED FILES DIRECTLY (read_parquet over
      // the open layout, zero graft code) while the Spark side
      // serves readSnapshot — match proves an external engine sees
      // exactly the snapshot, the reference's "Trino reads the lake"
      // property without Iceberg jars.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_export_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/src"
      import graft.sources.LakeWriter
      val base = T(s, d, "documents").select(col("doc_id"), col("lang"),
        col("source"), col("n_chars"))
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 0), table)
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 1), table,
        mode = "append")
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 150)
      LakeWriter.exportSnapshot(s, table, s"$tmp/export",
        partitionBy = Seq("lang"))
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_export_delta" -> ((s, d) => {
      // DELTA-FORMAT LIVE MIRROR through the gate (the r11 verdict's
      // #1 gap: an open-table-format the outside world reads with NO
      // export step): a lang-partitioned snapshot with real history —
      // partitioned base, a dynamic overwrite of ONE partition, a
      // copy-on-write DELETE — gets a `_delta_log` mirrored INSIDE
      // the table dir (zero data copied; sources/DeltaMirror), and
      // the DuckDB oracle RESOLVES THAT LOG ITSELF: read_json_auto
      // over the commits, adds minus removes, then reads exactly the
      // live parquet files. Match proves an external engine
      // resolving the Delta protocol sees exactly readSnapshot —
      // the resolution is load-bearing (a naive glob of all data
      // files reads ~2x the rows: retired overwrite/delete files are
      // still on disk, only the log excludes them).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_mirror_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      LakeWriter.commitSnapshotDynamic(
        base.where(pmod(col("doc_id"), lit(2)) === 0), table, Seq("lang"))
      // dynamic overwrite of the 'en' partition only: its v1 files
      // leave the live set (remove actions in the mirrored log)
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "en"), table, Seq("lang"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 150)
      DeltaMirror.mirror(s, table)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_export_delta_cp" -> ((s, d) => {
      // CHECKPOINTED DELTA MIRROR through the gate (the r12 verdict's
      // #1 missing piece: a per-micro-batch streaming sink commits
      // one Delta version per batch, so a month-old mirror is tens of
      // thousands of JSON commits unless the protocol's own answer —
      // a classic parquet checkpoint + `_last_checkpoint` — bounds
      // the replay). History: a partitioned base + three COW DELETEs
      // mirror and CHECKPOINT (cadence 3 → classic checkpoint at the
      // tip), the covered JSON commits are then CLEANED UP (standard
      // log retention), and two more versions ride as the JSON tail.
      // The DuckDB oracle resolves the log exactly as the protocol
      // prescribes for a checkpointed table: _last_checkpoint →
      // read_parquet(checkpoint) as the reconciled base + only the
      // JSON tail past it — with the pre-checkpoint JSONs GONE, the
      // checkpoint's completeness (flattened live adds with
      // partitionValues) is load-bearing, not claimed.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_cp_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 120)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 140)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 160)
      DeltaMirror.mirror(s, table, checkpointEvery = 3)
      // retention through the API that owns the invariant: every JSON
      // commit the checkpoint covers deletes (retain=1 keeps only the
      // tip time-travelable); a boundary bug would leave the oracle's
      // replay either over- or under-fed
      DeltaMirror.cleanupLog(s, table, retainVersions = 1)
      // post-checkpoint history = the JSON tail a reader replays
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "en").where(col("n_chars") >= 160),
        table, Seq("lang"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 180)
      DeltaMirror.mirror(s, table, checkpointEvery = 3)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_export_delta_abs" -> ((s, d) => {
      // ABSOLUTE-PATH ADDS through the gate (r12 verdict #7): a
      // foreign parquet directory is ADOPTED metadata-only
      // (convertToSnapshot — files stay outside the table root), a
      // COW DELETE rewrites survivors INTO the table dir, and the
      // mirror emits the mixed file set: absolute-URI adds for the
      // untouched adopted files (the protocol allows absolute
      // add.path), relative adds for the rewritten ones, removes
      // tracking each by the exact name it was added under. The
      // DuckDB oracle resolves the log and reads THROUGH both path
      // forms — a mirror that mangled either form (or a compaction
      // rewrite sneaking in) fails the row hash.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_abs_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(5)) === 2)
        .write.parquet(s"$tmp/external")
      LakeWriter.convertToSnapshot(s, s"$tmp/external", table)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 140)
      DeltaMirror.mirror(s, table)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_export_delta_cdc" -> ((s, d) => {
      // CHANGE-DATA-FEED EXPORT through the gate (the r14 verdict's
      // #1: foreign incremental consumers must pay for the DELTA,
      // never the table): a base load, a MERGE (updates + inserts), a
      // COW DELETE and a RESTORE mirror with changeDataFeed=true —
      // the mixed commits get their NET row changes written as
      // `_change_data/` parquet referenced by spec `cdc` actions. The
      // Spark side returns the TRUE per-version feed from graft's own
      // manifests (changeFeedBetween — the canonical derivation with
      // update-image pairing for the keyed MERGE, never reading the
      // cdc files); the
      // DuckDB oracle resolves the feed exactly as a conforming CDF
      // reader would — cdc actions authoritative where present,
      // insert/delete synthesis from dataChange add/removes elsewhere
      // — so a wrong cdc payload, a missed commit, or a bad synthesis
      // flag fails the row hash.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_cdc_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      val v1 = LakeWriter.commitSnapshot(base, table)
      val updates = base.where(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + lit(1000L))
        .unionByName(docs.where(pmod(col("doc_id"), lit(30)) === 1))
      val v2 = LakeWriter.mergeSnapshot(updates, table, Seq("doc_id"))
      val v3 = LakeWriter.deleteFromSnapshot(s, table,
        col("n_chars") < 150)
      val v4 = LakeWriter.restoreSnapshot(s, table, v2)
      DeltaMirror.mirror(s, table, changeDataFeed = true)
      val gvs = Seq(v1, v2, v3, v4)
      gvs.zipWithIndex.map { case (gv, i) =>
        val f =
          if (i == 0) LakeWriter.readSnapshot(s, table, Some(gv))
            .withColumn("_change_type", lit("insert"))
          else LakeWriter.changeFeedBetween(s, table, gvs(i - 1), gv)
        f.withColumn("_commit_version", lit(i.toLong))
      }.reduce(_ unionByName _)
    }),

    "q_ingest_delta_cdf" -> ((s, d) => {
      // CDF READER through the gate: the same merge/delete/restore
      // history mirrors with changeDataFeed=true, and the SERVED rows
      // come through readChangeFeed's protocol resolution (cdc
      // actions authoritative, add/remove synthesis elsewhere,
      // partition-value attach). The DuckDB oracle resolves the log
      // independently — graft's CDF consumer and DuckDB must agree
      // action for action (q_snapshot_export_delta_cdc proves a
      // foreign reader resolves graft's feed; this proves graft
      // resolves it as a consumer, the q_ingest_delta_cp pattern).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_cdf_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(4)) === 2)
      LakeWriter.commitSnapshot(base, table)
      LakeWriter.mergeSnapshot(
        base.where(col("lang") === "zh")
          .withColumn("n_chars", col("n_chars") + lit(500L))
          .unionByName(docs.where(pmod(col("doc_id"), lit(40)) === 3)),
        table, Seq("doc_id"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 140)
      // append-only tail: exercises the reader's insert SYNTHESIS on
      // a fresh commit (no cdc actions to lean on)
      LakeWriter.commitSnapshot(
        docs.where(pmod(col("doc_id"), lit(40)) === 7), table, "append")
      DeltaMirror.mirror(s, table, changeDataFeed = true)
      // _commit_timestamp is the mirror's wall clock — real but not
      // oracle-derivable; the gate compares the deterministic columns
      DeltaMirror.readChangeFeed(s, table, 0).drop("_commit_timestamp")
    }),

    "q_stream_cdf" -> ((s, d) => {
      // STREAMING CDF source (the r15 verdict's #2): the CDF-enabled
      // `_delta_log` consumed as a Structured-Streaming file source
      // (AvailableNow; commit JSONs appear atomically under durable
      // names, drained oldest-first), each pending version's changes
      // resolved through readChangeFeed and appended to a result
      // snapshot with the source version stamped as an application
      // txn ATOMICALLY with the rows. The gate then re-runs the
      // stream on a FRESH checkpoint — the worst-case replay (cursor
      // lost) — and every version must skip on its stamp: the
      // accumulated feed equals the batch feed exactly once. Oracle =
      // DuckDB resolving the same log as a conforming CDF reader
      // (q_ingest_delta_cdf's resolution — finite stream == batch).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_stream_cdf_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"; val out = s"$tmp/out"
      import graft.sources.{DeltaMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(4)) === 0)
      LakeWriter.commitSnapshot(base, table)
      LakeWriter.mergeSnapshot(
        base.where(col("lang") === "de")
          .withColumn("n_chars", col("n_chars") + lit(700L))
          .unionByName(docs.where(pmod(col("doc_id"), lit(40)) === 9)),
        table, Seq("doc_id"))
      DeltaMirror.mirror(s, table, changeDataFeed = true)
      // first drain absorbs deltas 0..1
      DeltaMirror.streamChangeFeedInto(s, table, out, s"$tmp/ckpt1")
      // two MORE commits land; the live checkpoint drains just them
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 135)
      LakeWriter.commitSnapshot(
        docs.where(pmod(col("doc_id"), lit(40)) === 11), table,
        "append")
      DeltaMirror.mirror(s, table, changeDataFeed = true)
      DeltaMirror.streamChangeFeedInto(s, table, out, s"$tmp/ckpt1")
      // fresh-checkpoint replay: all four versions re-offer, all
      // skip on their stamps — double rows would fail the row hash
      DeltaMirror.streamChangeFeedInto(s, table, out, s"$tmp/ckpt2")
      LakeWriter.readSnapshot(s, out)
    }),

    "q_snapshot_export_delta_mor" -> ((s, d) => {
      // MERGE-ON-READ DELETE (the r15 verdict's #4): two point-ish
      // deletes commit DELETION VECTORS against the standing files
      // (inline Z85 roaring bitmaps in the manifest — bytes, where
      // COW rewrites whole files; at 100 TB that is the difference
      // between a metadata commit and a day of IO), the second
      // UNIONING into the first's bitmaps on shared files. The Delta
      // mirror exports them as spec `deletionVector` descriptors with
      // (path, dvUniqueId) re-add/remove pairing, and the SERVED rows
      // come back through readDelta's DV resolution — the full
      // write->export->read round trip. The in-body requires prove
      // the MOR path actually ran (a silent COW fallback would pass
      // the oracle without testing DVs).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_mor_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(4)) === 3)
      LakeWriter.commitSnapshot(base.repartition(4), table)
      val v2 = LakeWriter.deleteFromSnapshotMor(s, table,
        col("n_chars") < 130, maxDeleteFraction = 0.9)
      val v3 = LakeWriter.deleteFromSnapshotMor(s, table,
        col("lang") === "zh", maxDeleteFraction = 0.9)
      require(LakeWriter.parseManifestDvs(s, table, v2).nonEmpty &&
        LakeWriter.parseManifestDvs(s, table, v3).nonEmpty,
        "q_snapshot_export_delta_mor: the MOR path did not commit DVs")
      require(LakeWriter.snapshotFiles(s, table, v3).toSet ==
        LakeWriter.snapshotFiles(s, table, 1L).toSet,
        "q_snapshot_export_delta_mor: a MOR delete rewrote files")
      DeltaMirror.mirror(s, table)
      DeltaMirror.readDelta(s, table)
    }),

    "q_snapshot_export_delta_mor_merge" -> ((s, d) => {
      // MERGE-ON-READ MERGE (the r16 verdict's #2): an upsert where
      // the matched old rows retire via DELETION VECTORS and the
      // update rows (replacements AND new keys) land as ordinary
      // appends — ONE commit, ZERO data-file rewrites. This is the
      // reference's daily (country, datadate) upsert cadence
      // (utils/init_spark.py write_iceberg_dynamic_partition) at the
      // write shape a 100 TB table needs: a COW merge re-lands every
      // unmatched row of every matched file, where this commits
      // bitmap bytes plus the update rows themselves. The in-body
      // requires prove MOR actually ran (DVs committed, every v1
      // file carried verbatim, the change feed pairs retired rows
      // with replacements exactly), and the rows are SERVED through
      // the Delta mirror's DV export -> readDelta resolution.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_mor_merge_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(4)) === 3)
      LakeWriter.commitSnapshot(base.repartition(4), table)
      val updates = docs
        .where((pmod(col("doc_id"), lit(4)) === 3 &&
          col("n_chars") < 140) || pmod(col("doc_id"), lit(40)) === 0)
        .withColumn("source", concat(lit("u_"), col("source")))
      val v2 = LakeWriter.mergeSnapshotMor(updates, table,
        Seq("doc_id"), maxDeleteFraction = 0.9)
      require(LakeWriter.parseManifestDvs(s, table, v2).nonEmpty,
        "q_snapshot_export_delta_mor_merge: the MOR path committed " +
          "no DVs (silent COW fallback)")
      require(LakeWriter.snapshotFiles(s, table, 1L).toSet.subsetOf(
        LakeWriter.snapshotFiles(s, table, v2).toSet),
        "q_snapshot_export_delta_mor_merge: the MOR merge rewrote " +
          "or dropped standing files")
      // the change feed derives row-level deltas from the DV diff +
      // appended files: deletes == the matched pre-images, inserts
      // == the update rows, nothing else
      val feed = LakeWriter.changesBetween(s, table, 1L, v2)
      val nDel = feed.where(col("_change_type") === "delete").count()
      val nIns = feed.where(col("_change_type") === "insert").count()
      val nMatched = base.where(col("n_chars") < 140).count()
      require(nDel == nMatched && nIns == updates.count(),
        s"q_snapshot_export_delta_mor_merge: change feed " +
          s"($nDel deletes, $nIns inserts) does not pair the " +
          s"DV-retired rows with their replacements")
      DeltaMirror.mirror(s, table)
      DeltaMirror.readDelta(s, table)
    }),

    "q_snapshot_update_mor" -> ((s, d) => {
      // MERGE-ON-READ UPDATE (completing the DML triad: DELETE and
      // MERGE have had MOR forms since r16/r17): a broad-but-sparse
      // SET ... WHERE — the "fix a mis-parsed field across every
      // partition" shape — retires the matched rows via DELETION
      // VECTORS and appends their TRANSFORMED images in ONE commit,
      // zero data-file rewrites; set right-hand sides see the
      // PRE-update row. The in-body requires prove MOR ran (DVs
      // committed, every standing file carried verbatim) — a silent
      // COW fallback would pass the oracle without testing DVs.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_update_mor_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.LakeWriter
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(4)) === 1)
      LakeWriter.commitSnapshot(base.repartition(4), table)
      val v2 = LakeWriter.updateSnapshotMor(s, table,
        col("n_chars") < 140,
        Map("lang" -> lit("xx"),
          "n_chars" -> (col("n_chars") + lit(1000))),
        maxDeleteFraction = 0.9)
      require(LakeWriter.parseManifestDvs(s, table, v2).nonEmpty,
        "q_snapshot_update_mor: the MOR path committed no DVs " +
          "(silent COW fallback)")
      require(LakeWriter.snapshotFiles(s, table, 1L).toSet.subsetOf(
        LakeWriter.snapshotFiles(s, table, v2).toSet),
        "q_snapshot_update_mor: the MOR update rewrote or dropped " +
          "standing files")
      LakeWriter.readSnapshot(s, table)
    }),

    "q_ingest_delta_cp" -> ((s, d) => {
      // GRAFT'S OWN CHECKPOINT READER through the gate: the mirror
      // checkpoints, the covered JSON commits are cleaned up, one
      // more version rides as the tail — and the SERVED ROWS come
      // THROUGH readDelta's checkpoint-base + JSON-tail resolution.
      // The oracle re-derives the final state from the raw documents
      // table, so a checkpoint that dropped a live file, resurrected
      // a tombstone, or lost the governing metaData surfaces as a
      // row/hash mismatch (q_snapshot_export_delta_cp proves a
      // FOREIGN reader resolves the checkpoint; this proves graft's).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_ingest_cp_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(4)) === 1)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 130)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 150)
      DeltaMirror.mirror(s, table, checkpointEvery = 2)
      DeltaMirror.cleanupLog(s, table, retainVersions = 1)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 170)
      DeltaMirror.mirror(s, table, checkpointEvery = 2)
      DeltaMirror.readDelta(s, table)
    }),

    "q_ingest_delta_dv" -> ((s, d) => {
      // FOREIGN DELETION-VECTOR table through the gate: a hand-built
      // `_delta_log` (protocol 3/7, readerFeatures=[deletionVectors])
      // over three parquet files — one carrying an on-disk
      // storageType=u DV, one an inline (z85) DV, one plain — plus a
      // second commit that rewrites the u-file's DV pairing with the
      // add listed BEFORE the bare remove, exercising the spec's
      // (path, dvUniqueId) reconciliation. The SERVED ROWS come
      // through readDelta's DV resolution (CRC-verified roaring
      // bitmaps filtered by _metadata.row_index); the oracle
      // re-derives the survivor set from the raw documents table by
      // row rank, so a mis-parsed bitmap, an off-by-one row index or
      // a dropped pairing surfaces as missing/extra rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_ingest_dv_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val dir = tmp.toString
      import graft.sources.{DeletionVectors, DeltaMirror}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      // one sorted single-part file per slice: row_index == rank by
      // doc_id, which is what the oracle reproduces
      def slice(m: Int, sub: String): (String, Long) = {
        base.where(pmod(col("doc_id"), lit(4)) === m)
          .repartition(1).sortWithinPartitions("doc_id")
          .write.parquet(s"$dir/$sub")
        val part = new java.io.File(s"$dir/$sub").listFiles()
          .map(_.getName).find(_.endsWith(".parquet")).get
        (s"$sub/$part",
          s.read.parquet(s"$dir/$sub").count())
      }
      val (relA, nA) = slice(2, "fa")
      val (relB, nB) = slice(3, "fb")
      val (relC, _) = slice(1, "fc")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), s.sessionState.newHadoopConf())
      // on-disk DV for fa (every 7th row), inline DV for fb (every 5th)
      val delA = (0L until nA by 7).toArray
      val bmA = DeletionVectors.serialize(delA, runOptimize = true)
      val uuid = java.util.UUID.nameUUIDFromBytes(
        s"graft:dv:$d".getBytes("UTF-8"))
      val offA = DeletionVectors.writeDvFile(fs,
        new org.apache.hadoop.fs.Path(dir, s"deletion_vector_$uuid.bin"),
        Seq(bmA)).head
      val dvA = s"""{"storageType":"u","pathOrInlineDv":"${
        DeletionVectors.encodeUuid(uuid)}","offset":$offA,"sizeInBytes":${
        bmA.length},"cardinality":${delA.length}}"""
      val delB = (0L until nB by 5).toArray
      val bmB = DeletionVectors.serialize(delB)
      val padB = java.util.Arrays.copyOf(bmB,
        bmB.length + (4 - bmB.length % 4) % 4)
      val dvB = s"""{"storageType":"i","pathOrInlineDv":"${
        DeletionVectors.z85Encode(padB)}","sizeInBytes":${
        bmB.length},"cardinality":${delB.length}}"""
      val schemaJson = base.schema.json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      def add(rel: String, dv: Option[String]) =
        s"""{"add":{"path":"$rel","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true${
          dv.map(x => s""","deletionVector":$x""").getOrElse("")}}}"""
      new java.io.File(s"$dir/_delta_log").mkdirs()
      def commit(v: Int, lines: Seq[String]): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"$dir/_delta_log/$v%020d.json"),
          lines.mkString("", "\n", "\n").getBytes("UTF-8")): Unit
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
        s"""{"metaData":{"id":"dvgate","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
        add(relA, None), add(relB, Some(dvB)), add(relC, None)))
      commit(1, Seq(add(relA, Some(dvA)),
        s"""{"remove":{"path":"$relA","dataChange":true}}"""))
      DeltaMirror.readDelta(s, dir)
    }),

    "q_snapshot_export_iceberg" -> ((s, d) => {
      // ICEBERG EXPORT through the gate (the reference's OWN lake
      // format — its Spark jobs write iceberg-provider tables through
      // a Hadoop catalog): the snapshot table evolves (partitioned
      // base + dynamic partition overwrite + COW DELETE + metadata-
      // only RENAME), IcebergMirror writes the v2 metadata tree
      // (metadata JSON + manifest-list/manifest avro with the spec's
      // pinned field-ids, zero data copies), and the SERVED ROWS come
      // back THROUGH readIceberg — the round trip proves manifest
      // reconciliation (status-2 tombstones from the overwrite and
      // the delete), identity-partition projection (graft files do
      // not materialize the partition column) and the name-mapping
      // rename (field id stable, files keep the physical name). The
      // oracle re-derives the final state from the raw documents
      // table, so a stale tombstone, a dropped manifest or a
      // misresolved partition value surfaces as row/hash mismatch.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_export_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{IcebergMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(3)) === 1)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "en"), table, Seq("lang"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 150)
      LakeWriter.renameColumn(s, table, "n_chars", "chars")
      IcebergMirror.mirror(s, table)
      IcebergMirror.readIceberg(s, table)
    }),

    "q_ingest_iceberg_prune" -> ((s, d) => {
      // ICEBERG STAT-PRUNED READ through the gate: the partitioned
      // mirror is read with readIcebergWhere — identity-partition
      // values and the manifests' typed lower/upper bounds prune
      // whole files before any scan (the 100 TB posture: a predicate
      // on a foreign Iceberg table must not scan the lake), and the
      // predicate re-applies to surviving rows so the result is
      // EXACT whatever the bounds coverage. The oracle filters the
      // raw documents table — an unsound skip (a file wrongly pruned)
      // surfaces as missing rows, a broken bounds decode as extras.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_prune_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{IcebergMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(3)) === 2)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      IcebergMirror.mirror(s, table)
      IcebergMirror.readIcebergWhere(s, table,
        col("lang") === "en" && col("n_chars") >= 150)
    }),

    "q_ingest_iceberg" -> ((s, d) => {
      // FOREIGN ICEBERG table through the gate: a hand-built v2
      // metadata tree — avro manifests written RAW here (independent
      // of IcebergMirror's builders, the DV-gate discipline) over
      // three parquet slices, with an identity int partition column
      // the data files do NOT materialize, a second snapshot that
      // REWRITES the first manifest (fa carried EXISTING, fc
      // tombstoned status=2) and adds fb. The SERVED ROWS come
      // through readIceberg's resolution — live-entry filtering,
      // sequence-number-aware carries and the spec's column-
      // projection rule supplying `bucket` from partition metadata.
      // The oracle re-derives the survivor set from the raw documents
      // table, so a served tombstone, a dropped carry or a misread
      // partition struct surfaces as missing/extra rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_ingest_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val dir = tmp.toString
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      def slice(m: Int, sub: String): (String, Long) = {
        base.where(pmod(col("doc_id"), lit(4)) === m)
          .coalesce(1).write.parquet(s"$dir/data/$sub")
        val f = new java.io.File(s"$dir/data/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        (f.getAbsolutePath, s.read.parquet(s"$dir/data/$sub").count())
      }
      val (fa, nA) = slice(2, "fa")
      val (fc, nC) = slice(1, "fc")
      val (fb, nB) = slice(3, "fb")
      import IceGateFixture.{manifestEntry, entrySchema, listRec, writeAvro}
      val entryS = entrySchema(IceGateFixture.bucketPartField)
      val m1 = s"$dir/metadata/m1.avro"
      val m1len = writeAvro(m1, entryS, Seq(
        manifestEntry(entryS, 1, 0, 101L, 1L, fa, 7, nA),
        manifestEntry(entryS, 1, 0, 101L, 1L, fc, 8, nC)))
      val m1r = s"$dir/metadata/m1r.avro"
      val m1rLen = writeAvro(m1r, entryS, Seq(
        manifestEntry(entryS, 0, 0, 101L, 1L, fa, 7, nA),
        manifestEntry(entryS, 2, 0, 202L, 1L, fc, 8, nC)))
      val m2 = s"$dir/metadata/m2.avro"
      val m2len = writeAvro(m2, entryS, Seq(
        manifestEntry(entryS, 1, 0, 202L, 2L, fb, 9, nB)))
      val ml1 = s"$dir/metadata/snap-101.avro"
      writeAvro(ml1, IceGateFixture.listSchema,
        Seq(listRec(m1, m1len, 101L, 1L)))
      val ml2 = s"$dir/metadata/snap-202.avro"
      writeAvro(ml2, IceGateFixture.listSchema,
        Seq(listRec(m1r, m1rLen, 202L, 2L),
          listRec(m2, m2len, 202L, 2L)))
      val metaJson = s"""{
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000f00d",
        "location": "$dir",
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [{"type":"struct","schema-id":0,"fields":[
          {"id":1,"name":"doc_id","required":false,"type":"long"},
          {"id":2,"name":"source","required":false,"type":"string"},
          {"id":3,"name":"n_chars","required":false,"type":"long"},
          {"id":4,"name":"bucket","required":false,"type":"int"}]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id":0,"fields":[
          {"name":"bucket","transform":"identity","source-id":4,"field-id":1000}]}],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id":0,"fields":[]}],
        "properties": {},
        "current-snapshot-id": 202,
        "snapshots": [
          {"snapshot-id":101,"sequence-number":1,"timestamp-ms":1700000001000,
           "manifest-list":"$ml1","summary":{"operation":"append"},"schema-id":0},
          {"snapshot-id":202,"parent-snapshot-id":101,"sequence-number":2,
           "timestamp-ms":1700000002000,"manifest-list":"$ml2",
           "summary":{"operation":"overwrite"},"schema-id":0}],
        "snapshot-log": [
          {"timestamp-ms":1700000001000,"snapshot-id":101},
          {"timestamp-ms":1700000002000,"snapshot-id":202}],
        "metadata-log": []
      }"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
        metaJson.getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
        "1".getBytes("UTF-8"))
      graft.sources.IcebergMirror.readIceberg(s, dir)
    }),

    "q_ingest_iceberg_posdel" -> ((s, d) => {
      // ICEBERG POSITION DELETES through the gate (merge-on-read, the
      // v2 delete-file read path — the row-level mechanism the
      // reference's Iceberg lake serves DELETEs from): a hand-built
      // foreign tree whose snapshot carries TWO data files and a
      // DELETE manifest with two position-delete parquet files — one
      // at sequence 2 deleting every 7th row of fa (applies: fa's
      // data sequence is 1), one at sequence 1 targeting fb (must NOT
      // apply: fb's data sequence is 2 — the spec's applicability
      // rule). The SERVED ROWS come through readIceberg's distributed
      // anti-join on (file, `_metadata.row_index`); the oracle
      // re-derives survivors from the raw documents table by row
      // rank, so an off-by-one row index, a mismatched file_path key
      // or an ignored sequence guard surfaces as missing/extra rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_posdel_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val dir = tmp.toString
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      def slice(m: Int, sub: String): (String, Long) = {
        base.where(pmod(col("doc_id"), lit(4)) === m)
          .repartition(1).sortWithinPartitions("doc_id")
          .write.parquet(s"$dir/data/$sub")
        val f = new java.io.File(s"$dir/data/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        (f.getAbsolutePath, s.read.parquet(s"$dir/data/$sub").count())
      }
      val (fa, nA) = slice(2, "fa")
      val (fb, nB) = slice(3, "fb")
      import s.implicits._
      def delFile(sub: String, target: String,
          poss: Seq[Long]): String = {
        poss.map(p => (target, p)).toDF("file_path", "pos")
          .coalesce(1).write.parquet(s"$dir/data/$sub")
        new java.io.File(s"$dir/data/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
      }
      val da = delFile("da", fa, (0L until nA by 7).toSeq)
      val db = delFile("db", fb, (0L until nB by 5).toSeq)
      import IceGateFixture.{manifestEntry, entrySchema, listRec, writeAvro}
      val entryS = entrySchema("")
      val m1 = s"$dir/metadata/m1.avro"
      val m1len = writeAvro(m1, entryS,
        Seq(manifestEntry(entryS, 1, 0, 101L, 1L, fa, null, nA)))
      val m2 = s"$dir/metadata/m2.avro"
      val m2len = writeAvro(m2, entryS,
        Seq(manifestEntry(entryS, 1, 0, 202L, 2L, fb, null, nB)))
      val md0 = s"$dir/metadata/md.avro"
      val mdLen = writeAvro(md0, entryS, Seq(
        manifestEntry(entryS, 1, 1, 202L, 2L, da, null, 1L),
        manifestEntry(entryS, 1, 1, 202L, 1L, db, null, 1L)))
      val ml = s"$dir/metadata/snap-301.avro"
      writeAvro(ml, IceGateFixture.listSchema, Seq(
        listRec(m1, m1len, 101L, 1L),
        listRec(m2, m2len, 202L, 2L),
        listRec(md0, mdLen, 202L, 2L, content = 1)))
      val schemaFields =
        """{"id":1,"name":"doc_id","required":false,"type":"long"},
          {"id":2,"name":"source","required":false,"type":"string"},
          {"id":3,"name":"n_chars","required":false,"type":"long"}"""
      val metaJson = s"""{
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000d00d",
        "location": "$dir",
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [{"type":"struct","schema-id":0,"fields":[$schemaFields]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id":0,"fields":[]}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id":0,"fields":[]}],
        "properties": {},
        "current-snapshot-id": 301,
        "snapshots": [
          {"snapshot-id":301,"sequence-number":2,"timestamp-ms":1700000002000,
           "manifest-list":"$ml","summary":{"operation":"overwrite"},"schema-id":0}],
        "snapshot-log": [
          {"timestamp-ms":1700000002000,"snapshot-id":301}],
        "metadata-log": []
      }"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
        metaJson.getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
        "1".getBytes("UTF-8"))
      graft.sources.IcebergMirror.readIceberg(s, dir)
    }),

    "q_ingest_iceberg_eqdel" -> ((s, d) => {
      // ICEBERG EQUALITY DELETES through the gate (merge-on-read,
      // Flink-CDC-style: each delete row is a value predicate on the
      // file's equality_ids columns): a hand-built foreign tree with
      // TWO partitioned data files and three equality-delete files —
      // a GLOBAL one (unpartitioned spec) at sequence 2 deleting
      // doc_id ≡ 6 (mod 12) from fa (applies: fa's data sequence is
      // 1), a bucket-7-SCOPED one listing values that only exist in
      // bucket 9 (must not apply: partition scope), and a global one
      // at sequence 2 targeting fb (must not apply: the spec's STRICT
      // ordering — fb's data sequence is 2, not < 2). Served rows come
      // through readIceberg's distributed null-safe anti-join; the
      // oracle re-derives survivors from raw documents, so an ignored
      // scope, a non-strict sequence compare or a mis-keyed equality
      // column surfaces as missing/extra rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_eqdel_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val dir = tmp.toString
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      def slice(m: Int, sub: String): (String, Long) = {
        base.where(pmod(col("doc_id"), lit(4)) === m)
          .coalesce(1).write.parquet(s"$dir/data/$sub")
        val f = new java.io.File(s"$dir/data/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        (f.getAbsolutePath, s.read.parquet(s"$dir/data/$sub").count())
      }
      val (fa, nA) = slice(2, "fa")
      val (fb, nB) = slice(3, "fb")
      def eqFile(sub: String, mod: Int, rem: Int): String = {
        base.where(pmod(col("doc_id"), lit(mod)) === rem)
          .select(col("doc_id"))
          .coalesce(1).write.parquet(s"$dir/data/$sub")
        new java.io.File(s"$dir/data/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
      }
      val e1 = eqFile("e1", 12, 6)  // in fa's domain -> applies
      val e2 = eqFile("e2", 4, 3)   // fb's domain, scoped bucket 7 -> no
      val e3 = eqFile("e3", 12, 11) // in fb, strict seq -> no
      import IceGateFixture.{manifestEntry, entrySchema, listRec, writeAvro}
      val entryS = entrySchema(IceGateFixture.bucketPartField)
      val entryGS = entrySchema("")
      val m1 = s"$dir/metadata/m1.avro"
      val m1len = writeAvro(m1, entryS, Seq(
        manifestEntry(entryS, 1, 0, 101L, 1L, fa, 7, nA),
        manifestEntry(entryS, 1, 0, 202L, 2L, fb, 9, nB)))
      val mg = s"$dir/metadata/mg.avro"
      val mgLen = writeAvro(mg, entryGS, Seq(
        manifestEntry(entryGS, 1, 2, 202L, 2L, e1, null, 1L, Seq(1)),
        manifestEntry(entryGS, 1, 2, 202L, 2L, e3, null, 1L, Seq(1))))
      val ms = s"$dir/metadata/ms.avro"
      val msLen = writeAvro(ms, entryS, Seq(
        manifestEntry(entryS, 1, 2, 202L, 2L, e2, 7, 1L, Seq(1))))
      val ml = s"$dir/metadata/snap-401.avro"
      writeAvro(ml, IceGateFixture.listSchema, Seq(
        listRec(m1, m1len, 101L, 1L),
        listRec(mg, mgLen, 202L, 2L, content = 1, specId = 1),
        listRec(ms, msLen, 202L, 2L, content = 1)))
      val metaJson = s"""{
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000bead",
        "location": "$dir",
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [{"type":"struct","schema-id":0,"fields":[
          {"id":1,"name":"doc_id","required":false,"type":"long"},
          {"id":2,"name":"source","required":false,"type":"string"},
          {"id":3,"name":"n_chars","required":false,"type":"long"},
          {"id":4,"name":"bucket","required":false,"type":"int"}]}],
        "default-spec-id": 0,
        "partition-specs": [
          {"spec-id":0,"fields":[
            {"name":"bucket","transform":"identity","source-id":4,"field-id":1000}]},
          {"spec-id":1,"fields":[]}],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id":0,"fields":[]}],
        "properties": {},
        "current-snapshot-id": 401,
        "snapshots": [
          {"snapshot-id":401,"sequence-number":2,"timestamp-ms":1700000002000,
           "manifest-list":"$ml","summary":{"operation":"overwrite"},"schema-id":0}],
        "snapshot-log": [
          {"timestamp-ms":1700000002000,"snapshot-id":401}],
        "metadata-log": []
      }"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
        metaJson.getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
        "1".getBytes("UTF-8"))
      graft.sources.IcebergMirror.readIceberg(s, dir)
    }),

    "q_ingest_iceberg_v3dv" -> ((s, d) => {
      // ICEBERG FORMAT-V3 DELETION VECTORS through the gate (the r14
      // verdict's #3: v3 is finalized and foreign trees will carry
      // puffin-stored DVs): a hand-built v3 tree with TWO data files
      // and TWO puffin deletion vectors — one at sequence 2 deleting
      // every 6th row of fa (applies: fa's data sequence is 1), one
      // at sequence 1 targeting fb (must NOT apply: fb's data
      // sequence is 2). The blob framing is the spec's (BE length,
      // magic-led portable roaring64, BE CRC-32) and parses through
      // the SAME jar-free DeletionVectors kernel as Delta DVs; rows
      // filter by `_metadata.row_index` via the cached-parse
      // DvContains native expression. Oracle: survivors re-derived
      // from the raw documents table by row rank. v3 row lineage and
      // initial-defaults keep refusing loudly (spec-covered).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_v3dv_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val dir = tmp.toString
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      def slice(m: Int, sub: String): (String, Long) = {
        base.where(pmod(col("doc_id"), lit(4)) === m)
          .repartition(1).sortWithinPartitions("doc_id")
          .write.parquet(s"$dir/data/$sub")
        val f = new java.io.File(s"$dir/data/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        (f.getAbsolutePath, s.read.parquet(s"$dir/data/$sub").count())
      }
      val (fa, nA) = slice(2, "fa")
      val (fb, nB) = slice(3, "fb")
      import IceGateFixture.{manifestEntry, entrySchema, listRec,
        writeAvro, writePuffinDv, dvEntry}
      val posA = (0L until nA by 6).toArray
      val posB = (0L until nB by 4).toArray
      val (offA, szA) = writePuffinDv(s"$dir/data/dva.puffin", posA,
        fa, 202L, 2L)
      val (offB, szB) = writePuffinDv(s"$dir/data/dvb.puffin", posB,
        fb, 202L, 1L)
      val entryS = entrySchema("", v3Dv = true)
      val m1 = s"$dir/metadata/m1.avro"
      val m1len = writeAvro(m1, entryS,
        Seq(manifestEntry(entryS, 1, 0, 101L, 1L, fa, null, nA)))
      val m2 = s"$dir/metadata/m2.avro"
      val m2len = writeAvro(m2, entryS,
        Seq(manifestEntry(entryS, 1, 0, 202L, 2L, fb, null, nB)))
      val md0 = s"$dir/metadata/md.avro"
      val mdLen = writeAvro(md0, entryS, Seq(
        dvEntry(entryS, 202L, 2L, s"$dir/data/dva.puffin", fa,
          offA, szA, posA.length.toLong),
        dvEntry(entryS, 202L, 1L, s"$dir/data/dvb.puffin", fb,
          offB, szB, posB.length.toLong)))
      val ml = s"$dir/metadata/snap-301.avro"
      writeAvro(ml, IceGateFixture.listSchema, Seq(
        listRec(m1, m1len, 101L, 1L),
        listRec(m2, m2len, 202L, 2L),
        listRec(md0, mdLen, 202L, 2L, content = 1)))
      val schemaFields =
        """{"id":1,"name":"doc_id","required":false,"type":"long"},
          {"id":2,"name":"source","required":false,"type":"string"},
          {"id":3,"name":"n_chars","required":false,"type":"long"}"""
      val metaJson = s"""{
        "format-version": 3,
        "table-uuid": "00000000-0000-0000-0000-000000d0d030",
        "location": "$dir",
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [{"type":"struct","schema-id":0,"fields":[$schemaFields]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id":0,"fields":[]}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id":0,"fields":[]}],
        "properties": {},
        "current-snapshot-id": 301,
        "snapshots": [
          {"snapshot-id":301,"sequence-number":2,"timestamp-ms":1700000002000,
           "manifest-list":"$ml","summary":{"operation":"overwrite"},"schema-id":0}],
        "snapshot-log": [
          {"timestamp-ms":1700000002000,"snapshot-id":301}],
        "metadata-log": []
      }"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
        metaJson.getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
        "1".getBytes("UTF-8"))
      graft.sources.IcebergMirror.readIceberg(s, dir)
    }),

    "q_snapshot_export_iceberg_mor" -> ((s, d) => {
      // v3 DELETION-VECTOR WRITE (the export direction of
      // q_ingest_iceberg_v3dv, closing the r15 asymmetry where MOR
      // snapshots exported to Delta but the Iceberg mirror refused):
      // two MOR deletes commit inline DV bitmaps; the mirror exports
      // them as PUFFIN blobs + DELETE manifests, upgrading the
      // already-mirrored v2 tree to format v3 in place (the second
      // delete REPLACES the first's entries on shared files — the
      // spec's at-most-one-DV-per-file rule, add + tombstone); and
      // the served rows come back through readIceberg's v3 DV
      // resolution — the full write->export->read round trip. The
      // in-body requires prove the MOR path actually ran (file list
      // unchanged, DVs present), so a silent COW fallback cannot
      // pass the oracle.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_mor_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{IcebergMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(4)) === 1)
      LakeWriter.commitSnapshot(base.repartition(4), table)
      IcebergMirror.mirror(s, table) // v2 tree first: DVs UPGRADE it
      val v2 = LakeWriter.deleteFromSnapshotMor(s, table,
        col("n_chars") < 140, maxDeleteFraction = 0.9)
      val v3 = LakeWriter.deleteFromSnapshotMor(s, table,
        col("lang") === "es", maxDeleteFraction = 0.9)
      require(LakeWriter.parseManifestDvs(s, table, v2).nonEmpty &&
        LakeWriter.parseManifestDvs(s, table, v3).nonEmpty,
        "q_snapshot_export_iceberg_mor: the MOR path did not commit DVs")
      require(LakeWriter.snapshotFiles(s, table, v3).toSet ==
        LakeWriter.snapshotFiles(s, table, 1L).toSet,
        "q_snapshot_export_iceberg_mor: a MOR delete rewrote files")
      // resume: v2 -> v3 upgrade — the EXPLICIT opt-in (this mirror
      // writes no v3 row-lineage, so the upgrade is a choice)
      IcebergMirror.mirror(s, table, allowV3 = true)
      IcebergMirror.readIceberg(s, table)
    }),

    "q_ingest_delta" -> ((s, d) => {
      // DELTA IMPORT direction through the gate: the table evolves
      // (partitioned base + partition overwrite + COW DELETE), the
      // mirror writes its _delta_log, and the SERVED ROWS are read
      // back THROUGH that log (sources/DeltaMirror.readDelta — the
      // reader any foreign JSON-commit Delta table gets): protocol
      // resolution must drop every overwritten/rewritten file, or
      // the oracle (final state re-derived from the raw documents
      // table) catches the stale rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_ingest_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(3)) === 0)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 200)
      // metadata-only RENAME rides the mirror as Delta column mapping
      // (physicalName resolution): files keep the old physical name,
      // the served schema carries the new logical one
      LakeWriter.renameColumn(s, table, "n_chars", "chars")
      DeltaMirror.mirror(s, table)
      DeltaMirror.readDelta(s, table)
    }),

    "q_ingest_delta_prune" -> ((s, d) => {
      // DELTA STAT-PRUNED READ through the gate: the partitioned
      // mirror is read with readDeltaWhere — add.partitionValues and
      // the add.stats min/max the mirror records prune whole files
      // before any scan (the import-direction twin of
      // q_snapshot_skip's graft-side pruning), and the predicate
      // re-applies to surviving rows so the result is EXACT whatever
      // the stats coverage. The oracle filters the raw documents
      // table — an unsound skip surfaces as missing rows, a broken
      // stats decode as extras.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_delta_prune_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{DeltaMirror, LakeWriter}
      val base = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(5)) === 4)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      DeltaMirror.mirror(s, table)
      DeltaMirror.readDeltaWhere(s, table,
        col("lang") === "de" && col("n_chars") >= 150)
    }),

    "q_snapshot_import" -> ((s, d) => {
      // OPEN-FORMAT IMPORT bridge (CONVERT TO DELTA twin): an
      // "external engine's" table — stock hive-partitioned parquet
      // written by a plain df.write — is ADOPTED in place as snapshot
      // v1 (metadata-only: manifest references the source files by
      // absolute path, footer-stats sweep, no data copied), then a
      // partitioned copy-on-write DELETE runs ON the adopted table —
      // rewritten survivors land under the table's own data dir while
      // untouched adopted files carry by reference. The oracle
      // re-derives the final state from the raw documents table.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_import_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      import graft.sources.LakeWriter
      T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .where(pmod(col("doc_id"), lit(3)) === 0)
        .write.partitionBy("lang").parquet(s"$tmp/external")
      LakeWriter.convertToSnapshot(s, s"$tmp/external", s"$tmp/table")
      LakeWriter.deleteFromSnapshot(s, s"$tmp/table", col("n_chars") < 150)
      LakeWriter.readSnapshot(s, s"$tmp/table")
    }),

    "q_ingest_iceberg_changes" -> ((s, d) => {
      // ICEBERG INCREMENTAL CHANGELOG through the gate (the r14
      // verdict's #6 — the second format of the CDC interop story): a
      // lang-partitioned table takes two dynamic partition overwrites
      // ('en' then 'zh'), the Iceberg mirror records each as one
      // snapshot whose manifest entries carry their snapshot id, and
      // readIcebergChanges resolves the ROW-LEVEL feed between the
      // first and last snapshots from exactly those entry statuses —
      // the same resolution a foreign engine's incremental scan runs
      // against the mirror, proving the mirror is incrementally
      // consumable with NO extra metadata. The oracle re-derives both
      // ordinals' insert/delete sets logically from raw documents, so
      // a mis-stamped snapshot id, a missed tombstone, or a wrong
      // ordinal surfaces as missing/extra rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_iceberg_changes_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.{IcebergMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "en" && col("n_chars") >= 150),
        table, Seq("lang"))
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "zh" && col("n_chars") >= 160),
        table, Seq("lang"))
      IcebergMirror.mirror(s, table)
      val snaps = IcebergMirror.icebergSnapshots(s, table).map(_._1)
      IcebergMirror.readIcebergChanges(s, table, snaps.head, snaps.last)
        .drop("_commit_snapshot_id")
    }),

    "q_stream_iceberg_changes" -> ((s, d) => {
      // STREAMING ICEBERG CHANGELOG source (the Iceberg twin of
      // q_stream_cdf, completing the verdict's 'production
      // incremental consumer' for BOTH open formats): the mirror's
      // metadata dir consumed as a Structured-Streaming file source
      // (vN.metadata.json files land atomically under durable names
      // via the tmp+rename publish; AvailableNow drains pending
      // versions oldest-first), each tip snapshot's row changes
      // resolved through readIcebergChanges and appended to a result
      // snapshot with the tip's SEQUENCE NUMBER stamped as an
      // application txn ATOMICALLY with the rows. The gate re-runs
      // the stream on a FRESH checkpoint — the worst-case replay —
      // and every version must skip on its stamp: the accumulated
      // feed equals each snapshot's changelog exactly once. Oracle =
      // all three sequences' insert/delete sets re-derived logically
      // (sequence 1 is the parentless full-insert feed).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_stream_ice_changes_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"; val out = s"$tmp/out"
      import graft.sources.{IcebergMirror, LakeWriter}
      val docs = T(s, d, "documents").select(col("doc_id"),
        col("source"), col("n_chars"), col("lang"))
      val base = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      LakeWriter.commitSnapshotDynamic(base, table, Seq("lang"))
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "en" && col("n_chars") >= 150),
        table, Seq("lang"))
      IcebergMirror.mirror(s, table)
      // first drain absorbs sequences 1..2
      IcebergMirror.streamIcebergChangesInto(s, table, out, s"$tmp/ck1")
      // one MORE commit lands; the live checkpoint drains just it
      LakeWriter.commitSnapshotDynamic(
        base.where(col("lang") === "zh" && col("n_chars") >= 160),
        table, Seq("lang"))
      IcebergMirror.mirror(s, table)
      IcebergMirror.streamIcebergChangesInto(s, table, out, s"$tmp/ck1")
      // fresh-checkpoint replay: all three metadata versions re-offer,
      // all skip on their stamps — double rows would fail the row hash
      IcebergMirror.streamIcebergChangesInto(s, table, out, s"$tmp/ck2")
      LakeWriter.readSnapshot(s, out).drop("_commit_snapshot_id")
    }),

    "q_catalog_asof" -> ((s, d) => {
      // CROSS-TABLE ATOMIC COMMIT / TAG through the gate (the r14
      // verdict's #5 — the Nessie role): fact + dim load as snapshot
      // tables, ONE catalog commit pins both versions atomically and
      // a tag names it; then BOTH tables advance (a COW DELETE on
      // fact, a rebuilt dim) and a second catalog commit pins the new
      // pair. The served rows join fact and dim AS OF THE TAG — a
      // catalog that mixed versions (new fact with old dim or vice
      // versa) fails the row hash, because the oracle re-derives the
      // CONSISTENT tagged pair from the raw documents table.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_catalog_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val fact = s"$tmp/fact"
      val dim = s"$tmp/dim"
      val cat = s"$tmp/cat"
      import graft.sources.{Catalog, LakeWriter}
      val docs = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .where(pmod(col("doc_id"), lit(2)) === 0)
      def dimOf(f: org.apache.spark.sql.DataFrame) =
        f.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("tot_chars"))
      LakeWriter.commitSnapshot(docs, fact)
      LakeWriter.commitSnapshot(dimOf(docs), dim)
      val c1 = Catalog.commit(s, cat, Map("fact" -> fact, "dim" -> dim))
      Catalog.tag(s, cat, "release", Some(c1))
      LakeWriter.deleteFromSnapshot(s, fact, col("n_chars") < 200)
      LakeWriter.commitSnapshot(
        dimOf(LakeWriter.readSnapshot(s, fact)), dim)
      Catalog.commit(s, cat, Map("fact" -> fact, "dim" -> dim))
      val at = Catalog.tagCommit(s, cat, "release")
      Catalog.readTableAt(s, cat, "fact", at)
        .join(Catalog.readTableAt(s, cat, "dim", at), "lang")
    }),

    "q_catalog_branch" -> ((s, d) => {
      // CATALOG BRANCHES through the gate (the mutable-ref half of
      // the Nessie role): fact + dim commit on MAIN, a load branch
      // forks, BOTH tables advance (a COW DELETE on fact, a rebuilt
      // dim) and commit ON THE BRANCH — main still serves the
      // pre-branch pair — then a FAST-FORWARD merge publishes the
      // branch head's pin map as main's next commit. The served rows
      // join fact and dim AS OF the merged main tip; the oracle
      // re-derives the post-advance pair from raw documents, so pins
      // lost in the branch->merge flow (or a merge that mixed branch
      // and pre-branch versions) fail the row hash.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_catalog_br_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val fact = s"$tmp/fact"
      val dim = s"$tmp/dim"
      val cat = s"$tmp/cat"
      import graft.sources.{Catalog, LakeWriter}
      val docs = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .where(pmod(col("doc_id"), lit(3)) === 1)
      def dimOf(f: org.apache.spark.sql.DataFrame) =
        f.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("tot_chars"))
      LakeWriter.commitSnapshot(docs, fact)
      LakeWriter.commitSnapshot(dimOf(docs), dim)
      Catalog.commit(s, cat, Map("fact" -> fact, "dim" -> dim))
      Catalog.branch(s, cat, "load")
      LakeWriter.deleteFromSnapshot(s, fact, col("n_chars") < 250)
      LakeWriter.commitSnapshot(
        dimOf(LakeWriter.readSnapshot(s, fact)), dim)
      Catalog.commitOnBranch(s, cat, "load",
        Map("fact" -> fact, "dim" -> dim))
      val merged = Catalog.mergeBranch(s, cat, "load")
      Catalog.readTableAt(s, cat, "fact", merged)
        .join(Catalog.readTableAt(s, cat, "dim", merged), "lang")
    }),

    "q_snapshot_evolve" -> ((s, d) => {
      // PARTITION SPEC EVOLUTION through the gate (Iceberg's
      // evolve-then-rewrite story): v1 commits UNPARTITIONED (lang as
      // a data column), v2 declares a lang-partitioned spec for new
      // data only (pre-spec files carry by reference, pruning via
      // footer stats), migratePartitionSpec rewrites the pre-spec
      // files under the current layout (v3, uniform again), and a
      // partitioned copy-on-write DELETE runs over the migrated
      // table. The oracle re-derives the final state from the raw
      // documents table — every layout transition must be invisible
      // in the rows.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_evolve_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = s"$tmp/table"
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 0), table)
      LakeWriter.commitSnapshotDynamic(
        base.where(pmod(col("doc_id"), lit(2)) === 1), table, Seq("lang"))
      LakeWriter.migratePartitionSpec(s, table)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 150)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_cdc" -> ((s, d) => {
      // the change-data-feed: v1 commits the corpus, v2 MERGEs an
      // upsert batch (every doc_id%10==0 doc re-scored, plus brand-new
      // doc_ids), and the output is the NET row-level change feed
      // between the versions — derived from the manifests' delta
      // files only, with copy-on-write rewrite noise collapsed by
      // exceptAll. What an incremental downstream consumer reads
      // instead of diffing 100 TB.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_cdc_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(base, table)
      val updates = base.where(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
        .unionByName(base.where(pmod(col("doc_id"), lit(10)) === 1)
          .withColumn("doc_id", col("doc_id") + 1000000))
      LakeWriter.mergeSnapshot(updates, table, Seq("doc_id"))
      LakeWriter.changesBetween(s, table, 1L, 2L)
    }),

    "q_snapshot_skip" -> ((s, d) => {
      // data skipping through the gate: a range-clustered commit
      // records per-file (min,max) footer stats in the manifest, and
      // the stat-pruned read serves a narrow doc_id band opening only
      // the files whose range intersects it (file-level proof in
      // PipelineSpec via corrupt-in-place; here the driver proves the
      // rows are exactly SQL's)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_skip_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      LakeWriter.commitSnapshot(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
            col("n_chars"))
          .repartitionByRange(8, col("doc_id")), table)
      LakeWriter.readSnapshotWhere(s, table,
        col("doc_id") >= 100L && col("doc_id") < 200L)
    }),

    "q_snapshot_skip_time" -> ((s, d) => {
      // the TIME-SERIES skipping pattern — the single most common
      // 100 TB layout (daily/hourly clustered loads): commit events
      // range-clustered by ts, serve a two-day band opening only the
      // files whose (min,max) micros intersect it. Timestamp stats
      // land because graft sessions write TIMESTAMP_MICROS (INT96
      // has no comparable parquet stats — see snapshot_format.md)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_skip_ts_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      LakeWriter.commitSnapshot(
        T(s, d, "events").select(col("event_id"), col("ts"),
            col("event_type"), col("value"))
          .repartitionByRange(8, col("ts")), table)
      LakeWriter.readSnapshotWhere(s, table,
        col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
    }),

    "q_snapshot_zorder" -> ((s, d) => {
      // OPTIMIZE ZORDER through the gate: a 2D box (user, value band)
      // over the Morton-clustered rewrite — every listed dimension
      // prunes at once (file-level proof in PipelineSpec; here the
      // driver proves the served rows are exactly SQL's)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_zorder_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      LakeWriter.commitSnapshot(
        T(s, d, "events").select(col("event_id"), col("user_id"),
          col("event_type"), col("value")), table)
      LakeWriter.optimizeSnapshot(s, table, targetBytes = 64L << 10,
        zorderBy = Seq("user_id", "value"))
      LakeWriter.readSnapshotWhere(s, table,
        col("user_id") >= 2L && col("user_id") <= 5L &&
        col("value") >= 10.0 && col("value") <= 50.0)
    }),

    "q_snapshot_restore" -> ((s, d) => {
      // RESTORE through the gate: append + DELETE, then roll back to
      // v1 as a NEW commit — the served table must be byte-identical
      // to the original state (history stays time-travelable; the
      // change feed across the restore is the rollback, spec-proven)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_restore_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(base, table)
      LakeWriter.commitSnapshot(
        base.withColumn("doc_id", col("doc_id") + 1000000L),
        table, mode = "append")
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 200)
      LakeWriter.restoreSnapshot(s, table, 1L)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_constraint" -> ((s, d) => {
      // CHECK constraints through the gate (Delta ADD CONSTRAINT):
      // add a check the corpus satisfies, take a conforming append,
      // REJECT a violating batch atomically (version + data
      // untouched, in-flight dir cleaned), serve the table
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_check_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(2)) === 0),
        table)
      LakeWriter.addCheck(s, table, "chars_nonneg", "n_chars >= 0")
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(2)) === 1),
        table, mode = "append")
      try {
        LakeWriter.commitSnapshot(
          base.limit(10).withColumn("n_chars", lit(-1L)),
          table, mode = "append")
        sys.error("violating batch must be rejected")
      } catch { case _: IllegalArgumentException => () }
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_optimize" -> ((s, d) => {
      // OPTIMIZE proven through the gate: three small appends then a
      // bin-packing compaction — the post-optimize snapshot must be
      // row-identical to the union (the oracle is the raw table),
      // with fewer files doing the serving
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_opt_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(3)) === 0),
        table)
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(3)) === 1),
        table, mode = "append")
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(3)) === 2),
        table, mode = "append")
      LakeWriter.optimizeSnapshot(s, table)
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_widen" -> ((s, d) => {
      // lossless type widening through the gate: v1 commits n_chars
      // as INT, the append arrives as LONG (plus a new DOUBLE column)
      // — the committed schema widens, and every row (old int files
      // included) reads under the wide schema
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_widen_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("int").as("n_chars")), table)
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars"),
            (col("n_chars") * 0.5).as("score")), table, mode = "append")
      LakeWriter.readSnapshot(s, table)
    }),

    "q_mv_minmax" -> ((s, d) => {
      // the extrema MV: full-refresh posture (min/max are not
      // self-maintainable under deletes) — commit, DELETE the short
      // docs, rebuild; oracle = GROUP BY with min/max over survivors
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_mv_mm_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      import graft.sources.{LakeWriter, Materialized}
      val src = s"$tmp/src"
      LakeWriter.commitSnapshot(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")), src)
      LakeWriter.deleteFromSnapshot(s, src, col("n_chars") < 200)
      Materialized.refreshFull(s, src, s"$tmp/mv", Seq("lang"),
        Seq("n_chars"), minMaxCols = Seq("n_chars"))
      LakeWriter.readSnapshot(s, s"$tmp/mv")
    }),

    "q_snapshot_rename" -> ((s, d) => {
      // RENAME COLUMN as a metadata-only commit (column mapping,
      // Delta name mode): no file rewritten — old files keep the
      // physical name and translate on read; the post-rename append
      // writes the physical name under the hood, so the whole table
      // serves under the new logical name
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_ren_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(2)) === 0),
        table)
      LakeWriter.renameColumn(s, table, "n_chars", "chars")
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 1)
          .withColumnRenamed("n_chars", "chars"), table, mode = "append")
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_drop" -> ((s, d) => {
      // DROP COLUMN + re-add under the same name: the drop is
      // metadata-only and TOMBSTONES the physical name, so the
      // re-added column gets a fresh physical one — old rows read
      // NULL (never the dropped bytes), new rows carry the new values
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_drop_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      LakeWriter.commitSnapshot(base.where(pmod(col("doc_id"), lit(2)) === 0),
        table)
      LakeWriter.dropColumn(s, table, "source")
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(2)) === 1)
          .withColumn("source", concat(lit("re:"), col("lang"))),
        table, mode = "append")
      LakeWriter.readSnapshot(s, table)
    }),

    "q_snapshot_nullskip" -> ((s, d) => {
      // NULL-count data skipping: commit the corpus in two halves —
      // one with n_chars fully populated (nullCount 0: IS NULL reads
      // never open it), one with n_chars all-NULL (nullCount == rows:
      // IS NOT NULL and every comparison prune it); the manifest null
      // counts serve an IS NULL band without touching the clean half
      // (file-level proof in PipelineSpec via corrupt-in-place)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_nulls_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(7)) =!= 0), table)
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(7)) === 0)
          .withColumn("n_chars", lit(null).cast("long")),
        table, mode = "append")
      LakeWriter.readSnapshotWhere(s, table, col("n_chars").isNull)
    }),

    "q_snapshot_count" -> ((s, d) => {
      // metadata-only COUNT(*): per-file row counts ride every
      // manifest (parquet footer block counts — exact), so the
      // count of a committed+deleted table answers from the manifest
      // alone, zero data IO (PipelineSpec proves it by corrupting
      // EVERY data file and counting anyway)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_count_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      LakeWriter.commitSnapshot(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
            col("n_chars"))
          .repartitionByRange(8, col("doc_id")), table)
      LakeWriter.deleteFromSnapshot(s, table, col("n_chars") < 200)
      import s.implicits._
      Seq(LakeWriter.snapshotRowCount(s, table)).toDF("n_rows")
    }),

    "q_snapshot_time_travel" -> ((s, d) => {
      // TIMESTAMP AS OF: every manifest records its commit wall-clock;
      // reading as-of a time between v1 and v2 serves exactly v1
      // (Delta semantics: latest version at or before t)
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_snap_tt_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val table = tmp.toString
      import graft.sources.LakeWriter
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(base, table)
      val t = LakeWriter.snapshotTimestamps(s, table).last._2
      // the next commit must land on a LATER millisecond, or
      // at-or-before resolution correctly prefers it
      while (System.currentTimeMillis() <= t) Thread.sleep(1)
      LakeWriter.commitSnapshot(
        base.withColumn("doc_id", col("doc_id") + 1000000L),
        table, mode = "append")
      LakeWriter.readSnapshotAsOfTimestamp(s, table, t)
    }),

    "q_mv_refresh" -> ((s, d) => {
      // incrementally-maintained materialized aggregate: the source
      // table takes four commits (initial, append, MERGE upsert,
      // DELETE), the MV consumes each commit's CHANGE FEED — never a
      // source re-scan — and the output is the final per-lang
      // count/sum rollup. The oracle proves incremental == full
      // recompute: one GROUP BY over the equivalent final state.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_mv_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      import graft.sources.{LakeWriter, Materialized}
      val src = s"$tmp/src"; val mv = s"$tmp/mv"
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(4)) =!= 3), src)
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(4)) === 3), src,
        mode = "append")
      val upserts = base.where(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
        .unionByName(base.where(pmod(col("doc_id"), lit(10)) === 1)
          .withColumn("doc_id", col("doc_id") + 1000000))
      LakeWriter.mergeSnapshot(upserts, src, Seq("doc_id"))
      LakeWriter.deleteFromSnapshot(s, src, col("lang") === "de")
      Materialized.refreshAgg(s, src, mv, s"$tmp/cursor",
        Seq("lang"), Seq("n_chars"))
      LakeWriter.readSnapshot(s, mv)
    }),

    "q_mv_hll" -> ((s, d) => {
      // incrementally-maintained APPROX-DISTINCT MV: per event_type,
      // one HLL sketch unioned forward across three append commits
      // (O(delta + touched groups) per refresh, never a source
      // re-scan), then a delete commit that must TRIGGER the full
      // rebuild (sketches cannot subtract). Flags prove (a) the
      // estimate obeys the 5σ HLL bound vs the exact twin and (b)
      // incremental maintenance equals a full recompute of the final
      // state — both deterministic, so the oracle pins them at 1.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_mv_hll_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      import graft.sources.{LakeWriter, Materialized}
      val src = s"$tmp/src"; val mv = s"$tmp/mv"
      val ev = T(s, d, "events")
        .select(col("event_id"), col("event_type"), col("user_id"))
      LakeWriter.commitSnapshot(
        ev.where(pmod(col("event_id"), lit(3)) === 0), src)
      LakeWriter.commitSnapshot(
        ev.where(pmod(col("event_id"), lit(3)) === 1), src,
        mode = "append")
      // delete mid-history: version 3 must trigger the rebuild, and
      // version 4's append must then UNION on top of the rebuilt MV
      // (the genuinely-incremental final step)
      LakeWriter.deleteFromSnapshot(s, src,
        col("event_type") === "scroll")
      LakeWriter.commitSnapshot(
        ev.where(pmod(col("event_id"), lit(3)) === 2), src,
        mode = "append")
      Materialized.refreshHll(s, src, mv, s"$tmp/cursor",
        Seq("event_type"), "user_id")
      // rsd(lgK=12) ≈ 1.04/√4096 ≈ 1.6%; 5σ plus small-count slack
      val fin = ev.where(pmod(col("event_id"), lit(3)) === 2 ||
        col("event_type") =!= "scroll")
      val truth = fin.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          hll_sketch_estimate(hll_union(
            hll_sketch_agg(col("user_id")),
            hll_sketch_agg(col("user_id"))))
            .as("__full_est"))
      // self-union before estimating, BOTH sides: a sketch that rode a
      // union loses its HIP accumulator while a single-stream one
      // keeps it, and which path the MV's per-group sketch took
      // depends on whether the last delta touched the group — so the
      // raw estimates can differ between two CORRECT sketches with
      // identical registers. hll_union(x, x) is a register no-op that
      // forces the composite estimator on both sides: equal registers
      // then mean exactly equal doubles, under any partitioning.
      LakeWriter.readSnapshot(s, mv)
        .select(col("event_type"), col("n_rows"),
          hll_sketch_estimate(hll_union(col("hll"), col("hll")))
            .as("__mv_est"))
        .join(truth, Seq("event_type"))
        .select(col("event_type"), col("n_rows"), col("exact_users"),
          (abs(col("__mv_est") - col("exact_users")) <=
            greatest(col("exact_users") * 0.08, lit(5.0)))
            .cast("int").as("hll_ok"),
          (col("__mv_est") === col("__full_est")).cast("int")
            .as("incr_ok"))
    }),

    "q_stream_mv" -> ((s, d) => {
      // STREAMING MV maintenance: the source's manifest directory is
      // consumed as a Structured-Streaming file source (AvailableNow;
      // a trigger drains every pending version in one batch, applied
      // oldest-first), each version applying the same touched-group
      // merge as q_mv_refresh's cursor loop over its UNCOLLAPSED
      // delta (rewrite noise cancels in the signed sums) — the
      // stream checkpoint replaces the cursor. Three source
      // commits (base, append, DELETE) drain in one invocation; a
      // per-source rollup distinguishes it from q_mv_refresh's
      // per-lang one. Oracle = GROUP BY over the equivalent final
      // state (incremental-via-stream == full recompute).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_stream_mv_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      import graft.sources.{LakeWriter, Materialized}
      val src = s"$tmp/src"; val mv = s"$tmp/mv"
      val base = T(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(3)) =!= 2), src)
      LakeWriter.commitSnapshot(
        base.where(pmod(col("doc_id"), lit(3)) === 2), src,
        mode = "append")
      LakeWriter.deleteFromSnapshot(s, src,
        col("n_chars") < 120)
      Materialized.refreshAggStream(s, src, mv, s"$tmp/ckpt",
        Seq("source"), Seq("n_chars"))
      LakeWriter.readSnapshot(s, mv)
    }),

    "q_dup_cluster_stats" -> ((s, d) =>
      // the dedup run's report: how many clusters of each size
      operators.Graph.clusterSizeStatsFromComps(SharedCC.comps(s, d))),

    "q_split_leakage_free" -> ((s, d) => {
      // near-dup clusters never straddle the train/val/test boundary
      val docs = T(s, d, "documents")
      Curation.splitLeakageFreeFromComps(
        docs.select(col("doc_id"), col("lang")), "doc_id",
        SharedCC.comps(s, d))
    }),

    "q_dsir_score" -> ((s, d) => {
      // importance score vs the English subset as the target domain
      val docs = T(s, d, "documents")
      Curation.dsirScore(docs, docs.where(col("lang") === "en"),
        "text", "doc_id")
    }),

    "q_dsir_select" -> ((s, d) => {
      // the selection step: keep the top 25 % most target-like docs
      val docs = T(s, d, "documents")
      Curation.dsirSelect(docs, docs.where(col("lang") === "en"),
        "text", "doc_id", keepPct = 25)
    }),

    "q_training_layout" -> ((s, d) => {
      // the export layout: BFD packing + per-shard sequence shuffle
      val docs = T(s, d, "documents")
      Packing.trainingLayout(
        docs.select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 256, shards = 8)
    }),

    "q_epoch_weights" -> ((s, d) =>
      // training-mix repetition: 4/2/1/0 epochs by quality band
      Curation.epochWeights(T(s, d, "documents"), "text", "doc_id")),

    "q_shuffle_shards" -> ((s, d) =>
      // deterministic global shuffle into 16 ordered training shards
      Packing.shuffleShards(
        T(s, d, "documents").select(col("doc_id")), "doc_id")),

    "q_audio_frames" -> ((s, d) =>
      // windowed energy + zero-crossing features through the batched
      // decode seam; oracle-compared floats repr-rounded on both sides
      Multimodal.audioFramesStub(
          Multimodal.attachBinary(T(s, d, "documents"), "doc_id", "text",
            "source"))
        .withColumn("energy", CleanFns.roundRepro(col("energy"), 6))
        .withColumn("zcr", CleanFns.roundRepro(col("zcr"), 6))),

    "q_embed_sq_topk" -> ((s, d) => {
      // scalar-quantized (8-bit/dim) ANN: corpus compressed 4×, query
      // full-precision — deterministic, so the oracle re-derives the
      // IDENTICAL result from the raw table (no embedded candidates)
      val e = T(s, d, "embeddings")
      Similarity.sqTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, dim = 64)
    }),

    "q_embed_pq_topk" -> ((s, d) => {
      // product-quantized (m=32 sub-codes, 256 centroids each — 8×
      // compression) ANN: codebook training is deterministic
      // (hash-order init, float-rounded means), so the oracle
      // re-derives the ranking from the embedded codes + codebooks
      val e = T(s, d, "embeddings")
      Similarity.pqTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    "q_embed_opq_topk" -> ((s, d) => {
      // PQ behind the OPQ-style deterministic Hadamard rotation —
      // identical code budget to q_embed_pq_topk, quantization error
      // moved by the orthogonal transform (docs/ann_recall.md); the
      // oracle re-derives the rotation itself (dense H from
      // bit_count(i&j) + embedded sign diagonal), the reconstruction,
      // and the ranking
      val e = T(s, d, "embeddings")
      Similarity.opqTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    "q_embed_ivfpq_ann" -> ((s, d) => {
      // the 100 TB ANN composition: IVF bounds WHICH vectors a query
      // touches, PQ bounds WHAT the scan reads per touched vector;
      // ranking is asymmetric (full-precision query vs reconstruction)
      val e = T(s, d, "embeddings")
      Similarity.ivfPqTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    "q_embed_ivfpq_refine" -> ((s, d) => {
      // IVFADC + refine (FAISS IndexRefine shape): the PQ stage
      // shortlists each query's best candidates at ~33 B/vector, then
      // ONLY the shortlist is re-ranked against the SQ8 (1 B/dim)
      // reconstruction — recall of the SQ tier at near-PQ scan cost
      // (docs/ann_recall.md); oracle re-derives SQ8 from the raw
      // table and re-ranks the embedded refine pool
      val e = T(s, d, "embeddings")
      Similarity.ivfPqRefineTopK(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    "q_hybrid_search" -> ((s, d) =>
      // "more like doc 0": keyword rarity-overlap rank + embedding
      // cosine rank, fused with reciprocal-rank fusion
      Retrieval.moreLikeThis(T(s, d, "documents"),
        T(s, d, "embeddings").withColumnRenamed("vec_id", "doc_id"),
        "text", "doc_id", "embedding", queryId = 0L, k = 10)),

    "q_cohort" -> ((s, d) =>
      // the retention triangle: users bucketed by first-seen week,
      // per-(cohort, offset) active counts + share of cohort
      Analytics.cohortRetention(T(s, d, "events"), "user_id", "ts")),

    "q_anomaly" -> ((s, d) => {
      // daily revenue per nation in EXACT CENTS (integer sums are
      // order-free, so the windowed baseline is engine-portable),
      // z-scored against the trailing 30 days excluding the day itself
      val base = T(s, d, "orders")
        .join(broadcast(T(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      Analytics.anomalyZScore(base, "nation", "day", "cents",
        days = 30, zCut = 3.0)
    }),

    "q_funnel" -> ((s, d) => {
      // ordered view -> click -> purchase funnel over events: stage k
      // counts only strictly after stage k-1 was reached; one shuffle
      // + one sort for the whole funnel, then per-stage user counts
      val per = Analytics.funnel(T(s, d, "events"), "user_id",
        "event_type", Seq("view", "click", "purchase"),
        Seq(col("ts"), col("event_id")))
      val agg = per.agg(
        sum(col("reached_1")).as("u1"),
        sum(col("reached_2")).as("u2"),
        sum(col("reached_3")).as("u3")).head()
      // empty input sums to NULL, which must read as a zero-user funnel
      def at(i: Int): Long = if (agg.isNullAt(i)) 0L else agg.getLong(i)
      val (u1, u2, u3) = (at(0), at(1), at(2))
      import s.implicits._
      Seq((1, "view", u1), (2, "click", u2), (3, "purchase", u3))
        .toDF("stage", "stage_name", "users")
        .withColumn("pct_of_top", CleanFns.roundRepro(
          col("users") / lit(math.max(u1, 1L)).cast("double"), 4))
    }),

    "q_gap_fill" -> ((s, d) => {
      // daily avg order price per nation, holidays/quiet days filled
      // LOCF — the reference's stock-series semantics (a missing day
      // reads as the last known price, flagged is_filled)
      // average derived from EXACT integer cents (order-free sums) so
      // no float-sum partial ordering can flip the rounding vs the
      // oracle — the same rule q_anomaly is built on
      val base = T(s, d, "orders")
        .join(broadcast(T(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          to_date(col("o_orderdate")).as("day"))
        .agg(CleanFns.roundRepro(
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("double") / count(lit(1)) / 100.0, 2).as("avg_price"))
      Analytics.gapFillDaily(base, "nation", "day")
        .select(col("nation"), col("day"), col("avg_price"),
          col("is_filled"))
    }),

    "q_hybrid_batch" -> ((s, d) => {
      // the batch shape: five query docs at once, query terms/vectors
      // broadcast, one corpus token scan + one cosine projection
      val docs = T(s, d, "documents")
      Retrieval.moreLikeThisBatch(docs,
        T(s, d, "embeddings").withColumnRenamed("vec_id", "doc_id"),
        docs.where(col("doc_id") < 5).select(col("doc_id")),
        "text", "doc_id", "embedding", k = 10)
    }),

    "q_bm25" -> ((s, d) => {
      // Okapi BM25 ranked retrieval for a 5-query batch: real lexical
      // SCORES (vs q_hybrid_*'s rank-only RRF); per-term contributions
      // floor to micro-units and integer-sum, so the DuckDB oracle
      // re-derives every score exactly
      val docs = T(s, d, "documents")
      Retrieval.bm25Batch(docs,
        docs.where(col("doc_id") < 5).select(col("doc_id")),
        "text", "doc_id", k = 10)
    }),

    "q_semantic_decon" -> ((s, d) => {
      // embedding-space eval-leakage guard: flag corpus vectors
      // cosine-close to ANY benchmark one. The benchmark set is
      // SF-INVARIANT (every 50th vector, capped below id 3200 — at
      // most 64): a benchmark is a fixture, not a scaling input, and
      // capping it keeps the gate's 10x-data ratio measuring the
      // operator (O(corpus x |bench|), linear in corpus) instead of
      // the quadratic |corpus| x |bench| growth of an uncapped set
      // (the r14 sf1 outlier).
      val e = T(s, d, "embeddings")
      Similarity.semanticDecon(e.where(col("vec_id") % 50 =!= 0),
        e.where(col("vec_id") % 50 === 0 && col("vec_id") < 3200),
        "vec_id", "embedding", threshold = 0.4)
    }),

    "q_span_overlap" -> ((s, d) =>
      // exact-substring dedup signal: per doc, fraction of its 8-gram
      // windows that exist in another doc
      Curation.spanOverlap(T(s, d, "documents"), "text", "doc_id",
        n = 8)),

    "q_lang_rebalance" -> ((s, d) =>
      // multilingual balancing: downsample over-represented languages
      // to the uniform share, keep-rates derived from the observed
      // distribution (not caller-fixed like q_mixture_sample)
      Analytics.rebalanceToUniform(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("source")),
        "lang", "doc_id")),

    "q_stream_cc" -> ((s, d) => {
      // STREAMING connected components through the gate: the dup
      // graph's edges arrive as two deterministic micro-batches
      // ((src+dst)%3 splits them) and the label SNAPSHOT folds each
      // in by contraction + file-pruned merge of changed labels —
      // after the last batch the table must equal the full recursive
      // closure over every edge delivered (same oracle as
      // q_connected_components; replay/idempotency is spec-proven).
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_stream_cc_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val c = T(s, d, "customer")
      val a = c.select(col("c_custkey").as("src"),
        col("c_nationkey").as("nk"), col("c_acctbal").as("ab"))
      val b = c.select(col("c_custkey").as("dst"),
        col("c_nationkey").as("nk"), col("c_acctbal").as("bb"))
      val edges = a.join(b, Seq("nk"))
        .where(col("src") < col("dst") && abs(col("ab") - col("bb")) < 1.0)
        .select("src", "dst")
      val in = s"$tmp/in"
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val dir = s"$tmp/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(dir)
        val part = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = java.nio.file.Paths.get(in, name + ".parquet")
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.move(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtime)): Unit
      }
      val now = System.currentTimeMillis()
      val isB1 = pmod(col("src") + col("dst"), lit(3)) === 0
      stage(edges.where(!isB1), "b0", now - 120000)
      stage(edges.where(isB1), "b1", now - 60000)
      val stream = s.readStream.schema(edges.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      graft.streaming.GraphStream.run(stream, s"$tmp/labels",
        s"$tmp/ckpt", "src", "dst").awaitTermination()
      graft.sources.LakeWriter.readSnapshot(s, s"$tmp/labels")
    }),

    "q_stream_curation" -> ((s, d) => {
      // the STREAMING curation funnel, oracle-checked end to end: two
      // deterministic micro-batches (even ids, then odd ids) run the
      // full per-batch pipeline — exact dedup within the batch AND
      // against the committed corpus history, quality cascade with
      // attrition, PII redaction, snapshot commit per batch — and the
      // output is the RUN LEDGER. The near-dup threshold is held above
      // 1.0 (a Jaccard estimate cannot reach it), so stage 4 is the
      // identity and the funnel stays ANSI-SQL-derivable; the near-dup
      // math itself is oracle-checked by q_dedup_minhash and
      // stream==batch is spec-proven.
      val tmp = java.nio.file.Paths.get("/tmp",
        "graft_stream_curation_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      wipeDir(tmp)
      val docs = T(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val in = s"$tmp/in"
      // one staged file per micro-batch, strictly increasing mtimes:
      // the file stream (maxFilesPerTrigger=1, oldest-first) delivers
      // the even-id batch first
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val dir = s"$tmp/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(dir)
        val part = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = java.nio.file.Paths.get(in, name + ".parquet")
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.move(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtime)): Unit
      }
      val now = System.currentTimeMillis()
      stage(docs.where(pmod(col("doc_id"), lit(2)) === 0), "b0",
        now - 120000)
      stage(docs.where(pmod(col("doc_id"), lit(2)) === 1), "b1",
        now - 60000)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      graft.pipeline.CurationPipeline.runStream(stream, s"$tmp/out",
        s"$tmp/ckpt", nearDupThreshold = 1.01).awaitTermination()
      graft.pipeline.CurationPipeline.ledger(s, s"$tmp/out")
    })
  )

  /** Best-fit-decreasing packing as a DuckDB recursive CTE — shared
    * by q_seq_pack_bfd and q_training_layout. The recursion carries
    * the OPEN-BIN LOAD LIST as state; "best" = fullest fitting bin,
    * ties to the lowest bin id (list_sort on (-load, id)); the chosen
    * struct expression is repeated per output column because the
    * recursive term cannot alias a lateral. */
  private val BfdPackCte: String =
    """WITH RECURSIVE ordered AS (
      |  SELECT CAST(doc_id % 8 AS INT) AS shard, doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
      |    END AS n_tokens,
      |    row_number() OVER (PARTITION BY doc_id % 8
      |      ORDER BY CASE WHEN length(trim(text)) = 0 THEN 0
      |        ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
      |        END DESC, doc_id) AS rn
      |  FROM documents),
      |pack AS (
      |  SELECT shard, rn, doc_id, n_tokens, 0 AS seq_id,
      |    0 AS token_offset, [{'id': 0, 'load': n_tokens}] AS bins
      |  FROM ordered WHERE rn = 1
      |  UNION ALL
      |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
      |    CASE WHEN list_sort(list_transform(list_filter(p.bins,
      |           b -> b.load + d.n_tokens <= 256),
      |           b -> {'k': -b.load, 'id': b.id}))[1] IS NULL
      |         THEN len(p.bins)
      |         ELSE list_sort(list_transform(list_filter(p.bins,
      |           b -> b.load + d.n_tokens <= 256),
      |           b -> {'k': -b.load, 'id': b.id}))[1].id END AS seq_id,
      |    CASE WHEN list_sort(list_transform(list_filter(p.bins,
      |           b -> b.load + d.n_tokens <= 256),
      |           b -> {'k': -b.load, 'id': b.id}))[1] IS NULL
      |         THEN 0
      |         ELSE -list_sort(list_transform(list_filter(p.bins,
      |           b -> b.load + d.n_tokens <= 256),
      |           b -> {'k': -b.load, 'id': b.id}))[1].k END AS token_offset,
      |    CASE WHEN list_sort(list_transform(list_filter(p.bins,
      |           b -> b.load + d.n_tokens <= 256),
      |           b -> {'k': -b.load, 'id': b.id}))[1] IS NULL
      |         THEN list_append(p.bins,
      |           {'id': len(p.bins), 'load': d.n_tokens})
      |         ELSE list_transform(p.bins, b -> CASE
      |           WHEN b.id = list_sort(list_transform(list_filter(p.bins,
      |             bb -> bb.load + d.n_tokens <= 256),
      |             bb -> {'k': -bb.load, 'id': bb.id}))[1].id
      |           THEN {'id': b.id, 'load': b.load + d.n_tokens}
      |           ELSE b END) END AS bins
      |  FROM pack p JOIN ordered d ON d.shard = p.shard AND d.rn = p.rn + 1)"""
      .stripMargin

  /** Unrolled-iteration oracle for q_bpe_train: each merge round
    * re-derives the weighted pair counts, takes the same
    * (count desc, left, right) argmax, and replays the left-to-right
    * non-overlapping merge as a `list_reduce` over a chr(31)-joined
    * symbol string (last-token-equals-left check via the separator
    * guard — symbols never contain chr(31) in whitespace-tokenized
    * text). Fully independent of the engine's fold. */
  private def bpeIterCtes(merges: Int): String = {
    val sep = "chr(31)"
    (0 until merges).map { k =>
      s"""p$k AS (
         |  SELECT l, r, CAST(sum(n) AS BIGINT) AS c FROM (
         |    SELECT n, syms[i] AS l, syms[i + 1] AS r
         |    FROM s$k, UNNEST(generate_series(1, len(syms) - 1)) AS g(i)
         |    WHERE len(syms) >= 2)
         |  GROUP BY l, r),
         |b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |s${k + 1} AS (
         |  SELECT n, word, CASE WHEN len(syms) < 2 THEN syms
         |    ELSE string_split(list_reduce(syms, (acc, x) ->
         |      CASE WHEN (acc = b.l OR ends_with(acc, $sep || b.l))
         |                AND x = b.r
         |           THEN left(acc, length(acc) - length(b.l)) || b.l || b.r
         |           ELSE acc || $sep || x END), $sep) END AS syms
         |  FROM s$k, b$k AS b)""".stripMargin
    }.mkString(",\n")
  }

  /** Shared training preamble: per-doc word occurrences, the distinct
    * word table (with corpus counts — training weights AND the
    * vocab-sized apply table), and the unrolled merge iterations. */
  private def bpeCtePreamble(merges: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []
       |    ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS word
       |  FROM documents),
       |w AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
       |s0 AS (SELECT n, word, string_split(word, '') AS syms FROM w),
       |${bpeIterCtes(merges)}""".stripMargin

  private def bpeTrainOracle(merges: Int): String = {
    val union = (0 until merges)
      .map(k => s"SELECT $k AS k, l, r, c FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""${bpeCtePreamble(merges)}
       |SELECT CAST(k AS INT) AS rank, l AS "left", r AS "right",
       |  c AS pair_count
       |FROM ($union)""".stripMargin
  }

  /** q_bpe_encode oracle: replay training (same CTEs), then the final
    * symbol table s{merges} IS the applied segmentation of every
    * distinct word — join its token lengths back onto per-doc word
    * counts, exactly the engine's vocab-sized layout. */
  private def bpeEncodeOracle(merges: Int): String =
    s"""${bpeCtePreamble(merges)},
       |wl AS (SELECT word, len(syms) AS n_tok FROM s$merges),
       |dc AS (SELECT doc_id, word, count(*) AS cnt
       |       FROM toks GROUP BY doc_id, word)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(cnt * n_tok) AS BIGINT) AS n_bpe_tokens
       |FROM dc JOIN wl USING (word) GROUP BY doc_id""".stripMargin

  /** Shared CTE chain re-deriving the synthetic image's 8×8 aHash
    * from the closed-form pixel formula (used by q_image_phash and
    * q_image_dedup; the ENGINE decodes real PNG bytes, the oracle
    * never parses a byte). Ends in `hash(media_id, hash_hi, hash_lo)`. */
  private def imageHashCtes(where: String = ""): String =
    s"""ids AS (
      |  SELECT doc_id AS media_id, 8 + (doc_id % 9) AS w,
      |    8 + ((doc_id * 7) % 9) AS h
      |  FROM documents$where),
      |cells AS (
      |  SELECT media_id, i,
      |    ((i % 8) * w) // 8 AS sx, ((i // 8) * h) // 8 AS sy
      |  FROM ids, UNNEST(generate_series(0, 63)) AS g(i)),
      |lum AS (
      |  SELECT media_id, i,
      |    (((media_id * 31 + sx * 7 + sy * 13) % 256)
      |   + ((media_id * 17 + sx * 11 + sy * 5) % 256)
      |   + ((media_id * 23 + sx * 3 + sy * 19) % 256)) // 3 AS l
      |  FROM cells),
      |tot AS (SELECT media_id, sum(l) AS t FROM lum GROUP BY 1),
      |bits AS (
      |  SELECT lum.media_id, i,
      |    CASE WHEN lum.l * 64 > tot.t THEN 1 ELSE 0 END AS b
      |  FROM lum JOIN tot USING (media_id)),
      |hash AS (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN i >= 32
      |      THEN b * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)
      |      AS BIGINT) AS hash_hi,
      |    CAST(sum(CASE WHEN i < 32
      |      THEN b * (CAST(1 AS BIGINT) << i) ELSE 0 END)
      |      AS BIGINT) AS hash_lo
      |  FROM bits GROUP BY 1)""".stripMargin

  /** Recursive-CTE closure over the customer near-balance edge set —
    * ONE oracle text shared by q_connected_components,
    * q_cc_incremental, and q_stream_cc (all three must land exactly
    * this labeling however they compute it). */
  private val CustomerCcClosureSql: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT a.c_custkey AS src, b.c_custkey AS dst
      |  FROM customer a JOIN customer b
      |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      |   AND abs(a.c_acctbal - b.c_acctbal) < 1.0),
      |edges AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
      |reach(node, r) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src
      |  WHERE edges.dst <> reach.node)
      |SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_bpe_train" -> bpeTrainOracle(8),
    "q_bpe_encode" -> bpeEncodeOracle(8),

    // URL construction + every canonicalization rule re-derived
    "q_url_canonicalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.'
        |          ELSE 'https://www.' END)
        |    || source || '.Example.COM'
        |    || (CASE WHEN doc_id % 3 = 0 THEN ':80'
        |             WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
        |    || '/Docs/' || doc_id
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        |    || '?utm_source=feed&b=' || (doc_id % 5) || '&a=1'
        |    || (CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    regexp_replace(url, '#.*$', '') AS base
        |  FROM u),
        |p2 AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(base, '^([^:/?]+)://', 1)) AS scheme,
        |    regexp_replace(base, '^[^:/?]+://', '') AS rest
        |  FROM parts),
        |p3 AS (
        |  SELECT doc_id, url, scheme, rest,
        |    lower(regexp_extract(rest, '^([^/?]+)', 1)) AS auth
        |  FROM p2),
        |p4 AS (
        |  SELECT doc_id, url, scheme, rest,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |         ELSE auth END AS auth,
        |    regexp_replace(split_part(rest, '?', 1), '^[^/?]+', '')
        |      AS path,
        |    CASE WHEN contains(rest, '?')
        |         THEN regexp_replace(rest, '^[^?]*\?', '') ELSE '' END
        |      AS query
        |  FROM p3),
        |p5 AS (
        |  SELECT doc_id, url, scheme, auth,
        |    CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
        |         ELSE regexp_replace(path, '/+$', '') END AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&') AS qstr
        |  FROM p4)
        |SELECT doc_id, url,
        |  scheme || '://' || auth || path
        |    || (CASE WHEN qstr <> '' THEN '?' || qstr ELSE '' END)
        |    AS canonical_url
        |FROM p5""".stripMargin,

    // same canonicalization chain as q_url_canonicalize (over the
    // colliding URL synthesis), then keep-best per canonical URL
    "q_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.'
        |          ELSE 'https://www.' END)
        |    || source || '.Example.COM'
        |    || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
        |    || '/Docs/' || (doc_id % 50)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        |    || '?utm_source=feed&a=1'
        |    || (CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, n_chars, regexp_replace(url, '#.*$', '') AS base
        |  FROM u),
        |p2 AS (
        |  SELECT doc_id, n_chars,
        |    lower(regexp_extract(base, '^([^:/?]+)://', 1)) AS scheme,
        |    regexp_replace(base, '^[^:/?]+://', '') AS rest
        |  FROM parts),
        |p3 AS (
        |  SELECT doc_id, n_chars, scheme, rest,
        |    lower(regexp_extract(rest, '^([^/?]+)', 1)) AS auth
        |  FROM p2),
        |p4 AS (
        |  SELECT doc_id, n_chars, scheme, rest,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |         ELSE auth END AS auth,
        |    regexp_replace(split_part(rest, '?', 1), '^[^/?]+', '')
        |      AS path,
        |    CASE WHEN contains(rest, '?')
        |         THEN regexp_replace(rest, '^[^?]*\?', '') ELSE '' END
        |      AS query
        |  FROM p3),
        |p5 AS (
        |  SELECT doc_id, n_chars, scheme, auth,
        |    CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
        |         ELSE regexp_replace(path, '/+$', '') END AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&') AS qstr
        |  FROM p4),
        |canon AS (
        |  SELECT doc_id, n_chars,
        |    scheme || '://' || auth || path
        |      || (CASE WHEN qstr <> '' THEN '?' || qstr ELSE '' END)
        |      AS canonical_url
        |  FROM p5)
        |SELECT canonical_url, doc_id AS keep_doc_id,
        |  CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT)
        |    AS n_dups
        |FROM canon
        |QUALIFY row_number() OVER (PARTITION BY canonical_url
        |  ORDER BY n_chars DESC, doc_id ASC) = 1""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 40""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
        |  floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
        |  floor((avg(l_discount)) * 1000000 + 0.5) / 1000000 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_stg_normalize" ->
      """SELECT c_custkey,
        |  upper(trim(c_name)) AS name_norm,
        |  CAST(regexp_replace(c_name, '[^0-9.-]', '', 'g') AS BIGINT) AS cust_id_parsed,
        |  c_mktsegment, c_acctbal,
        |  CASE WHEN c_acctbal < 0 THEN 'NEGATIVE' ELSE 'OK' END AS bal_flag,
        |  coalesce(c_acctbal, 0.0) AS acctbal_filled
        |FROM customer
        |WHERE upper(trim(c_name)) IS NOT NULL AND upper(trim(c_name)) <> ''""".stripMargin,

    "q_schema_align" ->
      """SELECT c_name AS symbol, c_mktsegment AS segment,
        |  c_acctbal AS acctbal,
        |  CAST(NULL AS VARCHAR) AS country, CAST(NULL AS BIGINT) AS employees
        |FROM customer""".stripMargin,

    "q_union_countries" ->
      """SELECT c_name AS symbol, c_mktsegment AS segment, c_acctbal AS acctbal
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_name, c_mktsegment, CAST(NULL AS DOUBLE)
        |FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""".stripMargin,

    "q_join_star" ->
      """SELECT r_name, n_name,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q_join_composite" ->
      """SELECT c_nationkey AS nationkey, count(*) AS n_pairs,
        |  floor((avg(c_acctbal - s_acctbal)) * 10000 + 0.5) / 10000 AS avg_gap
        |FROM customer JOIN supplier
        |  ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
        |GROUP BY c_nationkey""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, 'HAS_ORDERS' AS flag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'NO_ORDERS' AS flag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_dim_distinct_sk" ->
      """SELECT o_orderpriority AS priority_code,
        |  dense_rank() OVER (ORDER BY o_orderpriority) AS priority_sk
        |FROM (SELECT DISTINCT o_orderpriority FROM orders
        |      WHERE o_orderpriority IS NOT NULL)""".stripMargin,

    "q_dim_date" ->
      """SELECT date,
        |  CAST(strftime(date, '%Y%m%d') AS INT) AS date_sk,
        |  CAST(year(date) AS INT) AS year,
        |  CAST(quarter(date) AS INT) AS quarter,
        |  CAST(month(date) AS INT) AS month,
        |  CAST(day(date) AS INT) AS day,
        |  CAST(weekofyear(date) AS INT) AS week,
        |  CAST(isodow(date) % 7 + 1 AS INT) AS dow,
        |  (isodow(date) % 7 + 1) IN (1, 7) AS is_weekend
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date
        |      FROM orders WHERE o_orderdate IS NOT NULL)""".stripMargin,

    "q_scd2" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |grp AS (
        |  SELECT user_id, ts, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        |  FROM marked),
        |rng AS (
        |  SELECT user_id, event_type, ver, min(ts) AS effective_from
        |  FROM grp GROUP BY user_id, event_type, ver)
        |SELECT user_id, event_type, effective_from,
        |  coalesce(lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from),
        |           TIMESTAMP '2200-01-01 00:00:00') AS effective_to,
        |  (lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from) IS NULL)
        |    AS is_current
        |FROM rng""".stripMargin,

    "q_pit_join" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |grp AS (
        |  SELECT user_id, ts, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        |  FROM marked),
        |rng AS (
        |  SELECT user_id, event_type, ver, min(ts) AS effective_from
        |  FROM grp GROUP BY user_id, event_type, ver),
        |dim AS (
        |  SELECT user_id, event_type AS status, effective_from,
        |    coalesce(lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from),
        |             TIMESTAMP '2200-01-01 00:00:00') AS effective_to
        |  FROM rng)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  dim.status, dim.effective_from
        |FROM events e LEFT JOIN dim
        |  ON e.user_id = dim.user_id
        | AND CAST(e.ts AS TIMESTAMP) >= dim.effective_from
        | AND CAST(e.ts AS TIMESTAMP) < dim.effective_to""".stripMargin,

    "q_window_analytics" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS seq,
        |  lag(o_totalprice) OVER w AS prev_value,
        |  floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_pct_change" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  floor((CASE WHEN lag(o_totalprice) OVER w IS NOT NULL
        |              AND lag(o_totalprice) OVER w <> 0
        |        THEN (o_totalprice - lag(o_totalprice) OVER w) / lag(o_totalprice) OVER w
        |        END) * 1000000 + 0.5) / 1000000 AS pct_change,
        |  CASE WHEN lag(o_totalprice) OVER w IS NULL THEN NULL
        |       WHEN o_totalprice > lag(o_totalprice) OVER w THEN 'UP'
        |       WHEN o_totalprice < lag(o_totalprice) OVER w THEN 'DOWN'
        |       ELSE 'FLAT' END AS direction
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_dedup_latest" ->
      """SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts,
        |  event_type AS last_event_type, value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rnk AS INT) AS rank
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3""".stripMargin,

    "q_rollup" ->
      """SELECT n_name, floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS total_acctbal,
        |  count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name)""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  floor((sum(CASE WHEN event_type = 'click' THEN value END)) * 100 + 0.5) / 100 AS click,
        |  floor((sum(CASE WHEN event_type = 'view' THEN value END)) * 100 + 0.5) / 100 AS view,
        |  floor((sum(CASE WHEN event_type = 'purchase' THEN value END)) * 100 + 0.5) / 100 AS purchase,
        |  floor((sum(CASE WHEN event_type = 'signup' THEN value END)) * 100 + 0.5) / 100 AS signup,
        |  floor((sum(CASE WHEN event_type = 'error' THEN value END)) * 100 + 0.5) / 100 AS error
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,

    "q_time_bucket" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |  event_type, count(*) AS n,
        |  floor((sum(value)) * 100 + 0.5) / 100 AS total_value,
        |  floor((avg(value)) * 10000 + 0.5) / 10000 AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, floor((sum(value)) * 100 + 0.5) / 100 AS session_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q_cube" ->
      """SELECT n_name, c_mktsegment, floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS total_acctbal,
        |  count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, c_mktsegment)""".stripMargin,

    "q_trailing_window" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS epoch_day,
        |  o_totalprice,
        |  floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS trailing_sum,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS trailing_n
        |FROM orders""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  floor(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) / 100 AS p50_price,
        |  floor(quantile_cont(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90_price,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // bounded-error sketch oracles: the ok-flags are computed Spark-side
    // from the sketch's published error bound; DuckDB asserts them 1.
    "q_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  1 AS users_ok, 1 AS props_ok
        |FROM events GROUP BY event_type""".stripMargin,

    "q_approx_percentile" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  1 AS p50_ok, 1 AS p90_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 8) AS fp_prefix
        |FROM documents""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |  END AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT)
        |    AS n_tokens_bpe
        |FROM documents""".stripMargin,

    "q_text_quality" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |    END AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INT) AS n_punct,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |           t -> t IN ('the','a','an','of','and','to','is','in','it','that'))) AS INT)
        |    END AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    floor(n_punct / CAST(greatest(n_chars, 1) AS DOUBLE) * 10000 + 0.5) / 10000 AS punct_ratio,
        |    floor(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE) * 10000 + 0.5) / 10000 AS digit_ratio,
        |    floor(n_stopwords / CAST(greatest(n_tokens, 1) AS DOUBLE) * 10000 + 0.5) / 10000 AS stopword_ratio,
        |    floor(n_chars / CAST(greatest(n_tokens, 1) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_token_len
        |  FROM m)
        |SELECT doc_id, n_chars, n_tokens, n_punct, n_digits, n_stopwords,
        |  punct_ratio, digit_ratio, stopword_ratio, avg_token_len,
        |  floor((least(n_tokens / 100.0, 1.0) * 0.4 +
        |        least(stopword_ratio * 5.0, 1.0) * 0.3 +
        |        (1.0 - least(digit_ratio * 10.0, 1.0)) * 0.3) * 10000 + 0.5) / 10000 AS quality_score
        |FROM r""".stripMargin,

    "q_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','is','in'))) AS INT) AS score_en,
        |    CAST(len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht'))) AS INT) AS score_de,
        |    CAST(len(list_filter(t, x -> x IN ('el','la','los','de','y','es','que'))) AS INT) AS score_es,
        |    CAST(len(list_filter(t, x -> x IN ('le','la','les','et','est','que'))) AS INT) AS score_fr
        |  FROM toks)
        |SELECT doc_id, score_en, score_de, score_es, score_fr,
        |  CASE WHEN score_en = 0 AND score_de = 0 AND score_es = 0 AND score_fr = 0 THEN 'und'
        |       WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
        |       WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
        |       WHEN score_es >= score_fr THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |FROM s""".stripMargin,

    "q_embed_cosine" ->
      """SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < 10 AND b.vec_id < 50 AND a.vec_id <> b.vec_id""".stripMargin,

    "q_embed_cosine_topk" ->
      """SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 AS cos_sim,
        |  CAST(row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
        |             b.vec_id ASC) AS INT) AS rank
        |FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
        |QUALIFY rank <= 5""".stripMargin,

    "q_connected_components" ->
      CustomerCcClosureSql,

    // the streamed label snapshot must land EXACTLY the full closure
    // over every edge delivered — same oracle as
    // q_connected_components, blind to the batch split
    "q_stream_cc" ->
      CustomerCcClosureSql,

    // the incremental path must land EXACTLY the full union closure —
    // same oracle as q_connected_components, derived from the full
    // edge set with no knowledge of the standing/delta split
    "q_cc_incremental" ->
      CustomerCcClosureSql,

    "q_sample_per_group" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5""".stripMargin,

    "q_mixture_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN '40'
        |            ELSE '19' END""".stripMargin,

    // exponential-race weighted sample: u from 52 md5 bits, key =
    // -ln(u)/w, k smallest per group (ties to the smaller id)
    "q_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    (-ln((CAST(CAST(('0x' ||
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |      AS DOUBLE) + 1.0) / 4503599627370496.0))
        |    / CAST(greatest(n_chars, 1) AS DOUBLE) AS k
        |  FROM documents)
        |SELECT doc_id, lang, source, n_chars, CAST(rank AS INT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY k, doc_id) AS rank FROM keyed)
        |WHERE rank <= 10""".stripMargin,

    // the ±1 matrix re-derived from md5("i_j") first-hex-digit
    // parity; micro quantization and MAC re-run as exact integers
    "q_embed_project" ->
      """WITH m AS (
        |  SELECT gi.i, gj.j,
        |    CASE WHEN substr(md5(CAST(gi.i AS VARCHAR) || '_' ||
        |        CAST(gj.j AS VARCHAR)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS s
        |  FROM generate_series(0, 63) AS gi(i)
        |  CROSS JOIN generate_series(0, 15) AS gj(j)),
        |e AS (
        |  SELECT vec_id, i - 1 AS i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS micro
        |  FROM embeddings,
        |    UNNEST(generate_series(1, len(embedding))) AS u(i))
        |SELECT e.vec_id, CAST(m.j AS INT) AS dim,
        |  CAST(sum(e.micro * m.s) AS BIGINT) AS value_micro
        |FROM e JOIN m ON m.i = e.i
        |GROUP BY 1, 2""".stripMargin,

    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts,
        |    event_id AS p_event_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.p_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND p.p_ts <= c.ts""".stripMargin,

    "q_lookup_enrich" ->
      """SELECT n_name, r_name, region_code, weight
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |LEFT JOIN (VALUES ('AFRICA','AF',1.0), ('AMERICA','AM',1.1),
        |                  ('ASIA','AS',0.9), ('EUROPE','EU',1.2),
        |                  ('MIDDLE EAST','ME',0.8))
        |  AS l(r_name2, region_code, weight) ON r_name = r_name2""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
        |       THEN 'HIGH' ELSE 'LOW' END AS k_band
        |FROM events""".stripMargin,

    // streaming OHLC: Spark's 7-day tumbling windows are EPOCH-aligned
    // (not ISO weeks) — the oracle buckets by integer epoch-µs
    // division and re-derives open/close via rank-1 rows
    "q_stream_ohlc" ->
      """WITH r AS (
        |  SELECT event_type,
        |    make_timestamp((epoch_us(ts) // 604800000000)
        |      * 604800000000) AS window_start,
        |    value,
        |    row_number() OVER (PARTITION BY event_type,
        |      epoch_us(ts) // 604800000000
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type,
        |      epoch_us(ts) // 604800000000
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, window_start,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_ticks
        |FROM r GROUP BY event_type, window_start""".stripMargin,

    "q_stream_window_agg" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100 AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_stream_topk" ->
      """WITH agg AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start,
        |    event_type, count(*) AS n,
        |    floor((sum(value)) * 100 + 0.5) / 100 AS total_value
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, event_type, n, total_value,
        |  CAST(row_number() OVER (PARTITION BY window_start
        |    ORDER BY n DESC, event_type ASC) AS INT) AS rank
        |FROM agg QUALIFY rank <= 3""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events""".stripMargin,

    // stateless stream-static join == the batch join
    "q_stream_enrich" ->
      """SELECT event_id, user_id, event_type, c_mktsegment, c_nationkey
        |FROM events e LEFT JOIN customer c
        |  ON e.user_id = c.c_custkey""".stripMargin,

    // single-batch finite run processes each key's events in
    // (ts, event_id) order, so the running (n, Σ, Σ²) state equals
    // the batch prefix windows; the integer inequality needs int128
    // (n·Q and S² overflow int64), BigInt engine-side
    "q_stream_anomaly" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, cents,
        |    count(*) OVER pw AS n,
        |    CAST(coalesce(sum(cents) OVER pw, 0) AS BIGINT) AS s,
        |    CAST(coalesce(sum(cents * cents) OVER pw, 0) AS BIGINT) AS q
        |  FROM e
        |  WINDOW pw AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, CAST(n AS BIGINT) AS n_prior,
        |  CASE WHEN n < 20 THEN NULL
        |    WHEN CAST(cents * n - s AS HUGEINT) * CAST(cents * n - s AS HUGEINT)
        |      > 9 * (CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
        |             - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
        |    THEN 1 ELSE 0 END AS is_anomaly
        |FROM w""".stripMargin,

    // history dedup over a finite run with an initially-empty history
    // == plain DISTINCT (the cross-batch drop path is exercised by the
    // sentinel keys, which the result filters out)
    "q_stream_bloom_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events""".stripMargin,

    // single source file = single micro-batch, so the bounded-state
    // dedup sees every duplicate and equals DISTINCT
    "q_stream_dedup_within" ->
      """SELECT DISTINCT user_id, event_type FROM events""".stripMargin,

    // sentineled source flushes every watermark-gated row, so the
    // stream result equals the batch LEFT interval join (sans p_ts,
    // which the streaming query does not project)
    "q_stream_interval_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id AS p_user, CAST(ts AS TIMESTAMP) AS p_ts,
        |    event_id AS p_event_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.p_value
        |FROM clicks c LEFT JOIN purchases p
        |  ON c.user_id = p.p_user AND p.p_ts > c.ts
        | AND p.p_ts <= c.ts + INTERVAL 1 HOUR""".stripMargin,

    // sentineled source + EventTimeTimeout flush makes the streaming
    // sessionizer equal batch q_sessionize (its oracle, sans the
    // session ordinal the stream does not emit)
    "q_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, floor((sum(value)) * 100 + 0.5) / 100 AS session_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT n_name, c_mktsegment,
        |  floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS total_acctbal,
        |  count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())""".stripMargin,

    "q_interval_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id AS p_user, CAST(ts AS TIMESTAMP) AS p_ts,
        |    event_id AS p_event_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.p_ts, p.p_value
        |FROM clicks c LEFT JOIN purchases p
        |  ON c.user_id = p.p_user AND p.p_ts > c.ts
        | AND p.p_ts <= c.ts + INTERVAL 1 HOUR""".stripMargin,

    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  floor((sum(l_quantity)) * 100 + 0.5) / 100 AS total_qty,
        |  count(*) AS n,
        |  floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 3 THEN []
        |         ELSE list_transform(
        |           generate_series(1, len(string_split_regex(trim(lower(text)), '\s+')) - 2),
        |           i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
        |                string_split_regex(trim(lower(text)), '\s+')[i + 1] || ' ' ||
        |                string_split_regex(trim(lower(text)), '\s+')[i + 2])
        |    END AS grams
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(grams) AS INT) AS n_ngrams,
        |  CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
        |  floor((CASE WHEN len(grams) = 0 THEN 0.0
        |         ELSE 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE)
        |         END) * 10000 + 0.5) / 10000 AS dup_ratio
        |FROM g""".stripMargin,

    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
        |  WHERE len(t) >= 2),
        |cbg AS (SELECT bigram, count(*) AS c_bg FROM bg GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  floor(avg(ln(c_bg / CAST((SELECT count(*) FROM bg) AS DOUBLE)))
        |    * 10000 + 0.5) / 10000 AS avg_logprob
        |FROM bg JOIN cbg USING (bigram)
        |GROUP BY doc_id""".stripMargin,

    // held-out Laplace bigram LM re-derived term by term: counts over
    // the even-id reference half, V = ref vocab + 1, per-bigram NLL
    // floored to micro-units and integer-summed
    "q_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |bg AS (
        |  SELECT doc_id, t[i] AS a, t[i] || ' ' || t[i + 1] AS bigram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
        |  WHERE len(t) >= 2),
        |ref AS (SELECT * FROM bg WHERE doc_id % 2 = 0),
        |cbg AS (SELECT bigram, count(*) AS c_bg FROM ref GROUP BY 1),
        |cctx AS (SELECT a, count(*) AS c_ctx FROM ref GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) + 1 AS v FROM (
        |  SELECT unnest(t) AS tok FROM toks WHERE doc_id % 2 = 0
        |    AND len(t) >= 2)),
        |scored AS (
        |  SELECT bg.doc_id,
        |    CAST(floor(-ln((coalesce(cbg.c_bg, 0) + 1)
        |        / (coalesce(cctx.c_ctx, 0) + CAST(v.v AS DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS micro
        |  FROM bg LEFT JOIN cbg USING (bigram)
        |  LEFT JOIN cctx USING (a) CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(micro) AS BIGINT) AS nll_micro,
        |  CAST(sum(micro) AS BIGINT) // count(*) AS avg_nll_micro
        |FROM scored GROUP BY doc_id""".stripMargin,

    "q_nb_classify" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
        |tcnt AS (SELECT cand, tok, count(*) AS c_lt FROM (
        |  SELECT lang AS cand, unnest(t) AS tok FROM train) GROUP BY 1, 2),
        |lab AS (
        |  SELECT lang AS cand, CAST(sum(len(t)) AS DOUBLE) AS tot,
        |    CAST(floor(-ln(count(*) /
        |        (SELECT CAST(count(*) AS DOUBLE) FROM train))
        |      * 1000000.0 + 0.5) AS BIGINT) AS prior_micro
        |  FROM train GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM (
        |  SELECT unnest(t) AS tok FROM train)),
        |dt AS (SELECT doc_id, label, tok, count(*) AS tf FROM (
        |  SELECT doc_id, lang AS label, unnest(t) AS tok FROM toks)
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT dt.doc_id, dt.label, lab.cand, lab.prior_micro +
        |    CAST(sum(dt.tf * CAST(floor(-ln(
        |        CAST(coalesce(tcnt.c_lt, 0) + 1 AS DOUBLE) / (lab.tot + v.v))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_nll
        |  FROM dt CROSS JOIN lab
        |  LEFT JOIN tcnt ON tcnt.cand = lab.cand AND tcnt.tok = dt.tok
        |  CROSS JOIN v
        |  GROUP BY 1, 2, 3, lab.prior_micro)
        |SELECT doc_id, label, cand AS pred_label, total_nll AS nll_micro
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY total_nll, cand) AS rn FROM scored)
        |WHERE rn = 1""".stripMargin,

    // benchmark decontamination: distinct shared 5-grams per doc vs
    // the benchmark subset (doc_id % 50 = 0); <5-token docs have no
    // grams (strict n-grams)
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) < 5 THEN []
        |         ELSE list_transform(generate_series(1, len(t) - 4),
        |           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' ||
        |                t[i + 3] || ' ' || t[i + 4]) END) AS grams
        |  FROM toks),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
        |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        |m AS (SELECT cg.doc_id, count(*) AS n FROM cg JOIN bg USING (gram) GROUP BY 1)
        |SELECT g.doc_id, CAST(coalesce(m.n, 0) AS INT) AS n_overlap,
        |  CAST(CASE WHEN coalesce(m.n, 0) >= 1 THEN 1 ELSE 0 END AS INT) AS contaminated
        |FROM g LEFT JOIN m ON g.doc_id = m.doc_id""".stripMargin,

    // passage dedup: 10-token chunks, global first occurrence by
    // (doc_id, pos) survives, docs reassembled in order
    "q_passage_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |ps AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(t[(i - 1) * 10 + 1 : (i - 1) * 10 + 10], ' ') AS passage
        |  FROM toks, UNNEST(generate_series(1, CAST(ceil(len(t) / 10.0) AS INT))) AS u(i)
        |  WHERE len(t) > 0),
        |k AS (SELECT passage, min(doc_id * 1000000 + pos) AS kk FROM ps GROUP BY 1),
        |kept AS (
        |  SELECT ps.doc_id, ps.pos, ps.passage FROM ps
        |  JOIN k ON ps.passage = k.passage
        |        AND ps.doc_id * 1000000 + ps.pos = k.kk),
        |reb AS (
        |  SELECT doc_id, count(*) AS nk,
        |    string_agg(passage, ' ' ORDER BY pos) AS dedup_text
        |  FROM kept GROUP BY 1),
        |np AS (SELECT doc_id, CAST(ceil(len(t) / 10.0) AS INT) AS n_passages FROM toks)
        |SELECT np.doc_id, np.n_passages,
        |  CAST(coalesce(reb.nk, 0) AS INT) AS n_kept,
        |  coalesce(reb.dedup_text, '') AS dedup_text
        |FROM np LEFT JOIN reb USING (doc_id)""".stripMargin,

    // the skew-robust twin must produce the identical table
    "q_passage_dedup_robust" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |ps AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(t[(i - 1) * 10 + 1 : (i - 1) * 10 + 10], ' ') AS passage
        |  FROM toks, UNNEST(generate_series(1, CAST(ceil(len(t) / 10.0) AS INT))) AS u(i)
        |  WHERE len(t) > 0),
        |k AS (SELECT passage, min(doc_id * 1000000 + pos) AS kk FROM ps GROUP BY 1),
        |kept AS (
        |  SELECT ps.doc_id, ps.pos, ps.passage FROM ps
        |  JOIN k ON ps.passage = k.passage
        |        AND ps.doc_id * 1000000 + ps.pos = k.kk),
        |reb AS (
        |  SELECT doc_id, count(*) AS nk,
        |    string_agg(passage, ' ' ORDER BY pos) AS dedup_text
        |  FROM kept GROUP BY 1),
        |np AS (SELECT doc_id, CAST(ceil(len(t) / 10.0) AS INT) AS n_passages FROM toks)
        |SELECT np.doc_id, np.n_passages,
        |  CAST(coalesce(reb.nk, 0) AS INT) AS n_kept,
        |  coalesce(reb.dedup_text, '') AS dedup_text
        |FROM np LEFT JOIN reb USING (doc_id)""".stripMargin,

    // overlapping windows re-derived from the same start-position
    // arithmetic: ceil((n-32)/24)+1 starts, slice may run short at
    // the tail
    "q_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  CAST(len(t[i * 24 + 1 : i * 24 + 32]) AS INT) AS n_tokens,
        |  array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
        |FROM toks, UNNEST(generate_series(0,
        |  CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS INT))) AS u(i)
        |WHERE len(t) > 0""".stripMargin,

    // content-defined chunk boundaries re-derived per char with plain
    // window functions: same 24-bit Knuth mix, same degree-3
    // polynomial over the trailing 4-char window, cut where h%64=0
    "q_cdc_chunks" ->
      """WITH norm AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id,
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
        |    FROM documents) WHERE length(s) > 0),
        |ch AS (
        |  SELECT doc_id, i, substr(s, i, 1) AS c,
        |    (ord(substr(s, i, 1)) * 2654435761) % 16777216 AS gv
        |  FROM norm, UNNEST(generate_series(1, length(s))) AS u(i)),
        |h AS (
        |  SELECT doc_id, i, c,
        |    CASE WHEN i >= 4 THEN
        |      gv + 263 * lag(gv, 1) OVER w + 69169 * lag(gv, 2) OVER w
        |         + 18191447 * lag(gv, 3) OVER w END AS hv
        |  FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |cid AS (
        |  SELECT doc_id, i, c, 1 + coalesce(sum(
        |      CASE WHEN hv IS NOT NULL AND hv % 64 = 0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS chunk_id
        |  FROM h)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_idx,
        |  CAST(min(i) AS INT) AS start, CAST(count(*) AS INT) AS len,
        |  md5(string_agg(c, '' ORDER BY i)) AS chunk_md5
        |FROM cid GROUP BY doc_id, chunk_id""".stripMargin,

    // per-doc duplicated-byte share over the same CDC chunk grain
    "q_cdc_dedup" ->
      """WITH norm AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id,
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
        |    FROM documents) WHERE length(s) > 0),
        |ch AS (
        |  SELECT doc_id, i, substr(s, i, 1) AS c,
        |    (ord(substr(s, i, 1)) * 2654435761) % 16777216 AS gv
        |  FROM norm, UNNEST(generate_series(1, length(s))) AS u(i)),
        |h AS (
        |  SELECT doc_id, i, c,
        |    CASE WHEN i >= 4 THEN
        |      gv + 263 * lag(gv, 1) OVER w + 69169 * lag(gv, 2) OVER w
        |         + 18191447 * lag(gv, 3) OVER w END AS hv
        |  FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |cid AS (
        |  SELECT doc_id, i, c, 1 + coalesce(sum(
        |      CASE WHEN hv IS NOT NULL AND hv % 64 = 0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS chunk_id
        |  FROM h),
        |chunks AS (
        |  SELECT doc_id, chunk_id, count(*) AS len,
        |    md5(string_agg(c, '' ORDER BY i)) AS chunk_md5
        |  FROM cid GROUP BY doc_id, chunk_id),
        |shared AS (SELECT chunk_md5, count(DISTINCT doc_id) AS nd
        |  FROM chunks GROUP BY 1),
        |agg AS (
        |  SELECT c.doc_id, count(*) AS n_chunks,
        |    CAST(sum(c.len) AS BIGINT) AS total_len,
        |    CAST(sum(CASE WHEN s.nd >= 2 THEN c.len ELSE 0 END) AS BIGINT)
        |      AS dup_len
        |  FROM chunks c JOIN shared s USING (chunk_md5) GROUP BY 1)
        |SELECT doc_id, n_chunks, total_len, dup_len,
        |  CAST(floor(dup_len * 1000000.0 / total_len) AS BIGINT)
        |    AS dup_micro
        |FROM agg""".stripMargin,

    // tar size law: 512-byte header + content padded to 512 per
    // entry, 1024-byte zero trailer per shard; shard = id DIV 100
    "q_export_tar" ->
      """WITH e AS (
        |  SELECT CAST(doc_id // 100 AS INT) AS shard, strlen(text) AS b
        |  FROM documents)
        |SELECT shard, count(*) AS n_entries,
        |  CAST(sum(512 + b + (512 - b % 512) % 512) + 1024 AS BIGINT)
        |    AS total_bytes
        |FROM e GROUP BY 1""".stripMargin,

    // domain-templated passages (>= 3 distinct docs of one source)
    // dropped from EVERY doc; re-derived with the same 2-token chunking
    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |ps AS (
        |  SELECT doc_id, source, i - 1 AS pos,
        |    array_to_string(t[(i - 1) * 2 + 1 : (i - 1) * 2 + 2], ' ') AS passage
        |  FROM toks, UNNEST(generate_series(1, CAST(ceil(len(t) / 2.0) AS INT))) AS u(i)
        |  WHERE len(t) > 0),
        |bo AS (
        |  SELECT source, passage FROM ps
        |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 3),
        |keep AS (
        |  SELECT ps.doc_id, ps.pos, ps.passage,
        |    (bo.passage IS NOT NULL) AS is_boiler
        |  FROM ps LEFT JOIN bo
        |    ON ps.source = bo.source AND ps.passage = bo.passage),
        |reb AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS INT) AS nb,
        |    string_agg(passage, ' ' ORDER BY pos)
        |      FILTER (NOT is_boiler) AS clean_text
        |  FROM keep GROUP BY 1),
        |np AS (SELECT doc_id, CAST(ceil(len(t) / 2.0) AS INT) AS n_passages
        |       FROM toks)
        |SELECT np.doc_id, np.n_passages,
        |  CAST(coalesce(reb.nb, 0) AS INT) AS n_boiler,
        |  coalesce(reb.clean_text, '') AS clean_text
        |FROM np LEFT JOIN reb USING (doc_id)""".stripMargin,

    // PII redaction over the same deterministic augmentation the
    // Spark query builds; counts on the original, replace in
    // email -> phone -> ip order
    "q_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' reach user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |    '.' || CAST(doc_id % 100 AS VARCHAR) || ' or +1-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\+\d{1,2}-\d{3}-\d{4}')) AS INT) AS n_phones,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\+\d{1,2}-\d{3}-\d{4}', '[PHONE]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
        |FROM aug""".stripMargin,

    // bloom anti-join == plain anti-join on the fingerprint (the
    // bloom is a prefilter only; exactness is the contract)
    "q_bloom_antijoin" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |  FROM documents)
        |SELECT doc_id, fingerprint FROM fp
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM fp h
        |  WHERE h.doc_id % 3 = 0 AND h.fingerprint = fp.fingerprint)""".stripMargin,

    // multimodal stub features re-derived from the text bytes (the
    // payload IS the utf-8 text, and the corpus is pure ASCII, so
    // ascii(char) == byte value)
    "q_multimodal_features" ->
      """WITH b AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
        |ch AS (
        |  SELECT media_id, ascii(substr(text, CAST(i AS INT), 1)) AS c
        |  FROM b, UNNEST(generate_series(1, n)) AS u(i)
        |  WHERE n > 0),
        |agg AS (
        |  SELECT media_id, count(*) AS nb,
        |    floor((sum(c) / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS bm,
        |    floor((count(*) FILTER (c // 32 = 0)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f0,
        |    floor((count(*) FILTER (c // 32 = 1)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f1,
        |    floor((count(*) FILTER (c // 32 = 2)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f2,
        |    floor((count(*) FILTER (c // 32 = 3)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f3,
        |    floor((count(*) FILTER (c // 32 = 4)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f4,
        |    floor((count(*) FILTER (c // 32 = 5)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f5,
        |    floor((count(*) FILTER (c // 32 = 6)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f6,
        |    floor((count(*) FILTER (c // 32 = 7)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS f7
        |  FROM ch GROUP BY 1)
        |SELECT b.media_id, coalesce(agg.nb, 0) AS n_bytes,
        |  coalesce(agg.bm, 0.0) AS byte_mean,
        |  coalesce(f0, 0.0) AS f0, coalesce(f1, 0.0) AS f1,
        |  coalesce(f2, 0.0) AS f2, coalesce(f3, 0.0) AS f3,
        |  coalesce(f4, 0.0) AS f4, coalesce(f5, 0.0) AS f5,
        |  coalesce(f6, 0.0) AS f6, coalesce(f7, 0.0) AS f7
        |FROM b LEFT JOIN agg USING (media_id)""".stripMargin,

    // perceptual aHash re-derived bit by bit from the closed-form
    // pixel formula: NN-mapped 8x8 luma grid, bit set iff
    // luma*64 > grid sum (strict)
    "q_image_phash" ->
      s"""WITH ${imageHashCtes()}
        |SELECT media_id, hash_hi, hash_lo,
        |  CAST(count(*) OVER (PARTITION BY hash_hi, hash_lo) AS BIGINT)
        |    AS n_same_hash
        |FROM hash""".stripMargin,

    // same hash derivation; pairs brute-forced (the oracle needs no
    // banding — completeness of the engine's pigeonhole bands is what
    // the comparison proves), then collapsed to min-id survivors via
    // the recursive closure (the q_dedup_survivors oracle shape) —
    // a missed band pair splits a cluster and shifts its survivor
    "q_image_dedup" ->
      s"""WITH RECURSIVE ${imageHashCtes(" WHERE doc_id < 5000")},
        |p AS (
        |  SELECT a.media_id AS pa, b.media_id AS pb
        |  FROM hash a JOIN hash b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.hash_hi, b.hash_hi))
        |      + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
        |edges AS (SELECT pa AS src, pb AS dst FROM p
        |          UNION SELECT pb, pa FROM p),
        |reach(node, r) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst
        |  FROM reach JOIN edges ON reach.r = edges.src
        |  WHERE edges.dst <> reach.node)
        |SELECT node, least(node, min(r)) AS survivor
        |FROM reach GROUP BY node""".stripMargin,

    // real-PNG image features re-derived from the closed-form pixel
    // formula (the oracle never parses PNG bytes; the engine does)
    "q_image_features" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    8 + (doc_id % 9) AS w,
        |    8 + ((doc_id * 7) % 9) AS h
        |  FROM documents),
        |px AS (
        |  SELECT media_id, w, h,
        |    (media_id*31 + x*7 + y*13) % 256 AS r,
        |    (media_id*17 + x*11 + y*5) % 256 AS g,
        |    (media_id*23 + x*3 + y*19) % 256 AS b
        |  FROM d,
        |    UNNEST(generate_series(0, w - 1)) AS ux(x),
        |    UNNEST(generate_series(0, h - 1)) AS uy(y))
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  count(*) AS n_px,
        |  floor(sum(r) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_r,
        |  floor(sum(g) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_g,
        |  floor(sum(b) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_b,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 0)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l0,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 1)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l1,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 2)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l2,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 3)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l3
        |FROM px GROUP BY media_id, w, h""".stripMargin,

    // decode → 8×8 nearest-neighbor resize → re-encode → decode:
    // oracle evaluates the pixel formula at the NN source coordinate
    // (x*w//8, y*h//8) for each of the 64 output pixels
    "q_image_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    8 + (doc_id % 9) AS w,
        |    8 + ((doc_id * 7) % 9) AS h
        |  FROM documents),
        |px AS (
        |  SELECT media_id,
        |    (media_id*31 + ((x*w)//8)*7 + ((y*h)//8)*13) % 256 AS r,
        |    (media_id*17 + ((x*w)//8)*11 + ((y*h)//8)*5) % 256 AS g,
        |    (media_id*23 + ((x*w)//8)*3 + ((y*h)//8)*19) % 256 AS b
        |  FROM d,
        |    UNNEST(generate_series(0, 7)) AS ux(x),
        |    UNNEST(generate_series(0, 7)) AS uy(y))
        |SELECT media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  count(*) AS n_px,
        |  floor(sum(r) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_r,
        |  floor(sum(g) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_g,
        |  floor(sum(b) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_b,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 0)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l0,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 1)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l1,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 2)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l2,
        |  floor((count(*) FILTER (((r+g+b)//3)//64 = 3)) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS l3
        |FROM px GROUP BY media_id""".stripMargin,

    // linear-interp resample re-derived sample-by-sample: num/idx/rem
    // are exact integers, the single divide is the same IEEE double op
    "q_audio_resample" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |o AS (
        |  SELECT media_id, text, n, CAST(i AS INT) AS sample_idx,
        |    CAST(i AS BIGINT) * (n - 1) AS num
        |  FROM b, UNNEST(generate_series(0, 63)) AS u(i)),
        |v AS (
        |  SELECT media_id, sample_idx,
        |    CASE WHEN n = 1 THEN CAST(ascii(substr(text, 1, 1)) - 128 AS DOUBLE)
        |         WHEN num % 63 = 0 THEN
        |           CAST(ascii(substr(text, CAST(num // 63 AS INT) + 1, 1)) - 128 AS DOUBLE)
        |         ELSE
        |           (ascii(substr(text, CAST(num // 63 AS INT) + 1, 1)) - 128)
        |           + (ascii(substr(text, CAST(num // 63 AS INT) + 2, 1))
        |              - ascii(substr(text, CAST(num // 63 AS INT) + 1, 1)))
        |             * (num % 63) / CAST(63 AS DOUBLE)
        |    END AS s
        |  FROM o)
        |SELECT media_id, sample_idx,
        |  floor(s * 1000000 + 0.5) / 1000000 AS sample
        |FROM v""".stripMargin,

    // luma/diff/cut/scene re-derived from the text bytes: exact
    // integer arithmetic end to end (no float anywhere)
    "q_video_scenes" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |fr AS (
        |  SELECT media_id, text, n, CAST(f AS INT) AS frame_idx
        |  FROM b, UNNEST(generate_series(0,
        |    greatest((n - 64) // 64 + 1, 1) - 1)) AS u(f)),
        |ch AS (
        |  SELECT media_id, frame_idx,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS v
        |  FROM fr, UNNEST(generate_series(frame_idx * 64 + 1,
        |    least(frame_idx * 64 + 64, n))) AS u(i)),
        |lum AS (
        |  SELECT media_id, frame_idx, CAST(sum(v) AS BIGINT) AS luma
        |  FROM ch GROUP BY 1, 2),
        |d AS (
        |  SELECT media_id, frame_idx, luma,
        |    CAST(coalesce(luma - lag(luma) OVER
        |      (PARTITION BY media_id ORDER BY frame_idx), 0) AS BIGINT)
        |      AS diff
        |  FROM lum),
        |c AS (
        |  SELECT *, CAST(CASE WHEN frame_idx > 0 AND abs(diff) >= 300
        |    THEN 1 ELSE 0 END AS INT) AS is_cut
        |  FROM d)
        |SELECT media_id, frame_idx, luma, diff, is_cut,
        |  CAST(sum(is_cut) OVER (PARTITION BY media_id
        |    ORDER BY frame_idx ROWS UNBOUNDED PRECEDING) AS INT)
        |    AS scene_id
        |FROM c""".stripMargin,

    "q_filter_cascade" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |    END AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |           t -> t IN ('the','a','an','of','and','to','is','in','it','that'))) AS INT)
        |    END AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars, n_tokens,
        |    floor(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE) * 10000 + 0.5) / 10000 AS digit_ratio,
        |    floor(n_stopwords / CAST(greatest(n_tokens, 1) AS DOUBLE) * 10000 + 0.5) / 10000 AS stopword_ratio
        |  FROM m),
        |f AS (
        |  SELECT *,
        |    CASE WHEN n_tokens < 20 THEN 'too_short'
        |         WHEN n_chars > 400 THEN 'too_long'
        |         WHEN digit_ratio > 0.2 THEN 'digit_heavy'
        |         WHEN stopword_ratio < 0.03 THEN 'low_stopword'
        |         ELSE 'pass' END AS first_fail
        |  FROM r)
        |SELECT doc_id, n_chars, n_tokens, digit_ratio, stopword_ratio,
        |  first_fail, CAST(first_fail = 'pass' AS INT) AS pass
        |FROM f""".stripMargin,

    "q_domain_cap" ->
      """SELECT doc_id, source, n_chars, rn FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rn
        |  FROM documents)
        |WHERE rn <= 10""".stripMargin,

    "q_split_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN rn * 100 <= n * 80 THEN 'train'
        |       WHEN rn * 100 <= n * 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, CAST(t.tf AS INT) AS tf,
        |    CAST(d.df AS INT) AS df,
        |    floor(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)) * 10000 + 0.5) / 10000 AS tfidf
        |  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term ASC) AS INT) AS rank
        |FROM scored QUALIFY rank <= 3""".stripMargin,

    "q_seq_pack" ->
      """WITH RECURSIVE docs AS (
        |  SELECT CAST(doc_id % 8 AS INT) AS shard, doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |    END AS n_tokens,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack(shard, rn, doc_id, n_tokens, seq_id, used, token_offset) AS (
        |  SELECT shard, rn, doc_id, n_tokens, 0, n_tokens, 0
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
        |    CASE WHEN p.used + d.n_tokens <= 256 THEN p.seq_id ELSE p.seq_id + 1 END,
        |    CASE WHEN p.used + d.n_tokens <= 256 THEN p.used + d.n_tokens ELSE d.n_tokens END,
        |    CASE WHEN p.used + d.n_tokens <= 256 THEN p.used ELSE 0 END
        |  FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT doc_id, shard, CAST(seq_id AS INT) AS seq_id, n_tokens,
        |  CAST(token_offset AS INT) AS token_offset
        |FROM pack""".stripMargin,

    // best-fit-decreasing (shared recursive CTE below): rows + layout
    "q_seq_pack_bfd" ->
      s"""$BfdPackCte
        |SELECT doc_id, shard, CAST(seq_id AS INT) AS seq_id, n_tokens,
        |  CAST(token_offset AS INT) AS token_offset
        |FROM pack""".stripMargin,

    // the export layout: same packing + per-shard sequence shuffle
    // (dense_rank over the md5 of (shard, seq_id))
    "q_training_layout" ->
      s"""$BfdPackCte
        |SELECT doc_id, shard, CAST(seq_id AS INT) AS seq_id, n_tokens,
        |  CAST(token_offset AS INT) AS token_offset,
        |  CAST(dense_rank() OVER (PARTITION BY shard
        |    ORDER BY md5(CAST(shard AS VARCHAR) || ':' ||
        |      CAST(CAST(seq_id AS INT) AS VARCHAR)), seq_id) AS INT)
        |    AS seq_pos
        |FROM pack""".stripMargin,

    "q_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
        |  FROM documents)
        |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df_docs
        |FROM toks GROUP BY term
        |ORDER BY tf DESC, term ASC LIMIT 20""".stripMargin,

    // adjacent-bigram PMI in micro-nats over >=2-token docs; same
    // ((c_ab*N)*N)/((M*c_a)*c_b) parenthesization as the engine
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |t2 AS (SELECT * FROM toks WHERE len(t) >= 2),
        |uni AS (SELECT tok, count(*) AS c_uni FROM (
        |  SELECT unnest(t) AS tok FROM t2) GROUP BY 1),
        |tot AS (SELECT CAST(sum(len(t)) AS DOUBLE) AS nn,
        |  CAST(sum(len(t) - 1) AS DOUBLE) AS m FROM t2),
        |bg AS (
        |  SELECT t[i] AS a, t[i + 1] AS b, t[i] || ' ' || t[i + 1] AS bigram
        |  FROM t2, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
        |cb AS (SELECT bigram, min(a) AS a, min(b) AS b, count(*) AS c_ab
        |  FROM bg GROUP BY 1 HAVING count(*) >= 10)
        |SELECT cb.bigram, cb.c_ab, ua.c_uni AS c_a, ub.c_uni AS c_b,
        |  CAST(floor(ln(CAST(cb.c_ab AS DOUBLE) * tot.nn * tot.nn /
        |      (tot.m * CAST(ua.c_uni AS DOUBLE) * ub.c_uni))
        |    * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
        |FROM cb JOIN uni ua ON ua.tok = cb.a
        |JOIN uni ub ON ub.tok = cb.b CROSS JOIN tot""".stripMargin,

    // PSI drift terms: 20 cent-width buckets over observed rows,
    // Laplace-smoothed shares, one groupBy with conditional counts
    // same exact integer moments, same single division+sqrt op order
    // (IEEE ops on identical exact inputs land on identical bits)
    "q_corr" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS HUGEINT) AS x,
        |    CAST(floor(value * 100 + 0.5) AS HUGEINT) AS y
        |  FROM events),
        |g AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
        |    sum(x*x) AS sxx, sum(y*y) AS syy
        |  FROM e GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
        |    CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
        |      / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |           * CAST(n*syy - sy*sy AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT)
        |  END AS corr_micro
        |FROM g""".stripMargin,

    // chi-square terms re-derived cell by cell in the same integer
    // micro arithmetic over HUGEINT (// = floor div; all terms'
    // denominators positive, numerators are squares)
    "q_chi2_assoc" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |tot AS (
        |  SELECT lang, source, n,
        |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS row_n,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS col_n,
        |    CAST(sum(n) OVER () AS BIGINT) AS grand_n
        |  FROM cells)
        |SELECT lang, source, n, row_n, col_n,
        |  CAST(((CAST(n AS HUGEINT) * grand_n - CAST(row_n AS HUGEINT) * col_n)
        |      * (CAST(n AS HUGEINT) * grand_n - CAST(row_n AS HUGEINT) * col_n)
        |      * 1000000)
        |    // (CAST(row_n AS HUGEINT) * col_n * grand_n) AS BIGINT)
        |    AS chi2_term_micro
        |FROM tot""".stripMargin,

    // per-group exact top-5; the two-sided MG guarantee is a theorem
    // under any merge order, so sketch_ok collapses to constant 1
    "q_topk_grouped" ->
      """WITH toks AS (
        |  SELECT source, unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS tok
        |  FROM documents),
        |cnt AS (SELECT source, tok AS item, count(*) AS exact_cnt
        |        FROM toks GROUP BY 1, 2)
        |SELECT source, item, exact_cnt, 1 AS sketch_ok
        |FROM cnt
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY exact_cnt DESC, item ASC) <= 5""".stripMargin,

    // salted join == plain join, row-exact
    "q_join_salted" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS total_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,

    // roundtrip: every good row recovered exactly; the two planted
    // bad lines surface only in the audit count
    "q_ingest_jsonl" ->
      """SELECT doc_id, text, lang, source, n_chars,
        |  CAST(2 AS BIGINT) AS n_bad
        |FROM documents""".stripMargin,

    // final state = everything from the post-delete append plus the
    // earlier commits minus the deleted type; both flags are
    // deterministic (DataSketches hashing is), so the oracle pins 1
    "q_mv_hll" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS exact_users,
        |  1 AS hll_ok, 1 AS incr_ok
        |FROM events
        |WHERE event_id % 3 = 2 OR event_type <> 'scroll'
        |GROUP BY 1""".stripMargin,

    // deterministic sketch => deterministic flag; exact twin rides
    "q_stream_hll" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users, 1 AS hll_ok
        |FROM events GROUP BY 1""".stripMargin,

    // the reservoir is an order statistic: k largest md5-prefix
    // priorities per key (13 lowercase hex chars — string order ==
    // numeric order), ties to the smaller id
    "q_stream_sample" ->
      """SELECT event_type, event_id, CAST(rnk AS INT) AS rank
        |FROM (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY substr(md5(CAST(event_id AS VARCHAR)), 1, 13) DESC,
        |        event_id ASC) AS rnk
        |  FROM events)
        |WHERE rnk <= 10""".stripMargin,

    "q_stream_upsert" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |  value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "q_drift_ks" ->
      // exact integers end to end: cumulative-count cross difference,
      // one integral division to micro-units at the end
      """WITH t AS (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS r
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT g, v,
        |    CAST(sum(r) AS BIGINT) AS c1,
        |    CAST(sum(1 - r) AS BIGINT) AS c2
        |  FROM t GROUP BY 1, 2),
        |cum AS (SELECT g, c1, c2,
        |    CAST(sum(c1) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum2,
        |    CAST(sum(c1) OVER (PARTITION BY g) AS BIGINT) AS n1,
        |    CAST(sum(c2) OVER (PARTITION BY g) AS BIGINT) AS n2
        |  FROM c)
        |SELECT g AS event_type, n1 AS n_ref, n2 AS n_cur,
        |  CAST(max(abs(cum1 * n2 - cum2 * n1)) * 1000000
        |    // (n1 * n2) AS BIGINT) AS ks_micro
        |FROM cum WHERE n1 > 0 AND n2 > 0
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_drift_psi" ->
      """WITH e AS (
        |  SELECT greatest(least(CAST(floor(
        |      CAST(floor(value * 100 + 0.5) AS BIGINT) / 500) AS BIGINT),
        |      19), 0) AS bucket,
        |    (event_id % 2 = 0) AS is_ref
        |  FROM events),
        |c AS (SELECT CAST(bucket AS INT) AS bucket,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
        |  CAST(sum(n_cur) AS BIGINT) AS tc FROM c)
        |SELECT bucket, n_ref, n_cur,
        |  CAST(floor((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 20 AS DOUBLE)
        |      - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 20 AS DOUBLE))
        |    * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 20 AS DOUBLE))
        |      / (CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 20 AS DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) AS psi_term_micro
        |FROM c CROSS JOIN t""".stripMargin,

    "q_dsir_score" ->
      """WITH b AS (
        |  SELECT doc_id, lang, substr(md5(unnest(
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END)),
        |    1, 2) AS bk
        |  FROM documents),
        |cc AS (SELECT bk, count(*) AS cc FROM b GROUP BY bk),
        |ct AS (SELECT bk, count(*) AS ct FROM b WHERE lang = 'en'
        |       GROUP BY bk),
        |tot AS (SELECT (SELECT sum(cc) FROM cc) AS tc,
        |               (SELECT sum(ct) FROM ct) AS tt),
        |w AS (
        |  SELECT cc.bk,
        |    ln((COALESCE(ct.ct, 0) + 1) / CAST(t.tt + 256 AS DOUBLE)) -
        |    ln((cc.cc + 1) / CAST(t.tc + 256 AS DOUBLE)) AS lr
        |  FROM cc LEFT JOIN ct USING (bk) CROSS JOIN tot t)
        |SELECT b.doc_id, count(*) AS n_toks,
        |  floor(avg(w.lr) * 10000 + 0.5) / 10000 AS dsir_score
        |FROM b JOIN w ON w.bk = b.bk
        |GROUP BY b.doc_id""".stripMargin,

    "q_dsir_select" ->
      """WITH b AS (
        |  SELECT doc_id, lang, substr(md5(unnest(
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END)),
        |    1, 2) AS bk
        |  FROM documents),
        |cc AS (SELECT bk, count(*) AS cc FROM b GROUP BY bk),
        |ct AS (SELECT bk, count(*) AS ct FROM b WHERE lang = 'en'
        |       GROUP BY bk),
        |tot AS (SELECT (SELECT sum(cc) FROM cc) AS tc,
        |               (SELECT sum(ct) FROM ct) AS tt),
        |w AS (
        |  SELECT cc.bk,
        |    ln((COALESCE(ct.ct, 0) + 1) / CAST(t.tt + 256 AS DOUBLE)) -
        |    ln((cc.cc + 1) / CAST(t.tc + 256 AS DOUBLE)) AS lr
        |  FROM cc LEFT JOIN ct USING (bk) CROSS JOIN tot t),
        |scored AS (
        |  SELECT b.doc_id, count(*) AS n_toks,
        |    floor(avg(w.lr) * 10000 + 0.5) / 10000 AS dsir_score
        |  FROM b JOIN w ON w.bk = b.bk
        |  GROUP BY b.doc_id)
        |SELECT doc_id, n_toks, dsir_score FROM scored
        |WHERE dsir_score >=
        |  (SELECT quantile_cont(dsir_score, 0.75) FROM scored)""".stripMargin,

    "q_epoch_weights" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |    END AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |           t -> t IN ('the','a','an','of','and','to','is','in','it','that'))) AS INT)
        |    END AS n_stopwords
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
        |      least(floor(n_stopwords / CAST(greatest(n_tokens, 1) AS DOUBLE) * 10000 + 0.5) / 10000 * 5.0, 1.0) * 0.3 +
        |      (1.0 - least(floor(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE) * 10000 + 0.5) / 10000 * 10.0, 1.0)) * 0.3) * 10000 + 0.5) / 10000 AS quality_score
        |  FROM m),
        |t AS (
        |  SELECT quantile_cont(quality_score, 0.75) AS p75,
        |    quantile_cont(quality_score, 0.5) AS p50,
        |    quantile_cont(quality_score, 0.25) AS p25 FROM q)
        |SELECT doc_id, quality_score,
        |  CAST(CASE WHEN quality_score >= t.p75 THEN 4
        |       WHEN quality_score >= t.p50 THEN 2
        |       WHEN quality_score >= t.p25 THEN 1
        |       ELSE 0 END AS INT) AS n_epochs
        |FROM q CROSS JOIN t""".stripMargin,

    "q_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, h,
        |    CAST(CASE WHEN ascii(substr(h, 1, 1)) <= 57
        |         THEN ascii(substr(h, 1, 1)) - 48
        |         ELSE ascii(substr(h, 1, 1)) - 87 END AS INT) AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY h, doc_id) AS INT) AS pos
        |FROM s""".stripMargin,

    "q_audio_frames" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |fr AS (
        |  SELECT media_id, text, n, CAST(f AS INT) AS frame_idx
        |  FROM b, UNNEST(generate_series(0,
        |    greatest((n - 32) // 16 + 1, 1) - 1)) AS u(f)),
        |ch AS (
        |  SELECT media_id, frame_idx, i,
        |    ascii(substr(text, CAST(i AS INT), 1)) - 128 AS s
        |  FROM fr, UNNEST(generate_series(frame_idx * 16 + 1,
        |    least(frame_idx * 16 + 32, n))) AS u(i)),
        |chl AS (
        |  SELECT media_id, frame_idx, s,
        |    lag(s) OVER (PARTITION BY media_id, frame_idx ORDER BY i)
        |      AS prev
        |  FROM ch)
        |SELECT media_id, frame_idx, count(*) AS n_samples,
        |  floor(sum(CAST(s AS BIGINT) * s) / CAST(count(*) AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS energy,
        |  CASE WHEN count(*) < 2 THEN 0.0 ELSE
        |    floor((count(*) FILTER (prev IS NOT NULL
        |        AND (s < 0) <> (prev < 0)))
        |      / CAST(count(*) - 1 AS DOUBLE) * 1000000 + 0.5) / 1000000
        |  END AS zcr
        |FROM chl GROUP BY media_id, frame_idx""".stripMargin,

    // bloom point lookup: every doc whose fingerprint equals doc 42's
    // (identical texts share a fingerprint, so this may be >1 row)
    "q_snapshot_bloomskip" ->
      """WITH fp AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, fp FROM fp
        |WHERE fp = (SELECT fp FROM fp WHERE doc_id = 42)""".stripMargin,

    // shallow clone: source = v1∪v2 minus the deleted 'de' docs;
    // clone = the fork (v1∪v2) plus its own post-fork append
    "q_snapshot_clone" ->
      """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
        |src AS (SELECT * FROM base
        |        WHERE (doc_id % 2 = 0 OR doc_id % 4 = 1)
        |          AND lang <> 'de'),
        |cln AS (SELECT * FROM base
        |        WHERE doc_id % 2 = 0 OR doc_id % 4 = 1 OR doc_id % 4 = 3)
        |SELECT 'source' AS tbl, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM src GROUP BY lang
        |UNION ALL
        |SELECT 'clone', lang, count(*), CAST(sum(n_chars) AS BIGINT)
        |FROM cln GROUP BY lang""".stripMargin,

    "q_snapshot_delete" ->
      // DELETE WHERE semantics: a row survives when the predicate is
      // FALSE or NULL — hence the coalesce, not plain NOT
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE NOT coalesce(lang = 'en' AND n_chars < 200, false)"""
        .stripMargin,

    "q_snapshot_import" ->
      // adopted external parquet + partitioned COW DELETE: final
      // state re-derived from the raw table (delete survivors =
      // predicate FALSE or NULL)
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 3 = 0 AND NOT coalesce(n_chars < 150, false)"""
        .stripMargin,

    "q_ingest_delta" ->
      // rows served THROUGH the mirrored _delta_log (readDelta),
      // incl. a column-mapping rename (n_chars -> chars resolves via
      // physicalName): final state re-derived from the raw table —
      // stale rows from unresolved removes would surface as extras
      """SELECT doc_id, source, n_chars AS chars, lang FROM documents
        |WHERE doc_id % 3 = 0 AND NOT coalesce(n_chars < 200, false)"""
        .stripMargin,

    "q_ingest_delta_cp" ->
      // rows served through readDelta's CHECKPOINT resolution (the
      // covered JSON commits are deleted): final state re-derived
      // from the raw table — a checkpoint that dropped a live file or
      // resurrected a tombstone surfaces as missing/extra rows.
      // Deletes are cumulative, so the last predicate governs.
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 4 = 1 AND NOT coalesce(n_chars < 170, false)"""
        .stripMargin,

    "q_snapshot_export_delta_mor" ->
      // rows served through the full MOR round trip (graft DV commit
      // -> Delta descriptor export -> readDelta DV resolution): the
      // survivor set re-derived logically — a mis-serialized bitmap,
      // a dropped (path, dvUniqueId) re-pairing, or an un-unioned
      // second delete surfaces as extra (resurrected) or missing rows
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 4 = 3 AND NOT coalesce(n_chars < 130, false)
        |  AND NOT coalesce(lang = 'zh', false)""".stripMargin,

    "q_snapshot_export_delta_mor_merge" ->
      // rows served through the MOR MERGE round trip (matched rows
      // retired by DV + replacements appended in one commit, exported
      // as Delta descriptors, resolved by readDelta): survivors =
      // unmatched base rows, plus the update rows verbatim — a
      // resurrected pre-image (bad bitmap) or a lost replacement
      // (dropped append) surfaces as extra/missing rows
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 4 = 3 AND NOT coalesce(n_chars < 140, false)
        |UNION ALL
        |SELECT doc_id, concat('u_', source) AS source, n_chars, lang
        |FROM documents
        |WHERE (doc_id % 4 = 3 AND n_chars < 140) OR doc_id % 40 = 0"""
        .stripMargin,

    "q_snapshot_update_mor" ->
      // rows served through the MOR UPDATE (matched rows retired by
      // DV + transformed images appended in one commit): SQL UPDATE
      // re-derived as a CASE per SET column over the pre-update row
      // — a resurrected pre-image or a lost/mis-transformed image
      // surfaces as extra/missing/wrong rows
      """SELECT doc_id, source,
        |  CASE WHEN n_chars < 140 THEN n_chars + 1000
        |       ELSE n_chars END AS n_chars,
        |  CASE WHEN n_chars < 140 THEN 'xx' ELSE lang END AS lang
        |FROM documents WHERE doc_id % 4 = 1""".stripMargin,

    "q_ingest_delta_dv" ->
      // rows served through readDelta's DELETION-VECTOR resolution:
      // each file's survivors re-derived by row rank (files are
      // written sorted by doc_id, so parquet row_index == rank) —
      // fa loses every 7th row to an on-disk DV, fb every 5th to an
      // inline DV, fc is untouched
      """WITH b AS (SELECT doc_id, source, n_chars, lang FROM documents),
        |a7 AS (SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS ridx
        |       FROM b WHERE doc_id % 4 = 2),
        |b5 AS (SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS ridx
        |       FROM b WHERE doc_id % 4 = 3)
        |SELECT doc_id, source, n_chars, lang FROM a7 WHERE ridx % 7 <> 0
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang FROM b5 WHERE ridx % 5 <> 0
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang FROM b WHERE doc_id % 4 = 1"""
        .stripMargin,

    "q_snapshot_export_iceberg" ->
      // rows served THROUGH the mirrored Iceberg v2 tree (readIceberg
      // over IcebergMirror's avro manifests), incl. a name-mapping
      // rename (n_chars -> chars, field id stable): final state
      // re-derived from the raw table — a stale tombstone or a
      // misresolved identity-partition value surfaces as extras/gaps
      """SELECT doc_id, source, n_chars AS chars, lang FROM documents
        |WHERE doc_id % 3 = 1 AND NOT coalesce(n_chars < 150, false)"""
        .stripMargin,

    "q_snapshot_export_iceberg_mor" ->
      // rows served through the full Iceberg MOR round trip (graft DV
      // commit -> puffin blob + DELETE manifest export, v2 tree
      // upgraded to v3 in place -> readIceberg DV resolution): the
      // survivor set re-derived logically — a mis-framed blob, a
      // wrong content_offset, a stale un-tombstoned first-delete
      // entry, or a sequence-number regression surfaces as extra
      // (resurrected) or missing rows
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 4 = 1 AND NOT coalesce(n_chars < 140, false)
        |  AND NOT coalesce(lang = 'es', false)""".stripMargin,

    "q_ingest_iceberg_prune" ->
      // rows served through readIcebergWhere's FILE PRUNING (identity
      // partition values + manifest bounds): exactness re-derived
      // from the raw table — an unsound skip loses rows, a broken
      // bounds decode serves extras
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 3 = 2 AND lang = 'en' AND n_chars >= 150"""
        .stripMargin,

    "q_ingest_delta_prune" ->
      // rows served through readDeltaWhere's FILE PRUNING
      // (add.partitionValues + add.stats min/max): exactness
      // re-derived from the raw table
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE doc_id % 5 = 4 AND lang = 'de' AND n_chars >= 150"""
        .stripMargin,

    "q_ingest_iceberg" ->
      // rows served through readIceberg over a HAND-BUILT foreign v2
      // tree: fa (bucket 7) carried EXISTING through a manifest
      // rewrite, fc tombstoned status=2, fb (bucket 9) added by the
      // second snapshot; `bucket` is NOT in the data files — the
      // column-projection rule supplies it from partition metadata
      """SELECT doc_id, source, n_chars, 7 AS bucket FROM documents
        |WHERE doc_id % 4 = 2
        |UNION ALL
        |SELECT doc_id, source, n_chars, 9 FROM documents
        |WHERE doc_id % 4 = 3""".stripMargin,

    "q_ingest_iceberg_posdel" ->
      // rows served through readIceberg's POSITION-DELETE resolution:
      // fa's survivors re-derived by row rank (files written sorted,
      // so parquet row_index == rank) — every 7th row of fa deleted
      // by a sequence-2 delete file; the sequence-1 delete targeting
      // fb must NOT apply (fb's data sequence is 2)
      """WITH b AS (SELECT doc_id, source, n_chars FROM documents),
        |a7 AS (SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS ridx
        |       FROM b WHERE doc_id % 4 = 2)
        |SELECT doc_id, source, n_chars FROM a7 WHERE ridx % 7 <> 0
        |UNION ALL
        |SELECT doc_id, source, n_chars FROM b WHERE doc_id % 4 = 3"""
        .stripMargin,

    "q_catalog_branch" ->
      // the MERGED (post-branch-advance) fact+dim pair re-derived
      // from raw documents: fact = mod-3==1 docs surviving the
      // n_chars >= 250 delete, dim = per-lang aggregates over that
      // SAME state
      """WITH f AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id % 3 = 1 AND n_chars >= 250),
        |d AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS tot_chars
        |  FROM f GROUP BY lang)
        |SELECT f.lang, f.doc_id, f.n_chars, d.n_docs, d.tot_chars
        |FROM f JOIN d USING (lang)""".stripMargin,

    "q_ingest_iceberg_changes" ->
      // both changelog ordinals re-derived logically: a dynamic
      // partition overwrite deletes the partition's old rows and
      // inserts the new set — ordinal 1 rewrites 'en', ordinal 2 'zh'
      """WITH b AS (
        |  SELECT doc_id, source, n_chars, lang FROM documents
        |  WHERE doc_id % 3 = 0)
        |SELECT doc_id, source, n_chars, lang,
        |  'delete' AS _change_type, CAST(1 AS INT) AS _change_ordinal
        |FROM b WHERE lang = 'en'
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'insert', CAST(1 AS INT)
        |FROM b WHERE lang = 'en' AND n_chars >= 150
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'delete', CAST(2 AS INT)
        |FROM b WHERE lang = 'zh'
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'insert', CAST(2 AS INT)
        |FROM b WHERE lang = 'zh' AND n_chars >= 160""".stripMargin,

    "q_stream_iceberg_changes" ->
      // the accumulated STREAMED changelog re-derived logically per
      // sequence: 1 = the parentless full-insert feed, 2 = the 'en'
      // partition overwrite (delete old set, insert the filtered
      // set), 3 = the 'zh' one — a double-applied replay, a missed
      // tombstone, or a wrong sequence stamp fails the row hash
      """WITH b AS (
        |  SELECT doc_id, source, n_chars, lang FROM documents
        |  WHERE doc_id % 3 = 0)
        |SELECT doc_id, source, n_chars, lang,
        |  'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_sequence
        |FROM b
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'delete', CAST(2 AS BIGINT)
        |FROM b WHERE lang = 'en'
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'insert', CAST(2 AS BIGINT)
        |FROM b WHERE lang = 'en' AND n_chars >= 150
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'delete', CAST(3 AS BIGINT)
        |FROM b WHERE lang = 'zh'
        |UNION ALL
        |SELECT doc_id, source, n_chars, lang, 'insert', CAST(3 AS BIGINT)
        |FROM b WHERE lang = 'zh' AND n_chars >= 160""".stripMargin,

    "q_catalog_asof" ->
      // the TAGGED (pre-advance) fact+dim pair re-derived from raw
      // documents: fact v1 = even doc_ids, dim v1 = per-lang counts
      // over that SAME state — a catalog serving any later version of
      // either table (or a mixed pair) fails the hash
      """WITH f AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id % 2 = 0),
        |d AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS tot_chars
        |  FROM f GROUP BY lang)
        |SELECT f.lang, f.doc_id, f.n_chars, d.n_docs, d.tot_chars
        |FROM f JOIN d USING (lang)""".stripMargin,

    "q_ingest_iceberg_v3dv" ->
      // rows served through readIceberg's v3 PUFFIN-DV resolution:
      // fa's survivors re-derived by row rank — every 6th row of fa
      // deleted by a sequence-2 DV; the sequence-1 DV targeting fb
      // must NOT apply (fb's data sequence is 2)
      """WITH b AS (SELECT doc_id, source, n_chars FROM documents),
        |a6 AS (SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS ridx
        |       FROM b WHERE doc_id % 4 = 2)
        |SELECT doc_id, source, n_chars FROM a6 WHERE ridx % 6 <> 0
        |UNION ALL
        |SELECT doc_id, source, n_chars FROM b WHERE doc_id % 4 = 3"""
        .stripMargin,

    "q_ingest_iceberg_eqdel" ->
      // rows served through readIceberg's EQUALITY-DELETE resolution:
      // the global sequence-2 delete removes doc_id ≡ 6 (mod 12) from
      // fa (data seq 1 < 2); the bucket-7-scoped delete lists values
      // that live only in bucket 9 (scope mismatch — no effect); the
      // global delete targeting fb is at the SAME sequence as fb's
      // data (strict ordering — no effect)
      """SELECT doc_id, source, n_chars, 7 AS bucket FROM documents
        |WHERE doc_id % 4 = 2 AND doc_id % 12 <> 6
        |UNION ALL
        |SELECT doc_id, source, n_chars, 9 FROM documents
        |WHERE doc_id % 4 = 3""".stripMargin,

    "q_snapshot_evolve" ->
      // unpartitioned v1 + evolved-spec v2 + migration + partitioned
      // DELETE: layout transitions must be invisible in the rows
      """SELECT doc_id, source, n_chars, lang FROM documents
        |WHERE NOT coalesce(n_chars < 150, false)""".stripMargin,

    "q_snapshot_cdc" ->
      // net feed: old values of updated rows leave (delete), new
      // values + brand-new keys arrive (insert); untouched rows that
      // merely shared a rewritten file are collapsed away
      """SELECT doc_id, lang, n_chars, 'delete' AS _change_type
        |FROM documents WHERE doc_id % 10 = 0
        |UNION ALL
        |SELECT doc_id, lang, n_chars + 1000, 'insert'
        |FROM documents WHERE doc_id % 10 = 0
        |UNION ALL
        |SELECT doc_id + 1000000, lang, n_chars, 'insert'
        |FROM documents WHERE doc_id % 10 = 1""".stripMargin,

    "q_snapshot_skip" ->
      // the stat-pruned read returns exactly the band
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id >= 100 AND doc_id < 200""".stripMargin,

    "q_snapshot_skip_time" ->
      // the time band, exactly (events ts is TIMESTAMP(NANOS) in the
      // raw parquet; DuckDB compares naive micros like Spark reads)
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-12 00:00:00'""".stripMargin,

    "q_snapshot_zorder" ->
      // the 2D box, exactly — z-ordering changes files, never rows
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE user_id BETWEEN 2 AND 5
        |  AND value BETWEEN 10.0 AND 50.0""".stripMargin,

    "q_snapshot_restore" ->
      // post-restore the table IS its v1 state: the plain base table
      "SELECT doc_id, lang, n_chars FROM documents",

    "q_snapshot_constraint" ->
      // the violating batch never landed: the two conforming halves
      "SELECT doc_id, lang, n_chars FROM documents",

    "q_snapshot_optimize" ->
      // compaction must be row-invisible: the three mod-3 commits
      // cover the table, and the bin-packed rewrite changes files,
      // never rows
      "SELECT doc_id, lang, n_chars FROM documents",

    "q_snapshot_widen" ->
      // the widened table: every row under (bigint, double) — old
      // int-file rows read wide, appended rows carry the new column
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars AS DOUBLE) * 0.5
        |  END AS score
        |FROM documents""".stripMargin,

    "q_mv_minmax" ->
      // extrema MV after the delete: one GROUP BY over survivors
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
        |  min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars
        |FROM documents WHERE NOT coalesce(n_chars < 200, false)
        |GROUP BY lang""".stripMargin,

    "q_snapshot_rename" ->
      // the whole table under the renamed column
      """SELECT doc_id, lang, n_chars AS chars FROM documents""",

    "q_snapshot_drop" ->
      // old rows NULL (the dropped bytes stay buried), new rows the
      // re-added values
      """SELECT doc_id, lang, n_chars,
        |  CASE WHEN doc_id % 2 = 1 THEN 're:' || lang END AS source
        |FROM documents""".stripMargin,

    "q_snapshot_nullskip" ->
      // the NULL band: exactly the all-NULL half
      """SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,

    "q_snapshot_count" ->
      // survivors of the delete, counted (SQL DELETE semantics on the
      // predicate: NULL n_chars survives)
      """SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents
        |WHERE NOT coalesce(n_chars < 200, false)""".stripMargin,

    "q_snapshot_time_travel" ->
      // as-of between the commits = exactly v1: the plain base table
      "SELECT doc_id, lang, n_chars FROM documents",

    // streaming MV: full recompute over the final state (base+append
    // = whole table, DELETE drops n_chars<120) must equal the
    // stream-maintained rollup exactly
    "q_stream_mv" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM documents
        |WHERE NOT coalesce(n_chars < 120, false)
        |GROUP BY source""".stripMargin,

    "q_mv_refresh" ->
      // full recompute over the source's FINAL state (initial+append
      // = the whole table; MERGE re-scores doc_id%10=0 and adds
      // shifted %10=1 ids; DELETE drops lang='de') — must equal the
      // incrementally maintained MV exactly
      """WITH merged AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, n_chars
        |  FROM documents WHERE doc_id % 10 = 1),
        |final AS (
        |  SELECT * FROM merged WHERE NOT coalesce(lang = 'de', false))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM final GROUP BY lang""".stripMargin,

    "q_corpus_delta" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 4 <= 1 THEN 1
        |              WHEN doc_id % 4 = 2 THEN 2 ELSE 3 END AS version,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |    END AS nt
        |  FROM documents),
        |per AS (
        |  SELECT version, CAST(count(*) AS BIGINT) AS n_docs_added,
        |    CAST(0 AS BIGINT) AS n_docs_removed,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens_added,
        |    CAST(0 AS BIGINT) AS n_tokens_removed
        |  FROM m GROUP BY version)
        |SELECT version, n_docs_added, n_docs_removed, n_tokens_added,
        |  n_tokens_removed,
        |  CAST(sum(n_docs_added) OVER (ORDER BY version) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens_added) OVER (ORDER BY version) AS BIGINT)
        |    AS n_tokens
        |FROM per""".stripMargin,

    // heavy hitters: exact top-20 tokens (count desc, token asc); the
    // sketch's accuracy contract collapses to a constant ok-flag
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS item
        |  FROM documents)
        |SELECT item, count(*) AS exact_cnt, 1 AS within_bound
        |FROM toks GROUP BY item
        |ORDER BY exact_cnt DESC, item LIMIT 20""".stripMargin,

    // OHLC: open/close re-derived via rank-1 rows under the same
    // (ts, id) ordering
    "q_ohlc" ->
      """WITH r AS (
        |  SELECT event_type, date_trunc('week', ts) AS bucket, value,
        |    row_number() OVER (PARTITION BY event_type,
        |      date_trunc('week', ts) ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type,
        |      date_trunc('week', ts) ORDER BY ts DESC, event_id DESC)
        |      AS rn_d
        |  FROM events)
        |SELECT event_type, bucket,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_ticks
        |FROM r GROUP BY event_type, bucket""".stripMargin,

    // VWAP in the same micro-unit arithmetic: floor-rounded price
    // micros times integer weight, double division at the end only
    "q_vwap" ->
      """WITH w AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS pm,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS wt
        |  FROM events)
        |SELECT event_type, day, CAST(sum(wt) AS BIGINT) AS volume,
        |  CASE WHEN sum(wt) > 0 THEN
        |    floor(((CAST(sum(pm * wt) AS DOUBLE)
        |      / CAST(sum(wt) AS DOUBLE)) / 10000.0) * 10000.0 + 0.5)
        |      / 10000.0
        |  ELSE NULL END AS vwap
        |FROM w GROUP BY event_type, day""".stripMargin,

    // median/MAD re-derived with the same cent-rounding before the
    // threshold comparison
    "q_mad_outlier" ->
      """WITH med AS (
        |  SELECT event_type,
        |    floor(quantile_cont(value, 0.5) * 100 + 0.5) / 100 AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dv
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |    floor(quantile_cont(dv, 0.5) * 100 + 0.5) / 100 AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n_events, d.med, m2.mad,
        |  CAST(sum(CASE WHEN d.dv > 3.0 * m2.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m2 USING (event_type)
        |GROUP BY d.event_type, d.med, m2.mad""".stripMargin,

    // PageRank re-derived iteration by iteration in the same integer
    // micro-arithmetic (// is floor division; all terms positive, so
    // it matches the engine's truncating div exactly)
    "q_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'C' || o_custkey AS a, 'S' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS sc FROM deg),
        |i1 AS (
        |  SELECT d.src AS node,
        |    150000 + (850000 * coalesce(x.inc, 0)) // 1000000 AS sc
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst, sum(s.sc // d2.deg) AS inc
        |    FROM edges e JOIN s0 s ON s.node = e.src
        |    JOIN deg d2 ON d2.src = e.src GROUP BY e.dst) x
        |    ON x.dst = d.src),
        |i2 AS (
        |  SELECT d.src AS node,
        |    150000 + (850000 * coalesce(x.inc, 0)) // 1000000 AS sc
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst, sum(s.sc // d2.deg) AS inc
        |    FROM edges e JOIN i1 s ON s.node = e.src
        |    JOIN deg d2 ON d2.src = e.src GROUP BY e.dst) x
        |    ON x.dst = d.src),
        |i3 AS (
        |  SELECT d.src AS node,
        |    150000 + (850000 * coalesce(x.inc, 0)) // 1000000 AS sc
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst, sum(s.sc // d2.deg) AS inc
        |    FROM edges e JOIN i2 s ON s.node = e.src
        |    JOIN deg d2 ON d2.src = e.src GROUP BY e.dst) x
        |    ON x.dst = d.src)
        |SELECT i3.node, CAST(deg.deg AS BIGINT) AS degree,
        |  CAST(i3.sc AS BIGINT) AS rank_micro
        |FROM i3 JOIN deg ON deg.src = i3.node""".stripMargin,

    // triangles re-derived by the textbook a<b<c three-way join —
    // independent of the engine's degree orientation, which is a
    // pure enumeration strategy (each triangle is one {a,b,c} set
    // either way); per-node count = corner membership
    "q_triangle_count" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT unnest([a, b, c]) AS l_partkey FROM tri)
        |SELECT l_partkey, count(*) AS n_triangles
        |FROM corners GROUP BY l_partkey""".stripMargin,

    // native Misra-Gries sketch: the guarantee contract collapses to
    // a constant ok-flag over the exact top-20
    "q_topk_sketch" ->
      """WITH toks AS (
        |  SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS item
        |  FROM documents)
        |SELECT item, count(*) AS exact_cnt, 1 AS sketch_ok
        |FROM toks GROUP BY item
        |ORDER BY exact_cnt DESC, item LIMIT 20""".stripMargin,

    // blocked levenshtein resolution re-derived pair by pair; the
    // dirty name deletes one char at position p_partkey % (len-2) + 2
    "q_fuzzy_join" ->
      """WITH dirty AS (
        |  SELECT p_partkey,
        |    substr(p_name, 1,
        |      CAST(p_partkey % (length(p_name) - 2) + 1 AS INT)) ||
        |    substr(p_name,
        |      CAST(p_partkey % (length(p_name) - 2) + 3 AS INT))
        |      AS dirty_name
        |  FROM part),
        |dim AS (SELECT DISTINCT p_name AS matched_name FROM part),
        |cand AS (
        |  SELECT d.p_partkey, d.dirty_name, m.matched_name,
        |    CAST(levenshtein(d.dirty_name, m.matched_name) AS INT) AS dist
        |  FROM dirty d JOIN dim m
        |    ON substr(d.dirty_name, 1, 1) = substr(m.matched_name, 1, 1)
        |   AND abs(length(d.dirty_name) - length(m.matched_name)) <= 2
        |  WHERE levenshtein(d.dirty_name, m.matched_name) <= 2),
        |g AS (
        |  SELECT p_partkey, dirty_name, matched_name, dist,
        |    CAST(count(*) OVER (PARTITION BY p_partkey) AS INT)
        |      AS n_candidates,
        |    row_number() OVER (PARTITION BY p_partkey
        |      ORDER BY dist, matched_name) AS rk
        |  FROM cand)
        |SELECT p_partkey, dirty_name, matched_name, dist, n_candidates
        |FROM g WHERE rk = 1""".stripMargin,

    // ER clusters re-derived: same blocked pair predicate, transitive
    // closure via the recursive reach CTE (the CC oracle pattern),
    // singletons label themselves through the left join back
    "q_er_clusters" ->
      """WITH RECURSIVE dirty AS (
        |  SELECT p_partkey,
        |    substr(p_name, 1,
        |      CAST(p_partkey % (length(p_name) - 2) + 1 AS INT)) ||
        |    substr(p_name,
        |      CAST(p_partkey % (length(p_name) - 2) + 3 AS INT))
        |      AS dirty_name
        |  FROM part),
        |recs AS (
        |  SELECT p_partkey * 2 AS rec_id, p_name AS name FROM part
        |  UNION ALL
        |  SELECT p_partkey * 2 + 1, dirty_name FROM dirty),
        |e0 AS (
        |  SELECT a.rec_id AS src, b.rec_id AS dst
        |  FROM recs a JOIN recs b
        |    ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
        |   AND a.rec_id < b.rec_id
        |   AND abs(length(a.name) - length(b.name)) <= 2
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |edges AS (SELECT src, dst FROM e0
        |          UNION SELECT dst AS src, src AS dst FROM e0),
        |reach(node, r) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach
        |  JOIN edges ON reach.r = edges.src
        |  WHERE edges.dst <> reach.node),
        |comp AS (
        |  SELECT node, least(node, min(r)) AS comp
        |  FROM reach GROUP BY node),
        |lab AS (
        |  SELECT r.rec_id, coalesce(c.comp, r.rec_id) AS entity_id
        |  FROM recs r LEFT JOIN comp c ON c.node = r.rec_id)
        |SELECT rec_id, entity_id,
        |  count(*) OVER (PARTITION BY entity_id) AS n_members
        |FROM lab""".stripMargin,

    // per-column profile re-derived column by column; numeric stats
    // use the same floor-based rounding as the engine
    "q_profile" ->
      """SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  floor(CAST(min(o_orderkey) AS DOUBLE) * 10000 + 0.5) / 10000 AS min_num,
        |  floor(CAST(max(o_orderkey) AS DOUBLE) * 10000 + 0.5) / 10000 AS max_num,
        |  floor(avg(o_orderkey) * 10000 + 0.5) / 10000 AS avg_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_custkey),
        |  floor(CAST(min(o_custkey) AS DOUBLE) * 10000 + 0.5) / 10000,
        |  floor(CAST(max(o_custkey) AS DOUBLE) * 10000 + 0.5) / 10000,
        |  floor(avg(o_custkey) * 10000 + 0.5) / 10000,
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  NULL, NULL, NULL, min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*),
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_totalprice),
        |  floor(CAST(min(o_totalprice) AS DOUBLE) * 10000 + 0.5) / 10000,
        |  floor(CAST(max(o_totalprice) AS DOUBLE) * 10000 + 0.5) / 10000,
        |  floor(avg(o_totalprice) * 10000 + 0.5) / 10000,
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*),
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderdate),
        |  NULL, NULL, NULL,
        |  CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR),
        |  CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  NULL, NULL, NULL, min(o_orderpriority), max(o_orderpriority)
        |FROM orders""".stripMargin,

    // per key column: counts from a groupBy, top key = most frequent
    // (ties to the smaller rendering), entropy as per-key floored
    // micro-nat terms summed (identical parenthesization both sides)
    "q_skew_diag" ->
      """WITH c1 AS (SELECT coalesce(CAST(event_type AS VARCHAR), ' null')
        |    AS k, count(*) AS cnt FROM events GROUP BY 1),
        |t1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c1),
        |b1 AS (SELECT t1.n AS n_rows, count(*) AS n_keys,
        |    max(cnt) AS top_cnt,
        |    CAST(sum(CAST(floor(cnt * (-ln(CAST(cnt AS DOUBLE) / t1.n))
        |      * 1000000.0 / t1.n + 0.5) AS BIGINT)) AS BIGINT)
        |      AS entropy_micro
        |  FROM c1 CROSS JOIN t1 GROUP BY t1.n),
        |k1 AS (SELECT min(k) AS top_key FROM c1, b1 WHERE cnt = b1.top_cnt),
        |c2 AS (SELECT coalesce(CAST(user_id AS VARCHAR), ' null')
        |    AS k, count(*) AS cnt FROM events GROUP BY 1),
        |t2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c2),
        |b2 AS (SELECT t2.n AS n_rows, count(*) AS n_keys,
        |    max(cnt) AS top_cnt,
        |    CAST(sum(CAST(floor(cnt * (-ln(CAST(cnt AS DOUBLE) / t2.n))
        |      * 1000000.0 / t2.n + 0.5) AS BIGINT)) AS BIGINT)
        |      AS entropy_micro
        |  FROM c2 CROSS JOIN t2 GROUP BY t2.n),
        |k2 AS (SELECT min(k) AS top_key FROM c2, b2 WHERE cnt = b2.top_cnt),
        |c3 AS (SELECT coalesce(CAST(o_custkey AS VARCHAR), ' null')
        |    AS k, count(*) AS cnt FROM orders GROUP BY 1),
        |t3 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c3),
        |b3 AS (SELECT t3.n AS n_rows, count(*) AS n_keys,
        |    max(cnt) AS top_cnt,
        |    CAST(sum(CAST(floor(cnt * (-ln(CAST(cnt AS DOUBLE) / t3.n))
        |      * 1000000.0 / t3.n + 0.5) AS BIGINT)) AS BIGINT)
        |      AS entropy_micro
        |  FROM c3 CROSS JOIN t3 GROUP BY t3.n),
        |k3 AS (SELECT min(k) AS top_key FROM c3, b3 WHERE cnt = b3.top_cnt)
        |SELECT 'event_type' AS key_col, n_rows, n_keys, top_key, top_cnt,
        |  CAST(floor(top_cnt * 1000000.0 / n_rows) AS BIGINT)
        |    AS top_share_micro, entropy_micro
        |FROM b1 CROSS JOIN k1
        |UNION ALL
        |SELECT 'user_id', n_rows, n_keys, top_key, top_cnt,
        |  CAST(floor(top_cnt * 1000000.0 / n_rows) AS BIGINT),
        |  entropy_micro FROM b2 CROSS JOIN k2
        |UNION ALL
        |SELECT 'o_custkey', n_rows, n_keys, top_key, top_cnt,
        |  CAST(floor(top_cnt * 1000000.0 / n_rows) AS BIGINT),
        |  entropy_micro FROM b3 CROSS JOIN k3""".stripMargin,

    "q_corpus_stats" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(length(text) AS INT) AS nc,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |    END AS nt,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |v AS (SELECT count(DISTINCT term) AS vocab
        |      FROM (SELECT unnest(t) AS term FROM m)),
        |s AS (SELECT count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  floor(quantile_cont(nt, 0.5) * 100 + 0.5) / 100 AS p50_tokens,
        |  floor(quantile_cont(nt, 0.9) * 100 + 0.5) / 100 AS p90_tokens,
        |  floor(avg(nc) * 100 + 0.5) / 100 AS avg_chars
        |  FROM m)
        |SELECT s.n_docs, s.n_tokens, s.p50_tokens, s.p90_tokens,
        |  s.avg_chars, v.vocab
        |FROM s CROSS JOIN v""".stripMargin,

    // scalar-quantized ANN: the oracle re-derives per-dim bounds, the
    // 8-bit quantize/reconstruct round trip (identical floor
    // arithmetic), and the top-k ranking — all from the raw table
    "q_embed_sq_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (
        |  SELECT vec_id, i AS pos, v[i] AS x
        |  FROM e, UNNEST(generate_series(1, len(v))) AS g(i)),
        |b AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM x GROUP BY pos),
        |r AS (
        |  SELECT x.vec_id, list(CASE WHEN b.hi = b.lo THEN b.lo
        |      ELSE b.lo + floor((x.x - b.lo) * 255 / (b.hi - b.lo) + 0.5)
        |        * (b.hi - b.lo) / 255 END ORDER BY x.pos) AS recon
        |  FROM x JOIN b USING (pos) GROUP BY x.vec_id),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |p AS (
        |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
        |    floor(list_cosine_similarity(q.v, r.recon) * 10000 + 0.5)
        |      / 10000 AS cos_sim
        |  FROM q, r WHERE q.vec_id <> r.vec_id)
        |SELECT query_id, neighbor_id, cos_sim,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        |FROM p QUALIFY rank <= 5""".stripMargin,

    // BM25 re-derived term by term: tf/df/dl/N/Σdl are exact
    // integers, one ln per term, contributions floored to micro-units
    // and integer-summed (order-independent across engines)
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |                 (SELECT count(*) FROM toks) AS tok_total),
        |qt AS (SELECT DISTINCT doc_id AS query_id, t FROM tf
        |       WHERE doc_id < 5),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST(floor(
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
        |        * (tf.tf * CAST(2.2 AS DOUBLE))
        |        / (tf.tf + 1.2 * (0.25 + 0.75 *
        |            (CAST(l.dl AS DOUBLE) * s.n_docs / s.tok_total)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS micro
        |  FROM tf JOIN qt USING (t) JOIN dfreq d USING (t)
        |  JOIN dl l ON tf.doc_id = l.doc_id CROSS JOIN stats s
        |  WHERE tf.doc_id <> qt.query_id),
        |agg AS (
        |  SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_terms,
        |    CAST(sum(micro) AS BIGINT) AS score_micro
        |  FROM scored GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_terms, score_micro,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
        |FROM agg QUALIFY rank <= 10""".stripMargin,

    // semantic decontamination: best (rounded) benchmark cosine per
    // corpus vector, ties to the smallest benchmark id
    "q_semantic_decon" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id AS bench_id, v FROM e
        |      WHERE vec_id % 50 = 0 AND vec_id < 3200),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 50 <> 0),
        |p AS (
        |  SELECT c.vec_id, b.bench_id,
        |    floor(list_cosine_similarity(c.v, b.v) * 10000 + 0.5)
        |      / 10000 AS cs
        |  FROM c, b),
        |m AS (
        |  SELECT vec_id, max({'s': cs, 'negb': -bench_id}) AS best
        |  FROM p GROUP BY vec_id)
        |SELECT vec_id, best.s AS max_bench_sim,
        |  CAST(-best.negb AS BIGINT) AS bench_id,
        |  CAST(CASE WHEN best.s >= 0.4 THEN 1 ELSE 0 END AS INT)
        |    AS contaminated
        |FROM m""".stripMargin,

    // span overlap: distinct 8-gram windows per doc, shared = the gram
    // (keyed by md5, same as the engine) occurs in >= 2 docs
    "q_span_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) < 8 THEN []
        |         ELSE list_transform(generate_series(1, len(t) - 7),
        |           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' ||
        |                t[i + 3] || ' ' || t[i + 4] || ' ' || t[i + 5] || ' ' ||
        |                t[i + 6] || ' ' || t[i + 7]) END) AS grams
        |  FROM toks),
        |dg AS (
        |  SELECT doc_id, md5(gram) AS h
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g)),
        |sh AS (SELECT h FROM dg GROUP BY h HAVING count(*) >= 2),
        |m AS (
        |  SELECT dg.doc_id, count(*) AS ng,
        |    sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS ns
        |  FROM dg LEFT JOIN sh USING (h) GROUP BY dg.doc_id)
        |SELECT g.doc_id, CAST(coalesce(m.ng, 0) AS INT) AS n_grams,
        |  CAST(coalesce(m.ns, 0) AS INT) AS n_shared,
        |  floor(coalesce(m.ns, 0)
        |    / CAST(greatest(coalesce(m.ng, 0), 1) AS DOUBLE) * 10000 + 0.5)
        |    / 10000 AS overlap_ratio
        |FROM g LEFT JOIN m USING (doc_id)""".stripMargin,

    // streaming curation funnel: the oracle replays both micro-batches
    // (even ids, then odd ids vs batch-1's committed corpus) through
    // the exact-dedup + quality stages and rebuilds both ledger rows,
    // including the key-sorted attrition JSON
    "q_stream_curation" ->
      """WITH d AS (
        |  SELECT doc_id, text, CAST(doc_id % 2 AS INT) AS b,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents),
        |met AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tokens < 20 THEN 'too_short'
        |         WHEN n_chars > 400 THEN 'too_long'
        |         WHEN digit_ratio > 0.2 THEN 'digit_heavy'
        |         WHEN stopword_ratio < 0.03 THEN 'low_stopword'
        |         ELSE 'pass' END AS first_fail
        |  FROM (
        |    SELECT doc_id, n_chars, n_tokens,
        |      floor(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE)
        |        * 10000 + 0.5) / 10000 AS digit_ratio,
        |      floor(n_stopwords / CAST(greatest(n_tokens, 1) AS DOUBLE)
        |        * 10000 + 0.5) / 10000 AS stopword_ratio
        |    FROM (
        |      SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |        CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |        END AS n_tokens,
        |        CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
        |        CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE CAST(len(list_filter(
        |               string_split_regex(trim(lower(text)), '\s+'),
        |               t -> t IN ('the','a','an','of','and','to','is','in',
        |                          'it','that'))) AS INT)
        |        END AS n_stopwords
        |      FROM d))),
        |s0 AS (SELECT * FROM d WHERE b = 0
        |       QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
        |k0 AS (SELECT s0.doc_id, s0.fp FROM s0 JOIN met USING (doc_id)
        |       WHERE met.first_fail = 'pass'),
        |a0 AS (SELECT met.first_fail, count(*) AS c
        |       FROM s0 JOIN met USING (doc_id) GROUP BY 1),
        |s1 AS (SELECT * FROM d WHERE b = 1
        |       QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
        |s1f AS (SELECT s1.* FROM s1
        |        WHERE s1.fp NOT IN (SELECT fp FROM k0)
        |          AND s1.doc_id NOT IN (SELECT doc_id FROM k0)),
        |k1 AS (SELECT s1f.doc_id FROM s1f JOIN met USING (doc_id)
        |       WHERE met.first_fail = 'pass'),
        |a1 AS (SELECT met.first_fail, count(*) AS c
        |       FROM s1f JOIN met USING (doc_id) GROUP BY 1),
        |j0 AS (SELECT '{' || string_agg(printf('"%s":%d', first_fail, c),
        |         ',' ORDER BY first_fail) || '}' AS a FROM a0),
        |j1 AS (SELECT '{' || string_agg(printf('"%s":%d', first_fail, c),
        |         ',' ORDER BY first_fail) || '}' AS a FROM a1)
        |SELECT CAST(1 AS BIGINT) AS corpus_version,
        |  (SELECT count(*) FROM d WHERE b = 0) AS batch_rows,
        |  (SELECT count(*) FROM s0) AS after_exact,
        |  (SELECT count(*) FROM k0) AS after_quality,
        |  (SELECT count(*) FROM k0) AS after_near_dup,
        |  (SELECT count(*) FROM k0) AS corpus_rows,
        |  (SELECT a FROM j0) AS attrition
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |  (SELECT count(*) FROM d WHERE b = 1),
        |  (SELECT count(*) FROM s1f),
        |  (SELECT count(*) FROM k1),
        |  (SELECT count(*) FROM k1),
        |  (SELECT count(*) FROM k0) + (SELECT count(*) FROM k1),
        |  (SELECT a FROM j1)""".stripMargin,

    // uniform rebalance: keep-all decided in integer arithmetic, the
    // downsample bound re-derived as the same 32-bit md5 threshold
    "q_lang_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents
        |  WHERE lang IS NOT NULL GROUP BY lang),
        |t AS (SELECT sum(cnt) AS total, count(*) AS g FROM c),
        |b AS (
        |  SELECT c.lang, c.cnt * t.g <= t.total AS keep_all,
        |    printf('%08x', CAST(floor(CAST(t.total AS DOUBLE) / t.g / c.cnt
        |      * 4294967296.0) AS BIGINT)) AS bound
        |  FROM c, t)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN b USING (lang)
        |WHERE b.keep_all
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < b.bound""".stripMargin,

    // hybrid retrieval: both modality rankings re-derived from raw
    // tables, fused with the same fixed two-term RRF double sum
    // (rank sentinel 0 = outside that modality's 50-candidate pool)
    "q_hybrid_search" ->
      """WITH d0 AS (SELECT text FROM documents WHERE doc_id = 0),
        |qt AS (
        |  SELECT DISTINCT t FROM (
        |    SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END) AS t
        |    FROM d0)),
        |c AS (SELECT doc_id, text FROM documents WHERE doc_id <> 0),
        |nn AS (SELECT count(*) AS n FROM c),
        |tok AS (
        |  SELECT DISTINCT doc_id, t FROM (
        |    SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END) AS t
        |    FROM c)
        |  WHERE t IN (SELECT t FROM qt)),
        |dfq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
        |kw AS (SELECT tok.doc_id, sum(nn.n - dfq.df) AS kw_score
        |       FROM tok JOIN dfq USING (t) CROSS JOIN nn
        |       GROUP BY tok.doc_id),
        |kwr AS (SELECT doc_id, CAST(row_number() OVER (
        |          ORDER BY kw_score DESC, doc_id ASC) AS INT) AS kw_rank
        |        FROM kw QUALIFY kw_rank <= 50),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings WHERE vec_id = 0),
        |vec AS (SELECT e.vec_id AS doc_id,
        |          floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |            qv.v) * 10000 + 0.5) / 10000 AS cos_sim
        |        FROM embeddings e, qv WHERE e.vec_id <> 0),
        |vecr AS (SELECT doc_id, CAST(row_number() OVER (
        |           ORDER BY cos_sim DESC, doc_id ASC) AS INT) AS vec_rank
        |         FROM vec QUALIFY vec_rank <= 50),
        |f AS (SELECT doc_id,
        |        COALESCE(k.kw_rank, 0) AS kw_rank,
        |        COALESCE(v.vec_rank, 0) AS vec_rank,
        |        floor((COALESCE(CAST(1 AS DOUBLE) / (60 + k.kw_rank), 0)
        |          + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0))
        |          * 1000000 + 0.5) / 1000000 AS rrf_score
        |      FROM kwr k FULL JOIN vecr v USING (doc_id))
        |SELECT doc_id, kw_rank, vec_rank, rrf_score,
        |  CAST(row_number() OVER (
        |    ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
        |FROM f QUALIFY rank <= 10""".stripMargin,

    // cohort retention: weeks truncate to Monday in both engines
    "q_cohort" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |fs AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM e GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS act_week
        |  FROM e),
        |counts AS (
        |  SELECT fs.cohort_week,
        |    CAST((act.act_week - fs.cohort_week) / 7 AS INT) AS week_offset,
        |    count(DISTINCT act.user_id) AS users
        |  FROM act JOIN fs USING (user_id)
        |  GROUP BY 1, 2),
        |sz AS (SELECT cohort_week, users AS cohort_size FROM counts
        |       WHERE week_offset = 0)
        |SELECT c.cohort_week, c.week_offset, c.users,
        |  floor(c.users / CAST(s.cohort_size AS DOUBLE) * 10000 + 0.5)
        |    / 10000 AS retention_pct
        |FROM counts c JOIN sz s USING (cohort_week)""".stripMargin,

    // anomaly: identical integer sums -> identical doubles -> same z
    "q_anomaly" ->
      """WITH base AS (
        |  SELECT c.c_nationkey AS nation, CAST(o.o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT *,
        |    count(cents) OVER tw AS n,
        |    CAST(sum(cents) OVER tw AS DOUBLE) AS s1,
        |    CAST(sum(CAST(cents AS HUGEINT) * cents) OVER tw AS DOUBLE) AS s2
        |  FROM (SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS ep
        |        FROM base)
        |  WINDOW tw AS (PARTITION BY nation ORDER BY ep
        |                RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT nation, day, cents,
        |  CASE WHEN n >= 10 AND sqrt((s2 - s1 * s1 / n) / (n - 1)) > 0
        |    THEN floor((cents - s1 / n)
        |      / sqrt((s2 - s1 * s1 / n) / (n - 1)) * 10000 + 0.5) / 10000
        |  END AS z,
        |  CAST(CASE WHEN n >= 10 AND sqrt((s2 - s1 * s1 / n) / (n - 1)) > 0
        |         AND abs(floor((cents - s1 / n)
        |           / sqrt((s2 - s1 * s1 / n) / (n - 1)) * 10000 + 0.5)
        |           / 10000) >= 3.0
        |    THEN 1 ELSE 0 END AS INT) AS is_anomaly
        |FROM w""".stripMargin,

    // ordered funnel: the same chained running-max windows, re-derived
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |w1 AS (
        |  SELECT *, max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS r1
        |  FROM e),
        |h2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND COALESCE(
        |      max(r1) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |    THEN 1 ELSE 0 END AS h2
        |  FROM w1),
        |w2 AS (
        |  SELECT *, max(h2) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS r2
        |  FROM h2),
        |h3 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND COALESCE(
        |      max(r2) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |    THEN 1 ELSE 0 END AS h3
        |  FROM w2),
        |w3 AS (
        |  SELECT *, max(h3) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS r3
        |  FROM h3),
        |u AS (
        |  SELECT user_id, max(r1) AS s1, max(r2) AS s2, max(r3) AS s3
        |  FROM w3 GROUP BY user_id),
        |t AS (SELECT CAST(sum(s1) AS BIGINT) AS u1,
        |        CAST(sum(s2) AS BIGINT) AS u2,
        |        CAST(sum(s3) AS BIGINT) AS u3 FROM u)
        |SELECT 1 AS stage, 'view' AS stage_name, u1 AS users,
        |  floor(u1 / CAST(greatest(u1, 1) AS DOUBLE) * 10000 + 0.5)
        |    / 10000 AS pct_of_top FROM t
        |UNION ALL
        |SELECT 2, 'click', u2,
        |  floor(u2 / CAST(greatest(u1, 1) AS DOUBLE) * 10000 + 0.5)
        |    / 10000 FROM t
        |UNION ALL
        |SELECT 3, 'purchase', u3,
        |  floor(u3 / CAST(greatest(u1, 1) AS DOUBLE) * 10000 + 0.5)
        |    / 10000 FROM t""".stripMargin,

    // gap fill: lead per nation, per-row generate_series over the gap
    "q_gap_fill" ->
      """WITH base AS (
        |  SELECT c.c_nationkey AS nation, CAST(o.o_orderdate AS DATE) AS day,
        |    floor(CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        |        AS DOUBLE) / count(*) / CAST(100 AS DOUBLE) * 100 + 0.5)
        |      / 100 AS avg_price
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |n AS (
        |  SELECT *, lead(day) OVER (PARTITION BY nation ORDER BY day) AS nxt
        |  FROM base)
        |SELECT nation, CAST(g.d AS DATE) AS day, avg_price,
        |  CAST(CASE WHEN CAST(g.d AS DATE) <> n.day THEN 1 ELSE 0 END AS INT)
        |    AS is_filled
        |FROM n, UNNEST(generate_series(CAST(day AS TIMESTAMP),
        |  CAST(COALESCE(nxt - INTERVAL 1 DAY, day) AS TIMESTAMP),
        |  INTERVAL 1 DAY)) AS g(d)""".stripMargin,

    // batch hybrid: same contract per query_id; N/df over the FULL
    // corpus (query docs are corpus members in the batch form)
    "q_hybrid_batch" ->
      """WITH qids AS (SELECT doc_id AS query_id FROM documents
        |              WHERE doc_id < 5),
        |toks AS (
        |  SELECT DISTINCT doc_id, t FROM (
        |    SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END) AS t
        |    FROM documents)),
        |qt AS (SELECT q.query_id, toks.t
        |       FROM toks JOIN qids q ON toks.doc_id = q.query_id),
        |nn AS (SELECT count(*) AS n FROM documents),
        |rel AS (SELECT * FROM toks
        |        WHERE t IN (SELECT DISTINCT t FROM qt)),
        |dfq AS (SELECT t, count(*) AS df FROM rel GROUP BY t),
        |kw AS (SELECT qt.query_id, rel.doc_id,
        |         sum(nn.n - dfq.df) AS kw_score
        |       FROM rel JOIN qt USING (t) JOIN dfq USING (t) CROSS JOIN nn
        |       WHERE rel.doc_id <> qt.query_id
        |       GROUP BY qt.query_id, rel.doc_id),
        |kwr AS (SELECT query_id, doc_id, CAST(row_number() OVER (
        |          PARTITION BY query_id
        |          ORDER BY kw_score DESC, doc_id ASC) AS INT) AS kw_rank
        |        FROM kw QUALIFY kw_rank <= 50),
        |qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings WHERE vec_id < 5),
        |vec AS (SELECT qv.query_id, e.vec_id AS doc_id,
        |          floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |            qv.v) * 10000 + 0.5) / 10000 AS cos_sim
        |        FROM embeddings e, qv WHERE e.vec_id <> qv.query_id),
        |vecr AS (SELECT query_id, doc_id, CAST(row_number() OVER (
        |           PARTITION BY query_id
        |           ORDER BY cos_sim DESC, doc_id ASC) AS INT) AS vec_rank
        |         FROM vec QUALIFY vec_rank <= 50),
        |f AS (SELECT query_id, doc_id,
        |        COALESCE(k.kw_rank, 0) AS kw_rank,
        |        COALESCE(v.vec_rank, 0) AS vec_rank,
        |        floor((COALESCE(CAST(1 AS DOUBLE) / (60 + k.kw_rank), 0)
        |          + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0))
        |          * 1000000 + 0.5) / 1000000 AS rrf_score
        |      FROM kwr k FULL JOIN vecr v USING (query_id, doc_id))
        |SELECT query_id, doc_id, kw_rank, vec_rank, rrf_score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
        |FROM f QUALIFY rank <= 10""".stripMargin
  )

  /** Oracles that can only be phrased against a COMPUTED intermediate
    * — here the LSH candidate pair set, which plain SQL cannot
    * reproduce. The pair generation is fully deterministic (hash
    * arithmetic, no rand()), so Verify materializes the pairs for its
    * sfDir and embeds them as VALUES in a recursive-CTE closure: the
    * oracle then independently re-derives the transitive clusters and
    * min-id survivors that `q_dedup_survivors` must produce. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    survivorOracles(spark, sfDir) ++ ngramJaccardOracle(spark, sfDir) ++
      embedOracles(spark, sfDir) ++ ivfPqRefineOracle(spark, sfDir) ++
      pqOracle(spark, sfDir) ++
      opqOracle(spark, sfDir) ++
      simhashOracle(spark, sfDir) ++
      minhashOracle(spark, sfDir) ++ ophOracle(spark, sfDir) ++
      winnowOracle(spark, sfDir) ++
      exportOracle(sfDir)

  /** q_dedup_oph: the banding/cap/estimate algebra re-derived in SQL
    * over the embedded ONE-PERMUTATION signatures (whose own
    * derivation is property-spec'd bit-identical to the composed
    * builtin formulation) — the q_dedup_minhash oracle pattern. */
  private def ophOracle(spark: SparkSession,
                        sfDir: String): Map[String, String] = {
    val sigs = Dedup.minhashSignaturesOPH(T(spark, sfDir, "documents"),
      "text", "doc_id").collect()
    if (sigs.isEmpty) Map.empty
    else {
      val values = sigs.map { r =>
        s"(${r.getLong(0)},${r.getSeq[Long](1).mkString("[", ",", "]")})"
      }.mkString(",")
      Map("q_dedup_oph" ->
        s"""WITH sigs AS (
           |  SELECT CAST(id AS BIGINT) AS id, CAST(l AS BIGINT[]) AS l
           |  FROM (VALUES $values) v(id, l)),
           |b AS (
           |  SELECT id, band, l[band*4+1 : band*4+4] AS sl
           |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) t),
           |capped AS (
           |  SELECT id, band, sl FROM (
           |    SELECT id, band, sl, count(*) OVER (PARTITION BY band, sl) AS n
           |    FROM b)
           |  WHERE n <= 1000),
           |cand AS (
           |  SELECT DISTINCT a.id AS doc_a, c.id AS doc_b
           |  FROM capped a
           |  JOIN capped c ON a.band = c.band AND a.sl = c.sl AND a.id < c.id)
           |SELECT * FROM (
           |  SELECT cd.doc_a, cd.doc_b,
           |    round(CAST(len(list_filter(generate_series(1, 64),
           |      i -> sa.l[i] = sc.l[i])) AS DOUBLE) / 64, 4) AS est_jaccard
           |  FROM cand cd
           |  JOIN sigs sa ON sa.id = cd.doc_a
           |  JOIN sigs sc ON sc.id = cd.doc_b)
           |WHERE est_jaccard >= 0.2""".stripMargin)
    }
  }

  /** q_snapshot_export's oracle reads the EXPORTED open-format files
    * directly — `read_parquet` over the hive-partitioned layout the
    * query wrote, no graft code on the oracle side. Dynamic because
    * the export path embeds the sf dir. */
  private def exportOracle(sfDir: String): Map[String, String] = {
    val out = "/tmp/graft_snap_export_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "/export"
    // q_snapshot_export_delta's oracle is DuckDB acting as a DELTA
    // READER with zero graft code: resolve the `_delta_log` JSON
    // commits (adds minus removes), then read exactly the live
    // parquet files. The resolution is the point — retired
    // overwrite/delete files are still on disk, and only honoring
    // the log excludes them (a plain glob reads ~2x the rows).
    val dtab = "/tmp/graft_delta_mirror_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "/table"
    Map(
      "q_snapshot_export" ->
        s"""SELECT doc_id, lang, source, n_chars
           |FROM read_parquet('$out/data/*/*.parquet', hive_partitioning=1)"""
          .stripMargin,
      // full protocol resolution, like a conforming Delta reader:
      // the live set AND the partition values both come from the LOG
      // (add.partitionValues), not from hive path inference — a
      // wrong/missing partitionValues entry fails the row hash
      // q_snapshot_export_delta_cp's oracle is DuckDB resolving a
      // CHECKPOINTED log the way the protocol prescribes:
      // _last_checkpoint names the checkpoint version, the classic
      // checkpoint parquet IS the reconciled base (its live adds
      // carry partitionValues as a MAP), and only JSON commits with
      // version > checkpoint replay on top. The pre-checkpoint JSONs
      // were deleted by the query (log retention), so nothing short
      // of honoring the checkpoint resolves at all.
      "q_snapshot_export_delta_cp" -> {
        val ctab = "/tmp/graft_delta_cp_" +
          sfDir.replaceAll("[^A-Za-z0-9]", "_") + "/table"
        s"""WITH lc AS (
           |  SELECT version AS cv
           |  FROM read_json_auto('$ctab/_delta_log/_last_checkpoint')),
           |cpa AS (
           |  SELECT add.path AS p, add.partitionValues['lang'][1] AS lang
           |  FROM read_parquet('$ctab/_delta_log/*.checkpoint.parquet')
           |  WHERE add.path IS NOT NULL),
           |tail AS (
           |  SELECT * FROM read_json_auto('$ctab/_delta_log/*.json',
           |    format='newline_delimited', union_by_name=true, filename=1)
           |  WHERE CAST(regexp_extract(parse_filename(filename),
           |    '(\\d+)\\.json', 1) AS BIGINT) > (SELECT cv FROM lc)),
           |tadds AS (
           |  SELECT add.path AS p, add.partitionValues.lang AS lang
           |  FROM tail WHERE add.path IS NOT NULL),
           |trems AS (
           |  SELECT remove.path AS p FROM tail
           |  WHERE remove.path IS NOT NULL),
           |live AS (
           |  SELECT * FROM (SELECT * FROM cpa UNION ALL SELECT * FROM tadds)
           |  WHERE p NOT IN (SELECT p FROM trems))
           |SELECT d.doc_id, d.source, d.n_chars, l.lang
           |FROM read_parquet('$ctab/data/**/*.parquet',
           |  hive_partitioning=0, filename=1) d
           |JOIN live l ON replace(d.filename, '$ctab/', '') = l.p"""
          .stripMargin
      },
      // q_snapshot_export_delta_abs's oracle resolves a log whose
      // live set mixes ABSOLUTE-URI adds (files adopted outside the
      // table root — the protocol allows absolute add.path) with
      // relative adds (COW-DELETE survivors rewritten into the table
      // dir): DuckDB scans BOTH roots and joins each data file to the
      // log by whichever path form the log recorded.
      "q_snapshot_export_delta_abs" -> {
        val aroot = "/tmp/graft_delta_abs_" +
          sfDir.replaceAll("[^A-Za-z0-9]", "_")
        s"""WITH acts AS (
           |  SELECT * FROM read_json_auto('$aroot/table/_delta_log/*.json',
           |    format='newline_delimited', union_by_name=true)),
           |adds AS (
           |  SELECT add.path AS p FROM acts WHERE add.path IS NOT NULL),
           |removes AS (
           |  SELECT remove.path AS p FROM acts
           |  WHERE remove.path IS NOT NULL),
           |live AS (
           |  SELECT CASE WHEN p LIKE 'file:%' THEN substr(p, 6)
           |              ELSE '$aroot/table/' || p END AS f
           |  FROM adds WHERE p NOT IN (SELECT p FROM removes))
           |SELECT d.doc_id, d.source, d.n_chars, d.lang
           |FROM read_parquet(
           |  ['$aroot/external/*.parquet', '$aroot/table/data/**/*.parquet'],
           |  hive_partitioning=0, union_by_name=true, filename=1) d
           |JOIN live l ON d.filename = l.f"""
          .stripMargin
      },
      // q_snapshot_export_delta_cdc / q_ingest_delta_cdf: DuckDB as a
      // conforming CHANGE-DATA-FEED reader. Per commit version v
      // (from the JSON filename): when the commit carries `cdc`
      // actions they are AUTHORITATIVE (read their `_change_data`
      // parquet, `_change_type` from the file); otherwise changes
      // synthesize from the actions — dataChange=true adds read as
      // inserts, dataChange=true removes read their still-on-disk
      // files as deletes (dataChange=false rewrites contribute
      // nothing). The export gate compares this against graft's TRUE
      // feed from its own manifests; the ingest gate against
      // readChangeFeed's resolution.
      "q_snapshot_export_delta_cdc" -> cdfResolutionSql(
        "/tmp/graft_delta_cdc_" +
          sfDir.replaceAll("[^A-Za-z0-9]", "_") + "/table"),
      "q_ingest_delta_cdf" -> cdfResolutionSql(
        "/tmp/graft_delta_cdf_" +
          sfDir.replaceAll("[^A-Za-z0-9]", "_") + "/table"),
      // the streaming consumer is held to the SAME conforming-reader
      // resolution over its fixture's log: finite stream == batch,
      // and a replayed (double-appended) version breaks the row hash
      "q_stream_cdf" -> cdfResolutionSql(
        "/tmp/graft_stream_cdf_" +
          sfDir.replaceAll("[^A-Za-z0-9]", "_") + "/table"),
      "q_snapshot_export_delta" ->
        s"""WITH acts AS (
           |  SELECT * FROM read_json_auto('$dtab/_delta_log/*.json',
           |    format='newline_delimited', union_by_name=true)),
           |adds AS (
           |  SELECT add.path AS p, add.partitionValues.lang AS lang
           |  FROM acts WHERE add.path IS NOT NULL),
           |removes AS (
           |  SELECT remove.path AS p FROM acts
           |  WHERE remove.path IS NOT NULL),
           |live AS (
           |  SELECT * FROM adds WHERE p NOT IN (SELECT p FROM removes))
           |SELECT d.doc_id, d.source, d.n_chars, l.lang
           |FROM read_parquet('$dtab/data/**/*.parquet',
           |  hive_partitioning=0, filename=1) d
           |JOIN live l ON replace(d.filename, '$dtab/', '') = l.p"""
          .stripMargin)
  }

  /** DuckDB resolving a Delta CHANGE DATA FEED over `tab`'s log —
    * shared by the export and ingest CDF gates (same protocol, two
    * directions). */
  private def cdfResolutionSql(tab: String): String =
    s"""WITH acts AS (
       |  SELECT *, CAST(regexp_extract(parse_filename(filename),
       |    '(\\d+)\\.json', 1) AS BIGINT) AS v
       |  FROM read_json('$tab/_delta_log/*.json',
       |    format='newline_delimited', filename=1,
       |    columns={
       |      "add": 'STRUCT(path VARCHAR, dataChange BOOLEAN)',
       |      "remove": 'STRUCT(path VARCHAR, dataChange BOOLEAN)',
       |      "cdc": 'STRUCT(path VARCHAR)'})),
       |cdcv AS (SELECT DISTINCT v FROM acts WHERE cdc.path IS NOT NULL),
       |files AS (
       |  SELECT v, cdc.path AS p, NULL AS ct
       |  FROM acts WHERE cdc.path IS NOT NULL
       |  UNION ALL
       |  SELECT v, add.path, 'insert' FROM acts
       |  WHERE add.path IS NOT NULL AND add.dataChange
       |    AND v NOT IN (SELECT v FROM cdcv)
       |  UNION ALL
       |  SELECT v, remove.path, 'delete' FROM acts
       |  WHERE remove.path IS NOT NULL AND remove.dataChange
       |    AND v NOT IN (SELECT v FROM cdcv)),
       |d AS (
       |  SELECT * FROM read_parquet(
       |    ['$tab/data/**/*.parquet', '$tab/_change_data/**/*.parquet'],
       |    hive_partitioning=0, union_by_name=true, filename=1))
       |SELECT f.v AS _commit_version,
       |  coalesce(f.ct, d._change_type) AS _change_type,
       |  d.doc_id, d.source, d.n_chars, d.lang
       |FROM d JOIN files f ON replace(d.filename, '$tab/', '') = f.p"""
      .stripMargin

  private def pairValues(rows: Array[org.apache.spark.sql.Row]): String =
    rows.map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(",")

  private def survivorOracles(spark: SparkSession,
                              sfDir: String): Map[String, String] = {
    val pairs = Dedup.minhashPairs(T(spark, sfDir, "documents"), "text",
        "doc_id", threshold = 0.2)
      .select(col("doc_a"), col("doc_b")).collect()
    if (pairs.isEmpty) Map.empty
    else {
      val values = pairs
        .map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(",")
      // shared closure over the embedded pair set: comp = min id
      // reachable (matching connectedComponents' min-label fixpoint)
      val closure =
        s"""WITH RECURSIVE e0 AS (
           |  SELECT CAST(a AS BIGINT) AS src, CAST(b AS BIGINT) AS dst
           |  FROM (VALUES $values) v(a, b)),
           |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |reach(node, r) AS (
           |  SELECT src, dst FROM edges
           |  UNION
           |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src
           |  WHERE edges.dst <> reach.node)""".stripMargin
      Map(
        "q_dedup_survivors" ->
          s"""$closure
             |SELECT node, least(node, min(r)) AS survivor
             |FROM reach GROUP BY node""".stripMargin,
        // the incremental (standing + delta fold) derivation is held
        // to the SAME from-scratch closure — one oracle text, two
        // queries, like the salted/unsalted minhash pair
        "q_dedup_survivors_incr" ->
          s"""$closure
             |SELECT node, least(node, min(r)) AS survivor
             |FROM reach GROUP BY node""".stripMargin,
        // quality-aware: the survivor is the comp member with the
        // highest quality_score (q_text_quality's exact formula —
        // identical rounding on both sides), min id on ties
        "q_dedup_survivors_quality" ->
          s"""$closure,
             |comp AS (
             |  SELECT node, least(node, min(r)) AS comp
             |  FROM reach GROUP BY node),
             |m AS (
             |  SELECT doc_id,
             |    CAST(length(text) AS INT) AS n_chars,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |         ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
             |    END AS n_tokens,
             |    CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |         ELSE CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             |           t -> t IN ('the','a','an','of','and','to','is','in','it','that'))) AS INT)
             |    END AS n_stopwords
             |  FROM documents),
             |q AS (
             |  SELECT doc_id,
             |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
             |      least(floor(n_stopwords / CAST(greatest(n_tokens, 1) AS DOUBLE) * 10000 + 0.5) / 10000 * 5.0, 1.0) * 0.3 +
             |      (1.0 - least(floor(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE) * 10000 + 0.5) / 10000 * 10.0, 1.0)) * 0.3) * 10000 + 0.5) / 10000 AS quality_score
             |  FROM m),
             |best AS (
             |  SELECT c.comp AS comp, q.doc_id AS survivor,
             |    row_number() OVER (PARTITION BY c.comp
             |      ORDER BY q.quality_score DESC, q.doc_id ASC) AS rn
             |  FROM comp c JOIN q ON c.node = q.doc_id)
             |SELECT c.node AS node, b.survivor AS survivor
             |FROM comp c JOIN best b ON c.comp = b.comp AND b.rn = 1""".stripMargin,
        // cluster size histogram over the same closure
        "q_dup_cluster_stats" ->
          s"""$closure,
             |comp AS (
             |  SELECT node, least(node, min(r)) AS comp
             |  FROM reach GROUP BY node)
             |SELECT cluster_size, count(*) AS n_clusters FROM (
             |  SELECT comp, count(*) AS cluster_size
             |  FROM comp GROUP BY comp)
             |GROUP BY cluster_size""".stripMargin,
        // leakage-free split: unit = component min-id (the doc itself
        // outside any cluster), md5-threshold assignment on the UNIT
        // (80 % of 256 → 0xcc, 90 % → 0xe6 — Analytics.md5Bound's rule)
        "q_split_leakage_free" ->
          s"""$closure,
             |comp AS (
             |  SELECT node, least(node, min(r)) AS comp
             |  FROM reach GROUP BY node),
             |u AS (
             |  SELECT d.doc_id, d.lang,
             |    COALESCE(c.comp, d.doc_id) AS unit
             |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
             |SELECT doc_id, lang, unit,
             |  CASE WHEN substr(md5(CAST(unit AS VARCHAR)), 1, 2) < 'cc'
             |         THEN 'train'
             |       WHEN substr(md5(CAST(unit AS VARCHAR)), 1, 2) < 'e6'
             |         THEN 'val'
             |       ELSE 'test' END AS split
             |FROM u""".stripMargin)
    }
  }

  /** q_ngram_jaccard re-derived by DuckDB from the raw text: the LSH
    * candidate pair set (deterministic hash arithmetic) is embedded as
    * VALUES, and the oracle independently recomputes normalization,
    * 3-gram shingle sets, and the Jaccard itself. */
  private def ngramJaccardOracle(spark: SparkSession,
                                 sfDir: String): Map[String, String] = {
    val cand = Dedup.minhashPairs(T(spark, sfDir, "documents"), "text",
        "doc_id", threshold = 0.1)
      .select(col("doc_a"), col("doc_b")).collect()
    if (cand.isEmpty) Map.empty
    else Map(
      // asymmetric containment over the SAME candidate set: both
      // directions re-derived, kept when either clears the threshold
      "q_ngram_containment" ->
      s"""WITH cand(doc_a, doc_b) AS (VALUES ${pairValues(cand)}),
         |toks AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS t
         |  FROM documents),
         |sets AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(generate_series(1, len(t) - 2),
         |           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END) AS s
         |  FROM toks)
         |SELECT * FROM (
         |  SELECT CAST(c.doc_a AS BIGINT) AS doc_a,
         |    CAST(c.doc_b AS BIGINT) AS doc_b,
         |    floor(len(list_intersect(a.s, b.s)) /
         |      CAST(greatest(len(a.s), 1) AS DOUBLE) * 10000 + 0.5)
         |      / 10000 AS cont_a,
         |    floor(len(list_intersect(a.s, b.s)) /
         |      CAST(greatest(len(b.s), 1) AS DOUBLE) * 10000 + 0.5)
         |      / 10000 AS cont_b
         |  FROM cand c
         |  JOIN sets a ON a.doc_id = c.doc_a
         |  JOIN sets b ON b.doc_id = c.doc_b)
         |WHERE greatest(cont_a, cont_b) >= 0.1""".stripMargin,
      "q_ngram_jaccard" ->
      s"""WITH cand(doc_a, doc_b) AS (VALUES ${pairValues(cand)}),
         |toks AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS t
         |  FROM documents),
         |sets AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(generate_series(1, len(t) - 2),
         |           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END) AS s
         |  FROM toks)
         |SELECT * FROM (
         |  SELECT CAST(c.doc_a AS BIGINT) AS doc_a,
         |    CAST(c.doc_b AS BIGINT) AS doc_b,
         |    floor(len(list_intersect(a.s, b.s)) /
         |      CAST(greatest(len(list_distinct(a.s || b.s)), 1) AS DOUBLE)
         |      * 10000 + 0.5) / 10000 AS jaccard
         |  FROM cand c
         |  JOIN sets a ON a.doc_id = c.doc_a
         |  JOIN sets b ON b.doc_id = c.doc_b)
         |WHERE jaccard >= 0.1""".stripMargin)
  }

  /** q_dedup_simhash verified against BRUTE FORCE: the 64-bit SimHash
    * values are embedded as VALUES and DuckDB compares ALL pairs with
    * bit_count(xor) — independently confirming the pigeonhole claim
    * that 16-bit banding loses no pair within hamming distance 3. */
  private def simhashOracle(spark: SparkSession,
                            sfDir: String): Map[String, String] = {
    val sh = Dedup.simhash(T(spark, sfDir, "documents"), "text", "doc_id")
      .collect()
    if (sh.isEmpty) Map.empty
    else {
      val values = sh
        .map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(",")
      val sql =
        s"""WITH sh AS (
           |  SELECT CAST(id AS BIGINT) AS id, CAST(h AS BIGINT) AS h
           |  FROM (VALUES $values) v(id, h))
           |SELECT * FROM (
           |  SELECT a.id AS doc_a, b.id AS doc_b,
           |    CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
           |  FROM sh a JOIN sh b ON a.id < b.id)
           |WHERE hamming <= 3""".stripMargin
      // the salted band join must reproduce the identical pair table
      Map("q_dedup_simhash" -> sql, "q_dedup_simhash_salted" -> sql)
    }
  }

  /** q_dedup_minhash re-derived from the embedded SIGNATURES: DuckDB
    * independently re-runs the banding (grouping on the band SLICE
    * itself — value-equivalent to Spark's xxhash64 bucket key absent
    * 64-bit collisions), the hot-bucket cap, the candidate self-join,
    * and the matching-position estimate. Only the signature build
    * itself is taken from Spark (covered by the OPH/classic parity
    * specs). */
  private def minhashOracle(spark: SparkSession,
                            sfDir: String): Map[String, String] = {
    val sigs = Dedup.minhashSignatures(T(spark, sfDir, "documents"),
      "text", "doc_id").collect()
    if (sigs.isEmpty) Map.empty
    else {
      val values = sigs.map { r =>
        s"(${r.getLong(0)},${r.getSeq[Long](1).mkString("[", ",", "]")})"
      }.mkString(",")
      val sql =
        s"""WITH sigs AS (
           |  SELECT CAST(id AS BIGINT) AS id, CAST(l AS BIGINT[]) AS l
           |  FROM (VALUES $values) v(id, l)),
           |b AS (
           |  SELECT id, band, l[band*4+1 : band*4+4] AS sl
           |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) t),
           |capped AS (
           |  SELECT id, band, sl FROM (
           |    SELECT id, band, sl, count(*) OVER (PARTITION BY band, sl) AS n
           |    FROM b)
           |  WHERE n <= 1000),
           |cand AS (
           |  SELECT DISTINCT a.id AS doc_a, c.id AS doc_b
           |  FROM capped a
           |  JOIN capped c ON a.band = c.band AND a.sl = c.sl AND a.id < c.id)
           |SELECT * FROM (
           |  SELECT cd.doc_a, cd.doc_b,
           |    round(CAST(len(list_filter(generate_series(1, 64),
           |      i -> sa.l[i] = sc.l[i])) AS DOUBLE) / 64, 4) AS est_jaccard
           |  FROM cand cd
           |  JOIN sigs sa ON sa.id = cd.doc_a
           |  JOIN sigs sc ON sc.id = cd.doc_b)
           |WHERE est_jaccard >= 0.2""".stripMargin
      // the salted variant must reproduce the identical pair table —
      // one oracle text, two queries held to it; the DELTA variant is
      // the same table restricted to pairs touching a new doc
      // (doc_id % 10 == 0), which is precisely its contract
      Map("q_dedup_minhash" -> sql, "q_dedup_minhash_salted" -> sql,
        "q_dedup_delta" ->
          (sql + "\n  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)"))
    }
  }

  /** q_winnow_fingerprint re-derived from the embedded GRAM HASHES
    * (doc, position, xxhash64 of the k-gram): DuckDB independently
    * re-runs the winnowing selection — rightmost window minimum,
    * complete windows only, short-doc partial window — and the per-doc
    * summary. Capped: the gram table is corpus-sized, so the oracle is
    * only emitted when it fits a sane VALUES literal (the sf0.01
    * driver gate always does). */
  private def winnowOracle(spark: SparkSession,
                           sfDir: String): Map[String, String] = {
    val grams = T(spark, sfDir, "documents")
      .select(col("doc_id"), TextFns.normalizeText(col("text")).as("__norm"))
      .select(col("doc_id"),
        posexplode(TextFns.shinglesFromNorm(col("__norm"), 5))
          .as(Seq("pos", "__g")))
      .select(col("doc_id"), col("pos"), xxhash64(col("__g")).as("h"))
      .collect()
    if (grams.isEmpty || grams.length > 2000000) Map.empty
    else {
      val values = grams
        .map(r => s"(${r.getLong(0)},${r.getInt(1)},${r.getLong(2)})")
        .mkString(",")
      Map("q_winnow_fingerprint" ->
        s"""WITH g AS (
           |  SELECT CAST(id AS BIGINT) AS id, CAST(p AS INT) AS pos,
           |    CAST(h AS BIGINT) AS h
           |  FROM (VALUES $values) v(id, p, h)),
           |sel AS (
           |  SELECT id,
           |    min({'h': h, 'negpos': -pos}) OVER (PARTITION BY id
           |      ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s,
           |    row_number() OVER (PARTITION BY id ORDER BY pos) AS rn,
           |    count(*) OVER (PARTITION BY id) AS cnt
           |  FROM g),
           |fps AS (
           |  SELECT DISTINCT id, s.h AS fp, -s.negpos AS fp_pos
           |  FROM sel WHERE rn >= 4 OR rn = cnt)
           |SELECT id AS doc_id, count(*) AS n_fp,
           |  CAST(min(fp) AS BIGINT) AS min_fp,
           |  CAST(max(fp) AS BIGINT) AS max_fp
           |FROM fps GROUP BY id""".stripMargin)
    }
  }

  /** Embedding-space oracles phrased against the DETERMINISTIC
    * candidate sets the approximate operators bucket out (hyperplane /
    * k-means hash arithmetic, no rand()): DuckDB independently
    * recomputes cosine, thresholding, and ranking over those
    * candidates — verifying everything but the bucketing itself. */
  private def embedOracles(spark: SparkSession,
                           sfDir: String): Map[String, String] = {
    val e = T(spark, sfDir, "embeddings")
    val cos = "floor(list_cosine_similarity(CAST(q.embedding AS DOUBLE[])," +
      " CAST(n.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000"
    def topkSql(cand: Array[org.apache.spark.sql.Row], k: Int): Option[String] =
      if (cand.isEmpty) None
      else Some(
        s"""WITH cand(query_id, neighbor_id) AS (VALUES ${pairValues(cand)}),
           |p AS (
           |  SELECT CAST(c.query_id AS BIGINT) AS query_id,
           |    CAST(c.neighbor_id AS BIGINT) AS neighbor_id, $cos AS cos_sim
           |  FROM cand c
           |  JOIN embeddings q ON q.vec_id = c.query_id
           |  JOIN embeddings n ON n.vec_id = c.neighbor_id)
           |SELECT query_id, neighbor_id, cos_sim,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
           |FROM p QUALIFY rank <= $k""".stripMargin)
    val lsh = topkSql(
      Similarity.lshCandidatePairs(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", bits = 8, dim = 64).collect(), 5)
      .map("q_embed_lsh_ann" -> _)
    val ivf = topkSql(
      Similarity.ivfCandidatePairs(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", nlist = 8, nprobe = 2).collect(), 5)
      .map("q_embed_ivf_ann" -> _)
    val nearDup = {
      val cand = Similarity.bucketCandidatePairs(e, "vec_id", "embedding",
        bits = Similarity.adaptiveBits(e.count()), dim = 64).collect()
      if (cand.isEmpty) None
      else Some("q_dedup_embed" ->
        s"""WITH cand(doc_a, doc_b) AS (VALUES ${pairValues(cand)})
           |SELECT * FROM (
           |  SELECT CAST(c.doc_a AS BIGINT) AS doc_a,
           |    CAST(c.doc_b AS BIGINT) AS doc_b, $cos AS cos_sim
           |  FROM cand c
           |  JOIN embeddings q ON q.vec_id = c.doc_a
           |  JOIN embeddings n ON n.vec_id = c.doc_b)
           |WHERE cos_sim >= 0.3""".stripMargin)
    }
    val sem = {
      val assign = Similarity.kmeansAssign(e, "vec_id", "embedding",
        nlist = Similarity.adaptiveNlist(e.count()), iters = 2).collect()
      if (assign.isEmpty) None
      else {
        val values = assign
          .map(r => s"(${r.getLong(0)},${r.getInt(1)})").mkString(",")
        Some("q_semdedup" ->
          s"""WITH assign(vec_id, cell) AS (VALUES $values),
             |e AS (
             |  SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
             |    CAST(a.cell AS INT) AS cell,
             |    CAST(b.embedding AS DOUBLE[]) AS v
             |  FROM assign a JOIN embeddings b ON b.vec_id = a.vec_id),
             |drops AS (
             |  SELECT DISTINCT x.vec_id
             |  FROM e x JOIN e y ON x.cell = y.cell AND y.vec_id < x.vec_id
             |  WHERE floor(list_cosine_similarity(x.v, y.v) * 10000 + 0.5)
             |    / 10000 >= 0.3)
             |SELECT vec_id, cell FROM e
             |WHERE vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin)
      }
    }
    (lsh.toList ++ ivf.toList ++ nearDup.toList ++ sem.toList).toMap
  }

  /** q_embed_ivfpq_refine: the refine POOL (PQ-ranked shortlist) is
    * embedded; the SQ8 re-ranking is re-derived ENTIRELY from the raw
    * table (per-dim bounds + floor quantize/reconstruct, the
    * q_embed_sq_topk oracle arithmetic) restricted to the pool. */
  private def ivfPqRefineOracle(spark: SparkSession,
                                sfDir: String): Map[String, String] = {
    val e = T(spark, sfDir, "embeddings")
    val cand = Similarity.ivfPqRefineCandidatePairs(
      e.where(col("vec_id") < 10), e, "vec_id", "embedding").collect()
    if (cand.isEmpty) Map.empty
    else Map("q_embed_ivfpq_refine" ->
      s"""WITH cand(query_id, neighbor_id) AS (VALUES ${pairValues(cand)}),
         |e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (
         |  SELECT vec_id, i AS pos, v[i] AS x
         |  FROM e, UNNEST(generate_series(1, len(v))) AS g(i)),
         |b AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM x GROUP BY pos),
         |r AS (
         |  SELECT x.vec_id, list(CASE WHEN b.hi = b.lo THEN b.lo
         |      ELSE b.lo + floor((x.x - b.lo) * 255 / (b.hi - b.lo) + 0.5)
         |        * (b.hi - b.lo) / 255 END ORDER BY x.pos) AS recon
         |  FROM x JOIN b USING (pos) GROUP BY x.vec_id),
         |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
         |p AS (
         |  SELECT CAST(c.query_id AS BIGINT) AS query_id,
         |    CAST(c.neighbor_id AS BIGINT) AS neighbor_id,
         |    floor(list_cosine_similarity(q.v, r.recon) * 10000 + 0.5)
         |      / 10000 AS cos_sim
         |  FROM cand c
         |  JOIN q ON q.vec_id = c.query_id
         |  JOIN r ON r.vec_id = c.neighbor_id)
         |SELECT query_id, neighbor_id, cos_sim,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
         |FROM p QUALIFY rank <= 5""".stripMargin)
  }

  /** q_embed_opq_topk re-derived INDEPENDENTLY by DuckDB — including
    * the ROTATION: only the ±1 sign diagonal and the rotated-space
    * codes/codebooks are embedded; the oracle rebuilds the Hadamard
    * matrix itself from bit_count(i & j), applies the dense O(d²)
    * transform to the raw query vectors (checking the engine's
    * O(d log d) butterfly against an independent formulation), then
    * reconstructs and re-ranks exactly like the PQ oracle. */
  private def opqOracle(spark: SparkSession,
                        sfDir: String): Map[String, String] = {
    val e = T(spark, sfDir, "embeddings")
    val (codesDf, books, signs) =
      Similarity.opqCodes(e, "vec_id", "embedding")
    val codes = codesDf.collect()
    if (codes.isEmpty) Map.empty
    else {
      val dim = signs.length
      val codeValues = codes.map { r =>
        s"(${r.getLong(0)},[${r.getSeq[Int](1).mkString(",")}])"
      }.mkString(",")
      val bookValues = books.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (c, j) =>
          s"($s,$j,[${c.mkString(",")}])"
        }
      }.mkString(",")
      val signValues =
        signs.zipWithIndex.map { case (s, i) => s"($i,$s)" }.mkString(",")
      Map("q_embed_opq_topk" ->
        s"""WITH codes(vec_id, c) AS (VALUES $codeValues),
           |books(s, j, v) AS (VALUES $bookValues),
           |signs(i, sgn) AS (VALUES $signValues),
           |x AS (
           |  SELECT vec_id, g.i - 1 AS s, c[g.i] AS j
           |  FROM codes, UNNEST(generate_series(1, len(c))) AS g(i)),
           |r AS (
           |  SELECT x.vec_id AS neighbor_id,
           |    flatten(list(b.v ORDER BY x.s)) AS recon
           |  FROM x JOIN books b ON b.s = x.s AND b.j = x.j
           |  GROUP BY x.vec_id),
           |qraw AS (
           |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings WHERE vec_id < 10),
           |qex AS (
           |  SELECT query_id, g.i - 1 AS j, v[g.i] AS xv
           |  FROM qraw, UNNEST(generate_series(1, len(v))) AS g(i)),
           |rot AS (
           |  SELECT qex.query_id, oi.i AS oi,
           |    sum(CASE WHEN bit_count(CAST(oi.i AS BIGINT)
           |          & CAST(qex.j AS BIGINT)) % 2 = 0
           |        THEN 1 ELSE -1 END * s.sgn * qex.xv)
           |      / sqrt(${dim}.0) AS y
           |  FROM qex
           |  JOIN signs s ON s.i = qex.j
           |  CROSS JOIN (SELECT UNNEST(generate_series(0, ${dim - 1}))
           |              AS i) oi
           |  GROUP BY qex.query_id, oi.i),
           |q AS (
           |  SELECT query_id, list(y ORDER BY oi) AS v
           |  FROM rot GROUP BY query_id),
           |p AS (
           |  SELECT q.query_id, CAST(r.neighbor_id AS BIGINT) AS neighbor_id,
           |    floor(list_cosine_similarity(q.v, r.recon) * 10000 + 0.5)
           |      / 10000 AS cos_sim
           |  FROM q, r WHERE q.query_id <> r.neighbor_id)
           |SELECT query_id, neighbor_id, cos_sim,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
           |FROM p QUALIFY rank <= 5""".stripMargin)
    }
  }

  /** q_embed_pq_topk re-ranked INDEPENDENTLY by DuckDB: the engine's
    * deterministic PQ codes and codebooks are embedded as VALUES, and
    * the oracle reconstructs every corpus vector from its codes
    * (centroid lookup + concatenation — the same asymmetric-distance
    * definition) and redoes the full-precision-query-vs-reconstruction
    * cosine ranking from scratch. */
  private def pqOracle(spark: SparkSession,
                       sfDir: String): Map[String, String] = {
    val e = T(spark, sfDir, "embeddings")
    val (codesDf, books) =
      Similarity.pqCodes(e, "vec_id", "embedding")
    val codes = codesDf.collect()
    if (codes.isEmpty) Map.empty
    else {
      val codeValues = codes.map { r =>
        s"(${r.getLong(0)},[${r.getSeq[Int](1).mkString(",")}])"
      }.mkString(",")
      // java.lang.Double.toString round-trips, so the literal the
      // oracle parses is bit-identical to the centroid the engine used
      val bookValues = books.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (c, j) =>
          s"($s,$j,[${c.mkString(",")}])"
        }
      }.mkString(",")
      // shared reconstruction closure: codes decoded via the codebooks
      val reconCte =
        s"""codes(vec_id, c) AS (VALUES $codeValues),
           |books(s, j, v) AS (VALUES $bookValues),
           |x AS (
           |  SELECT vec_id, g.i - 1 AS s, c[g.i] AS j
           |  FROM codes, UNNEST(generate_series(1, len(c))) AS g(i)),
           |r AS (
           |  SELECT x.vec_id AS neighbor_id,
           |    flatten(list(b.v ORDER BY x.s)) AS recon
           |  FROM x JOIN books b ON b.s = x.s AND b.j = x.j
           |  GROUP BY x.vec_id),
           |q AS (
           |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings WHERE vec_id < 10)""".stripMargin
      val rankSql =
        """SELECT query_id, neighbor_id, cos_sim,
          |  CAST(row_number() OVER (PARTITION BY query_id
          |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
          |FROM p QUALIFY rank <= 5""".stripMargin
      val pq = Map("q_embed_pq_topk" ->
        s"""WITH $reconCte,
           |p AS (
           |  SELECT q.query_id, CAST(r.neighbor_id AS BIGINT) AS neighbor_id,
           |    floor(list_cosine_similarity(q.v, r.recon) * 10000 + 0.5)
           |      / 10000 AS cos_sim
           |  FROM q, r WHERE q.query_id <> r.neighbor_id)
           |$rankSql""".stripMargin)
      // IVF-PQ: the probe set is deterministic too — embed it plus
      // the residual coding (codes carry the coarse cell at the
      // head), and re-rank only the probed candidates over the
      // centroid + decoded-residual reconstruction
      val e2 = T(spark, sfDir, "embeddings")
      // ONE training: codes, centroids, and codebooks come from
      // residualPqCodes, and the candidate dump reuses them
      val (rCodesDf, rCents, rBooks) =
        Similarity.residualPqCodes(e2, "vec_id", "embedding")
      val cand = Similarity.ivfPqCandidatePairsWith(
        e2.where(col("vec_id") < 10), e2, "vec_id", "embedding",
        rCents, rBooks).collect()
      val rCodes = rCodesDf.collect()
      val ivfpq =
        if (cand.isEmpty || rCodes.isEmpty) Map.empty[String, String]
        else {
          val rcValues = rCodes.map { r =>
            s"(${r.getLong(0)},[${r.getSeq[Int](1).mkString(",")}])"
          }.mkString(",")
          val centValues = rCents.zipWithIndex.map { case (c, cell) =>
            s"($cell,[${c.mkString(",")}])"
          }.mkString(",")
          val rBookValues = rBooks.zipWithIndex.flatMap { case (book, s) =>
            book.zipWithIndex.map { case (c, j) =>
              s"($s,$j,[${c.mkString(",")}])"
            }
          }.mkString(",")
          Map("q_embed_ivfpq_ann" ->
            s"""WITH cand(query_id, neighbor_id) AS (VALUES ${pairValues(cand)}),
               |rc(vec_id, c) AS (VALUES $rcValues),
               |cents(cell, cv) AS (VALUES $centValues),
               |rbooks(s, j, v) AS (VALUES $rBookValues),
               |x AS (
               |  SELECT vec_id, g.i - 2 AS s, c[g.i] AS j
               |  FROM rc, UNNEST(generate_series(2, len(c))) AS g(i)),
               |fine AS (
               |  SELECT x.vec_id, flatten(list(b.v ORDER BY x.s)) AS f
               |  FROM x JOIN rbooks b ON b.s = x.s AND b.j = x.j
               |  GROUP BY x.vec_id),
               |r AS (
               |  SELECT rc.vec_id AS neighbor_id,
               |    list_transform(generate_series(1, len(f.f)),
               |      i -> ct.cv[i] + f.f[i]) AS recon
               |  FROM rc
               |  JOIN fine f ON f.vec_id = rc.vec_id
               |  JOIN cents ct ON ct.cell = rc.c[1]),
               |q AS (
               |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
               |  FROM embeddings WHERE vec_id < 10),
               |p AS (
               |  SELECT q.query_id, CAST(r.neighbor_id AS BIGINT) AS neighbor_id,
               |    floor(list_cosine_similarity(q.v, r.recon) * 10000 + 0.5)
               |      / 10000 AS cos_sim
               |  FROM cand c
               |  JOIN q ON q.query_id = c.query_id
               |  JOIN r ON r.neighbor_id = c.neighbor_id)
               |$rankSql""".stripMargin)
        }
      pq ++ ivfpq
    }
  }
}
