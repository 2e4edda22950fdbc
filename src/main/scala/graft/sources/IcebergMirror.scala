package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, concat, lit, raise_error, when}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Apache Iceberg bridge for graft snapshot tables — the Delta
  * mirror's twin on the reference's OWN lake format (the reference's
  * Spark jobs write `iceberg`-provider tables through a Hadoop
  * catalog: /root/reference/airflow/dags/spark_code/
  * write_iceberg_sample.py, catalog config in utils/init_spark.py).
  *
  * EXPORT ([[mirror]]): emits the Iceberg FORMAT v2 metadata tree —
  * `metadata/v<N>.metadata.json` + `version-hint.text` (HadoopCatalog
  * discovery), a manifest-list avro per snapshot and manifest avro
  * files with the spec's pinned field-ids — over the snapshot table's
  * existing parquet, ZERO data copies. Incremental: each graft version
  * becomes one Iceberg snapshot; resume replays the tree itself (the
  * current metadata JSON + its manifests), so the cursor survives
  * vacuumed graft versions. Writes are planned fully before anything
  * is published and `version-hint.text` goes LAST (overwrite-rename),
  * so a reader only ever sees a complete tree.
  *
  * Everything here is implemented from the PUBLIC Iceberg table spec
  * (format v2): avro manifests carry the spec's prescribed
  * `field-id` / `element-id` / `key-id` / `value-id` properties so
  * conforming readers resolve by id; data-file column bounds use the
  * spec's single-value binary serialization (little-endian primitives,
  * UTF-8 strings); and because graft's parquet carries no embedded
  * field ids, the metadata publishes `schema.name-mapping.default`
  * (the spec's name-mapping fallback) keyed by the PHYSICAL column
  * names in the files — renames stay metadata-only on the mirror,
  * exactly like the Delta mirror's columnMapping.
  *
  * IMPORT ([[readIceberg]]): resolves a foreign Iceberg table —
  * version hint (or newest metadata JSON), manifest list, manifests,
  * live data files — and serves it as a DataFrame. Identity-partition
  * values follow the spec's column-projection rule: a source column
  * missing from a data file resolves from the file's own partition
  * metadata (broadcast-joined on `_metadata.file_path`, coalesced
  * with file-stored values so foreign layouts that DO materialize the
  * column read identically). The reader REFUSES what it cannot serve
  * correctly — format v3+, row-level delete manifests, non-parquet
  * data files, renamed columns with no name mapping — rather than
  * returning silently wrong rows (the readDelta conformance-gate
  * discipline). Everything is metadata-plane on the driver:
  * O(manifest entries), never O(rows).
  */
object IcebergMirror {

  private def metaDir(table: String) =
    new Path(table.stripSuffix("/") + "/metadata")

  // ------------------------------------------------------------------
  // type mapping: Spark <-> Iceberg schema JSON
  // ------------------------------------------------------------------

  /** Iceberg type JSON for a Spark type; nested ids allocate through
    * `id` keyed by dotted path (stable across mirror resumes via the
    * name-mapping walk in [[loadState]]). */
  private def icebergTypeJson(dt: DataType, path: String,
      id: (String, String) => Int): JValue = dt match {
    case BooleanType => JString("boolean")
    case ByteType | ShortType | IntegerType => JString("int")
    case LongType => JString("long")
    case FloatType => JString("float")
    case DoubleType => JString("double")
    case StringType => JString("string")
    case BinaryType => JString("binary")
    case DateType => JString("date")
    case TimestampType => JString("timestamptz")
    case TimestampNTZType => JString("timestamp")
    case d: DecimalType => JString(s"decimal(${d.precision}, ${d.scale})")
    case st: StructType => JObject(List(
      "type" -> JString("struct"),
      "fields" -> JArray(st.fields.map { f =>
        JObject(List(
          "id" -> JInt(BigInt(id(s"$path.${f.name}", f.name))),
          "name" -> JString(f.name),
          "required" -> JBool(!f.nullable),
          "type" -> icebergTypeJson(f.dataType, s"$path.${f.name}", id)))
      }.toList)))
    case at: ArrayType => JObject(List(
      "type" -> JString("list"),
      "element-id" -> JInt(BigInt(id(s"$path.element", "element"))),
      "element" -> icebergTypeJson(at.elementType, s"$path.element", id),
      "element-required" -> JBool(!at.containsNull)))
    case mt: MapType => JObject(List(
      "type" -> JString("map"),
      "key-id" -> JInt(BigInt(id(s"$path.key", "key"))),
      "key" -> icebergTypeJson(mt.keyType, s"$path.key", id),
      "value-id" -> JInt(BigInt(id(s"$path.value", "value"))),
      "value" -> icebergTypeJson(mt.valueType, s"$path.value", id),
      "value-required" -> JBool(!mt.valueContainsNull)))
    case other => sys.error(
      s"iceberg mirror: Spark type $other has no Iceberg v2 mapping")
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  /** Spark type of an Iceberg type JSON node; refuses types this
    * reader cannot serve faithfully (uuid, time, v3 nanos). */
  private def sparkTypeOf(j: JValue, where: String): DataType = j match {
    case JString("boolean") => BooleanType
    case JString("int") => IntegerType
    case JString("long") => LongType
    case JString("float") => FloatType
    case JString("double") => DoubleType
    case JString("string") => StringType
    case JString("binary") => BinaryType
    case JString("date") => DateType
    case JString("timestamptz") => TimestampType
    case JString("timestamp") => TimestampNTZType
    case JString(DecimalRe(p, s)) => DecimalType(p.toInt, s.toInt)
    case JString(FixedRe(_)) => BinaryType
    case JString(other) => sys.error(
      s"iceberg table at $where: column type '$other' is not " +
        "supported by this reader — refusing")
    case o: JObject => (o \ "type") match {
      case JString("struct") => StructType((o \ "fields") match {
        case JArray(fs) => fs.map { f =>
          StructField(
            str(f \ "name").getOrElse(sys.error("unnamed struct field")),
            sparkTypeOf(f \ "type", where),
            nullable = (f \ "required") != JBool(true))
        }.toArray
        case _ => sys.error(s"iceberg table at $where: struct without fields")
      })
      case JString("list") => ArrayType(
        sparkTypeOf(o \ "element", where),
        containsNull = (o \ "element-required") != JBool(true))
      case JString("map") => MapType(
        sparkTypeOf(o \ "key", where),
        sparkTypeOf(o \ "value", where),
        valueContainsNull = (o \ "value-required") != JBool(true))
      case other => sys.error(
        s"iceberg table at $where: unsupported nested type $other")
    }
    case other => sys.error(
      s"iceberg table at $where: malformed type node $other")
  }

  private def str(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case _ => None
  }
  private def lng(j: JValue): Option[Long] = j match {
    case JInt(n) => Some(n.toLong)
    case JLong(n) => Some(n)
    case _ => None
  }

  // ------------------------------------------------------------------
  // single-value binary serialization (spec Appendix D)
  // ------------------------------------------------------------------

  private def le(n: Int, v: Long): Array[Byte] = {
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Bound bytes for a manifest-stat string under its Spark type, per
    * the spec's single-value serialization; None when the canonical
    * stat form cannot map (the column then just carries no bound). */
  private def boundBytes(dt: DataType, s: String): Option[Array[Byte]] =
    try dt match {
      case ByteType | ShortType | IntegerType | DateType =>
        Some(le(4, s.toLong))
      case LongType | TimestampType | TimestampNTZType =>
        Some(le(8, s.toLong))
      case FloatType =>
        Some(le(4, java.lang.Float.floatToIntBits(s.toFloat).toLong))
      case DoubleType =>
        Some(le(8, java.lang.Double.doubleToLongBits(s.toDouble)))
      case BooleanType =>
        Some(Array[Byte](if (s.toBoolean) 1 else 0))
      case StringType =>
        // manifest string min/max were reduced under UTF-16 ordering
        // (statLt); Iceberg readers compare bound bytes in UTF-8
        // order, and the two diverge above the BMP — export only
        // ASCII bounds (identical under both orders); a dropped bound
        // costs a scan, never a wrong skip
        if (s.forall(_ < 0x80)) Some(s.getBytes("UTF-8")) else None
      case _ => None
    } catch { case _: NumberFormatException => None }

  // ------------------------------------------------------------------
  // avro plumbing
  // ------------------------------------------------------------------

  private def writeAvroBytes(schema: Schema, meta: Seq[(String, String)],
      rows: Seq[GenericRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    rows.foreach(w.append)
    w.close()
    out.toByteArray
  }

  private def readAvroBytes(bytes: Array[Byte])
      : (Schema, Map[String, String], Vector[GenericRecord]) = {
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val rows = Vector.newBuilder[GenericRecord]
    while (r.hasNext) rows += r.next()
    val metaKeys = r.getMetaKeys.asScala.toSeq
    val meta = metaKeys.flatMap(k =>
      Option(r.getMetaString(k)).map(k -> _)).toMap
    val s = r.getSchema
    r.close()
    (s, meta, rows.result())
  }

  private def readFileBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Array[Byte] = {
    val in = fs.open(p)
    try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
  }

  private def writeFileBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    out.write(bytes); out.close()
  }

  /** Field of `rec` by the spec's field-id property (the resolution
    * rule Iceberg prescribes), name as fallback for id-less writers. */
  private def fieldById(rec: GenericRecord, id: Int, name: String): Any = {
    val fs = rec.getSchema.getFields.asScala
    fs.find(f => f.getObjectProp("field-id") match {
      case n: Number => n.intValue == id
      case _ => false
    }).orElse(fs.find(_.name == name))
      .map(f => rec.get(f.pos)).orNull
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue)
    case _ => None
  }
  private def asString(v: Any): Option[String] = v match {
    case null => None
    case s => Some(s.toString)
  }
  private def asBytes(v: Any): Option[Array[Byte]] = v match {
    case b: java.nio.ByteBuffer =>
      val d = b.duplicate(); val a = new Array[Byte](d.remaining)
      d.get(a); Some(a)
    case a: Array[Byte] => Some(a)
    case _ => None
  }

  // ------------------------------------------------------------------
  // avro schemas (field ids per the spec's manifest tables)
  // ------------------------------------------------------------------

  /** avro type string for an identity-partition value of `dt`. */
  private def partitionAvroType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "\"int\""
    case LongType => "\"long\""
    case StringType => "\"string\""
    case BooleanType => "\"boolean\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case TimestampType =>
      """{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":true}"""
    case TimestampNTZType =>
      """{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":false}"""
    case other => sys.error(
      s"iceberg mirror: partition column type $other is not mirrorable")
  }

  /** One partition-spec field as carried by the writer. */
  private final case class SpecField(name: String, sourceId: Int,
      fieldId: Int, dt: DataType)

  private def partitionRecordJson(fields: Seq[SpecField]): String =
    fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${partitionAvroType(f.dt)}],""" +
        s""""default":null,"field-id":${f.fieldId}}"""
    }.mkString(
      """{"type":"record","name":"r102","fields":[""", ",", "]}")

  private def mapJson(recName: String, kId: Int, vId: Int,
      vType: String): String =
    s"""["null",{"type":"array","items":{"type":"record","name":"$recName",""" +
      s""""fields":[{"name":"key","type":"int","field-id":$kId},""" +
      s"""{"name":"value","type":"$vType","field-id":$vId}]},""" +
      s""""logicalType":"map"}]"""

  /** manifest_entry avro schema (v2) for a partition struct. */
  private def manifestEntrySchema(fields: Seq[SpecField]): Schema = {
    val json =
      s"""{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int","field-id":0},
        {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int","field-id":134},
          {"name":"file_path","type":"string","field-id":100},
          {"name":"file_format","type":"string","field-id":101},
          {"name":"partition","type":${partitionRecordJson(fields)},"field-id":102},
          {"name":"record_count","type":"long","field-id":103},
          {"name":"file_size_in_bytes","type":"long","field-id":104},
          {"name":"column_sizes","type":${mapJson("k117_v118", 117, 118, "long")},"default":null,"field-id":108},
          {"name":"value_counts","type":${mapJson("k119_v120", 119, 120, "long")},"default":null,"field-id":109},
          {"name":"null_value_counts","type":${mapJson("k121_v122", 121, 122, "long")},"default":null,"field-id":110},
          {"name":"nan_value_counts","type":${mapJson("k138_v139", 138, 139, "long")},"default":null,"field-id":137},
          {"name":"lower_bounds","type":${mapJson("k126_v127", 126, 127, "bytes")},"default":null,"field-id":125},
          {"name":"upper_bounds","type":${mapJson("k129_v130", 129, 130, "bytes")},"default":null,"field-id":128},
          {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
          {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
          {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
          {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
        ]},"field-id":2}
      ]}"""
    new Schema.Parser().parse(json)
  }

  /** manifest_file avro schema (the manifest LIST rows, v2). Field
    * names follow the Iceberg java writer's on-disk convention
    * (added_data_files_count …); readers resolve by field-id. */
  private val manifestListSchema: Schema = new Schema.Parser().parse(
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
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","type":["null",{"type":"array","items":
        {"type":"record","name":"r508","fields":[
          {"name":"contains_null","type":"boolean","field-id":509},
          {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
          {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
          {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
        ]},"element-id":508}],"default":null,"field-id":507},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}
    ]}""")

  // ------------------------------------------------------------------
  // writer state
  // ------------------------------------------------------------------

  /** One live (or to-be-deleted) data file as a manifest records it. */
  private final case class DFile(path: String, partition: Vector[Any],
      recordCount: Long, fileSize: Long,
      valueCounts: Map[Int, Long], nullCounts: Map[Int, Long],
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]],
      snapshotId: Long, dataSeq: Long)

  /** One manifest as listed by the current snapshot, with enough state
    * to carry it forward or rewrite it when files leave. */
  private final case class MInfo(path: String, length: Long, specId: Int,
      seq: Long, minSeq: Long, addedSnapshotId: Long,
      addedFiles: Int, existingFiles: Int, deletedFiles: Int,
      addedRows: Long, existingRows: Long, deletedRows: Long,
      live: Vector[DFile])

  /** One live v3 deletion-vector entry of a DELETE manifest: a puffin
    * blob (located by offset/size) holding the deleted-row bitmap of
    * `referenced`. `sizeInBytes` is the blob's content size (bitmap +
    * 8 framing bytes); `fileSize` the whole puffin FILE's length (the
    * spec's field 104 — a conforming reader may open the container
    * through its footer using exactly this length); `cardinality` the
    * deleted-row count. */
  private final case class DvEntry(puffin: String, referenced: String,
      offset: Long, sizeInBytes: Long, fileSize: Long, cardinality: Long,
      snapshotId: Long, dataSeq: Long)

  /** One DELETE manifest (content=1, v3 deletion vectors only) as
    * listed by the current snapshot. */
  private final case class DvmInfo(path: String, length: Long,
      specId: Int, seq: Long, minSeq: Long, addedSnapshotId: Long,
      addedFiles: Int, existingFiles: Int, deletedFiles: Int,
      addedRows: Long, existingRows: Long, deletedRows: Long,
      live: Vector[DvEntry])

  private final class IceState {
    var tableUuid: String = ""
    var location: String = ""
    var lastSeq: Long = 0L
    var lastColumnId: Int = 0
    var lastPartitionId: Int = 999
    var currentSchemaId: Int = -1
    val schemas = mutable.ListBuffer[JValue]()
    val specs = mutable.ListBuffer[JValue]()          // spec JSON by spec-id
    val specFields = mutable.ListBuffer[Vector[SpecField]]()
    var defaultSpecId: Int = -1
    var currentSnapshotId: Long = -1L
    val snapshots = mutable.ListBuffer[JValue]()
    val snapshotLog = mutable.ListBuffer[JValue]()
    val metadataLog = mutable.ListBuffer[JValue]()
    var lastUpdated: Long = 0L
    var lastGraft: Option[Long] = None
    var hintVersion: Int = 0                          // current vN
    val colIds = mutable.LinkedHashMap[String, Int]() // dotted phys path -> id
    var manifests = Vector[MInfo]()
    var dvManifests = Vector[DvmInfo]()               // content=1 (v3 DVs)
    var formatVersion: Int = 2                        // 3 once DVs mirror
  }

  private def snapshotIdOf(uuid: String, gv: Long): Long =
    java.util.UUID.nameUUIDFromBytes(
      s"$uuid:snap:$gv".getBytes("UTF-8")).getMostSignificantBits &
      Long.MaxValue

  /** Full-tree name mapping ([{field-id, names, fields?}]) — the
    * spec's resolution path for data files with no embedded field ids
    * (graft parquet), keyed by the PHYSICAL names in the files. Also
    * the writer's own resume source for the path->id allocation. */
  private def nameMappingJson(schema: StructType,
      physOf: String => String, colIds: mutable.LinkedHashMap[String, Int])
      : JValue = {
    def entry(path: String, name: String, dt: DataType): JValue = {
      val kids: List[JValue] = dt match {
        case st: StructType => st.fields.map(f =>
          entry(s"$path.${f.name}", f.name, f.dataType)).toList
        case at: ArrayType =>
          List(entry(s"$path.element", "element", at.elementType))
        case mt: MapType =>
          List(entry(s"$path.key", "key", mt.keyType),
            entry(s"$path.value", "value", mt.valueType))
        case _ => Nil
      }
      JObject(List(
        "field-id" -> JInt(BigInt(colIds(path))),
        "names" -> JArray(List(JString(name)))) ++
        (if (kids.nonEmpty) List("fields" -> (JArray(kids): JValue))
         else Nil))
    }
    JArray(schema.fields.map { f =>
      val p = physOf(f.name)
      entry(p, p, f.dataType)
    }.toList)
  }

  /** Rebuild the dotted-path -> field-id allocation from a name
    * mapping (inverse of [[nameMappingJson]]). */
  private def colIdsOfMapping(mapping: JValue,
      into: mutable.LinkedHashMap[String, Int]): Unit = {
    def walk(j: JValue, prefix: String): Unit = j match {
      case JArray(entries) => entries.foreach { e =>
        val name = (e \ "names") match {
          case JArray(JString(n) :: _) => n
          case _ => sys.error("iceberg mirror: name-mapping entry " +
            "without names — foreign tree, refusing to extend")
        }
        val id = lng(e \ "field-id").getOrElse(sys.error(
          "iceberg mirror: name-mapping entry without field-id")).toInt
        val path = if (prefix.isEmpty) name else s"$prefix.$name"
        into(path) = id
        walk(e \ "fields", path)
      }
      case _ => ()
    }
    walk(mapping, "")
  }

  // ------------------------------------------------------------------
  // resume: load the current tree
  // ------------------------------------------------------------------

  private def hintPath(md: Path) = new Path(md, "version-hint.text")
  private def metadataJsonPath(md: Path, n: Int) =
    new Path(md, s"v$n.metadata.json")

  /** Newest metadata version on disk: the hint when present, else the
    * max vN listing (HadoopCatalog fallback for a torn hint write). */
  private def currentMetadataVersion(fs: org.apache.hadoop.fs.FileSystem,
      md: Path): Option[Int] = {
    val hinted =
      if (!fs.exists(hintPath(md))) None
      else scala.util.Try(new String(
        readFileBytes(fs, hintPath(md)), "UTF-8").trim.toInt).toOption
          .filter(n => fs.exists(metadataJsonPath(md, n)))
    hinted.orElse {
      if (!fs.exists(md)) None
      else fs.listStatus(md).toSeq.map(_.getPath.getName)
        .flatMap { n =>
          val m = """v(\d+)\.metadata\.json""".r
          n match { case m(v) => Some(v.toInt); case _ => None }
        }.maxOption
    }
  }

  private def loadState(spark: SparkSession, table: String): Option[IceState] = {
    val md = metaDir(table)
    val fs = LakeWriter.fsOf(spark, md)
    currentMetadataVersion(fs, md).map { n =>
      val j = JsonMethods.parse(new String(
        readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
      val st = new IceState
      st.hintVersion = n
      val fv0 = lng(j \ "format-version").getOrElse(0L)
      require(fv0 == 2L || fv0 == 3L,
        s"iceberg tree at $table is format v$fv0 — this writer " +
          "extends v2 and its own v3 (deletion-vector) trees only")
      st.formatVersion = fv0.toInt
      // a v3 tree with ROW LINEAGE was not written by this mirror
      // (it never assigns row ids) — extending it would silently
      // break the lineage invariants a v3 reader relies on
      require((j \ "row-lineage") != JBool(true) &&
          (j \ "next-row-id") == JNothing,
        s"iceberg tree at $table enables v3 row lineage — not a " +
          "graft mirror; refusing to extend")
      st.tableUuid = str(j \ "table-uuid").getOrElse(
        sys.error(s"iceberg tree at $table carries no table-uuid"))
      st.location = str(j \ "location").getOrElse(table)
      st.lastSeq = lng(j \ "last-sequence-number").getOrElse(0L)
      st.lastColumnId = lng(j \ "last-column-id").getOrElse(0L).toInt
      st.lastPartitionId = lng(j \ "last-partition-id").getOrElse(999L).toInt
      st.currentSchemaId = lng(j \ "current-schema-id").getOrElse(0L).toInt
      (j \ "schemas") match {
        case JArray(ss) => st.schemas ++= ss
        case _ => sys.error(s"iceberg tree at $table has no schemas")
      }
      st.defaultSpecId = lng(j \ "default-spec-id").getOrElse(0L).toInt
      val schemaTypes: Map[Int, StructType] = st.schemas.map { s =>
        lng(s \ "schema-id").getOrElse(0L).toInt ->
          sparkTypeOf(s, table).asInstanceOf[StructType]
      }.toMap
      val curSchema = schemaTypes(st.currentSchemaId)
      (j \ "partition-specs") match {
        case JArray(ps) => ps.foreach { p =>
          st.specs += p
          val fields = (p \ "fields") match {
            case JArray(fs0) => fs0.map { f =>
              val srcId = lng(f \ "source-id").get.toInt
              require(str(f \ "transform").contains("identity"),
                s"iceberg tree at $table carries a non-identity " +
                  "partition transform — not a graft mirror, refusing")
              // source field type from the CURRENT schema by id —
              // resolved through the schema JSON (ids are stable)
              val dt = (st.schemas(st.currentSchemaId) \ "fields") match {
                case JArray(sf) => sf.collectFirst {
                  case f0 if lng(f0 \ "id").contains(srcId.toLong) =>
                    sparkTypeOf(f0 \ "type", table)
                }.getOrElse(sys.error(
                  s"iceberg tree at $table: partition source $srcId " +
                    "not in current schema"))
                case _ => sys.error("no fields")
              }
              SpecField(str(f \ "name").get, srcId,
                lng(f \ "field-id").get.toInt, dt)
            }.toVector
            case _ => Vector.empty[SpecField]
          }
          st.specFields += fields
        }
        case _ => ()
      }
      (j \ "snapshots") match {
        case JArray(ss) => st.snapshots ++= ss
        case _ => ()
      }
      (j \ "snapshot-log") match {
        case JArray(ss) => st.snapshotLog ++= ss
        case _ => ()
      }
      (j \ "metadata-log") match {
        case JArray(ss) => st.metadataLog ++= ss
        case _ => ()
      }
      st.lastUpdated = lng(j \ "last-updated-ms").getOrElse(0L)
      st.currentSnapshotId = lng(j \ "current-snapshot-id").getOrElse(-1L)
      val curSnap = st.snapshots.find(s =>
        lng(s \ "snapshot-id").contains(st.currentSnapshotId))
      st.lastGraft = curSnap.flatMap(s =>
        str(s \ "summary" \ "graft-version").map(_.toLong))
      // path -> id allocation from the published name mapping
      str(j \ "properties" \ "schema.name-mapping.default").foreach(m =>
        colIdsOfMapping(JsonMethods.parse(m), st.colIds))
      require(st.colIds.nonEmpty,
        s"iceberg tree at $table carries no schema.name-mapping.default" +
          " — not a graft mirror; refusing to extend")
      // manifests of the current snapshot, fully (rewrites need them)
      curSnap.foreach { s =>
        val mlPath = new Path(str(s \ "manifest-list").get)
        val (_, _, allRows) = readAvroBytes(readFileBytes(fs, mlPath))
        val (dvRows, rows) = allRows.partition(r =>
          asLong(fieldById(r, 517, "content")).getOrElse(0L) == 1L)
        st.dvManifests = dvRows.map { r =>
          val mPath = asString(fieldById(r, 500, "manifest_path")).get
          val (_, _, entries) = readAvroBytes(
            readFileBytes(fs, new Path(mPath)))
          val live = entries.flatMap { e =>
            val status = asLong(fieldById(e, 0, "status")).getOrElse(0L)
            if (status == 2L) None
            else {
              val df = fieldById(e, 2, "data_file")
                .asInstanceOf[GenericRecord]
              val fmt = asString(fieldById(df, 101, "file_format"))
                .getOrElse("")
              // this writer emits only v3 puffin DVs as deletes; a
              // position/equality delete file means a foreign MOR
              // writer shaped this tree
              require(fmt.equalsIgnoreCase("puffin"),
                s"iceberg tree at $table carries a $fmt delete " +
                  "file — not a graft mirror; refusing to extend")
              Some(DvEntry(
                asString(fieldById(df, 100, "file_path")).get,
                asString(fieldById(df, 143, "referenced_data_file"))
                  .getOrElse(sys.error(s"iceberg tree at $table: DV " +
                    "entry without referenced_data_file — refusing")),
                asLong(fieldById(df, 144, "content_offset")).getOrElse(
                  sys.error(s"iceberg tree at $table: DV entry " +
                    "without content_offset — refusing")),
                asLong(fieldById(df, 145, "content_size_in_bytes"))
                  .getOrElse(sys.error(s"iceberg tree at $table: DV " +
                    "entry without content_size_in_bytes — refusing")),
                asLong(fieldById(df, 104, "file_size_in_bytes"))
                  .getOrElse(0L),
                asLong(fieldById(df, 103, "record_count")).getOrElse(0L),
                asLong(fieldById(e, 1, "snapshot_id")).getOrElse(
                  st.currentSnapshotId),
                asLong(fieldById(e, 3, "sequence_number"))
                  .getOrElse(st.lastSeq)))
            }
          }
          DvmInfo(mPath,
            asLong(fieldById(r, 501, "manifest_length")).getOrElse(0L),
            asLong(fieldById(r, 502, "partition_spec_id"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 515, "sequence_number")).getOrElse(0L),
            asLong(fieldById(r, 516, "min_sequence_number")).getOrElse(0L),
            asLong(fieldById(r, 503, "added_snapshot_id")).getOrElse(0L),
            asLong(fieldById(r, 504, "added_data_files_count"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 505, "existing_data_files_count"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 506, "deleted_data_files_count"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 512, "added_rows_count")).getOrElse(0L),
            asLong(fieldById(r, 513, "existing_rows_count")).getOrElse(0L),
            asLong(fieldById(r, 514, "deleted_rows_count")).getOrElse(0L),
            live)
        }
        st.manifests = rows.map { r =>
          val mPath = asString(fieldById(r, 500, "manifest_path")).get
          val specId = asLong(fieldById(r, 502, "partition_spec_id"))
            .getOrElse(0L).toInt
          val fields = st.specFields(specId)
          val (_, _, entries) = readAvroBytes(
            readFileBytes(fs, new Path(mPath)))
          val live = entries.flatMap { e =>
            val status = asLong(fieldById(e, 0, "status")).getOrElse(0L)
            if (status == 2L) None
            else {
              val df = fieldById(e, 2, "data_file")
                .asInstanceOf[GenericRecord]
              val part = fieldById(df, 102, "partition")
                .asInstanceOf[GenericRecord]
              def longMap(id: Int, name: String): Map[Int, Long] =
                fieldById(df, id, name) match {
                  case l: java.util.List[_] => l.asScala.map { kv =>
                    val r0 = kv.asInstanceOf[GenericRecord]
                    asLong(r0.get("key")).get.toInt ->
                      asLong(r0.get("value")).get
                  }.toMap
                  case _ => Map.empty
                }
              def bytesMap(id: Int, name: String): Map[Int, Array[Byte]] =
                fieldById(df, id, name) match {
                  case l: java.util.List[_] => l.asScala.map { kv =>
                    val r0 = kv.asInstanceOf[GenericRecord]
                    asLong(r0.get("key")).get.toInt ->
                      asBytes(r0.get("value")).get
                  }.toMap
                  case _ => Map.empty
                }
              Some(DFile(
                asString(fieldById(df, 100, "file_path")).get,
                fields.map(f =>
                  avroToJvm(fieldById(part, f.fieldId, f.name))).toVector,
                asLong(fieldById(df, 103, "record_count")).getOrElse(0L),
                asLong(fieldById(df, 104, "file_size_in_bytes"))
                  .getOrElse(0L),
                longMap(109, "value_counts"), longMap(110, "null_value_counts"),
                bytesMap(125, "lower_bounds"), bytesMap(128, "upper_bounds"),
                asLong(fieldById(e, 1, "snapshot_id")).getOrElse(
                  st.currentSnapshotId),
                asLong(fieldById(e, 3, "sequence_number"))
                  .getOrElse(st.lastSeq)))
            }
          }
          MInfo(mPath,
            asLong(fieldById(r, 501, "manifest_length")).getOrElse(0L),
            specId,
            asLong(fieldById(r, 515, "sequence_number")).getOrElse(0L),
            asLong(fieldById(r, 516, "min_sequence_number")).getOrElse(0L),
            asLong(fieldById(r, 503, "added_snapshot_id")).getOrElse(0L),
            asLong(fieldById(r, 504, "added_data_files_count"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 505, "existing_data_files_count"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 506, "deleted_data_files_count"))
              .getOrElse(0L).toInt,
            asLong(fieldById(r, 512, "added_rows_count")).getOrElse(0L),
            asLong(fieldById(r, 513, "existing_rows_count")).getOrElse(0L),
            asLong(fieldById(r, 514, "deleted_rows_count")).getOrElse(0L),
            live)
        }
      }
      val _ = curSchema // current schema resolvable => types supported
      st
    }
  }

  private def avroToJvm(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case other => other
  }

  // ------------------------------------------------------------------
  // mirror (export direction)
  // ------------------------------------------------------------------

  /** Invert hive path escaping (%XX) in a partition value segment. */
  private def hiveUnescape(s: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Typed partition value for the avro partition struct from the
    * hive-path string form. */
  private def partitionJvm(dt: DataType, raw: String): Any =
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case ByteType | ShortType | IntegerType => Integer.valueOf(raw.toInt)
      case LongType => java.lang.Long.valueOf(raw.toLong)
      case StringType => raw
      case BooleanType => java.lang.Boolean.valueOf(raw.toBoolean)
      case DateType => Integer.valueOf(
        java.time.LocalDate.parse(raw).toEpochDay.toInt)
      case other => sys.error(
        s"iceberg mirror: partition column type $other is not mirrorable")
    }

  /** Single-value bytes of a partition JVM value (for field
    * summaries); ordering helper rides the same JVM forms. */
  private def partitionBytes(dt: DataType, v: Any): Option[Array[Byte]] =
    Option(v).flatMap { x =>
      dt match {
        case ByteType | ShortType | IntegerType | DateType =>
          Some(le(4, x.asInstanceOf[Number].longValue))
        case LongType => Some(le(8, x.asInstanceOf[Number].longValue))
        case TimestampType | TimestampNTZType =>
          Some(le(8, x.asInstanceOf[Number].longValue))
        case BooleanType =>
          Some(Array[Byte](if (x.asInstanceOf[Boolean]) 1 else 0))
        case StringType => Some(x.toString.getBytes("UTF-8"))
        case _ => None
      }
    }

  private def partitionLt(dt: DataType, a: Any, b: Any): Boolean =
    dt match {
      case StringType =>
        // UTF-8 byte order (what Iceberg readers compare bound bytes
        // in), NOT Java's UTF-16 code-unit order — they diverge for
        // supplementary characters vs U+E000..U+FFFF
        val ab = a.toString.getBytes("UTF-8")
        val bb = b.toString.getBytes("UTF-8")
        var i = 0
        while (i < ab.length && i < bb.length) {
          val c = (ab(i) & 0xff) - (bb(i) & 0xff)
          if (c != 0) return c < 0
          i += 1
        }
        ab.length < bb.length
      case BooleanType =>
        !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
      case _ => a.asInstanceOf[Number].longValue <
        b.asInstanceOf[Number].longValue
    }

  /** avro record for one manifest entry. */
  private def entryRecord(schema: Schema, status: Int, snapshotId: Long,
      dataSeq: Long, f: DFile, fields: Seq[SpecField]): GenericRecord = {
    val e = new GenericData.Record(schema)
    e.put("status", Integer.valueOf(status))
    e.put("snapshot_id", java.lang.Long.valueOf(snapshotId))
    e.put("sequence_number", java.lang.Long.valueOf(dataSeq))
    e.put("file_sequence_number", java.lang.Long.valueOf(dataSeq))
    val dfS = schema.getField("data_file").schema()
    val df = new GenericData.Record(dfS)
    df.put("content", Integer.valueOf(0))
    df.put("file_path", f.path)
    df.put("file_format", "PARQUET")
    val partS = dfS.getField("partition").schema()
    val part = new GenericData.Record(partS)
    fields.zipWithIndex.foreach { case (sf, i) =>
      part.put(sf.name, f.partition(i))
    }
    df.put("partition", part)
    df.put("record_count", java.lang.Long.valueOf(f.recordCount))
    df.put("file_size_in_bytes", java.lang.Long.valueOf(f.fileSize))
    def mapRecords(field: String, m: Map[Int, _]): Unit =
      if (m.nonEmpty) {
        val arrS = dfS.getField(field).schema().getTypes.get(1)
        val itemS = arrS.getElementType
        val l = new java.util.ArrayList[GenericRecord](m.size)
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val r = new GenericData.Record(itemS)
          r.put("key", Integer.valueOf(k))
          r.put("value", v match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case n: Long => java.lang.Long.valueOf(n)
            case o => o
          })
          l.add(r)
        }
        df.put(field, l)
      }
    mapRecords("value_counts", f.valueCounts)
    mapRecords("null_value_counts", f.nullCounts)
    mapRecords("lower_bounds", f.lower)
    mapRecords("upper_bounds", f.upper)
    e.put("data_file", df)
    e
  }

  /** Build + serialize one manifest avro; returns (bytes, MInfo sans
    * path/length which the caller assigns). */
  private def buildManifest(entries: Seq[(Int, Long, Long, DFile)],
      fields: Seq[SpecField], specId: Int, specJson: String,
      schemaJson: String, addedSnapshotId: Long, seq: Long)
      : (Array[Byte], MInfo) = {
    val es = manifestEntrySchema(fields)
    val recs = entries.map { case (status, sid, dseq, f) =>
      entryRecord(es, status, sid, dseq, f, fields)
    }
    val bytes = writeAvroBytes(es, Seq(
      "schema" -> schemaJson,
      "partition-spec" -> specJson,
      "partition-spec-id" -> specId.toString,
      "format-version" -> "2",
      "content" -> "data"), recs)
    val by = entries.groupBy(_._1)
    def cnt(s: Int) = by.getOrElse(s, Nil).size
    def rows(s: Int) = by.getOrElse(s, Nil).map(_._4.recordCount).sum
    val live = entries.filter(_._1 != 2).map { case (_, sid, dseq, f) =>
      f.copy(snapshotId = sid, dataSeq = dseq)
    }.toVector
    (bytes, MInfo("", bytes.length.toLong, specId, seq,
      entries.map(_._3).minOption.getOrElse(seq), addedSnapshotId,
      cnt(1), cnt(0), cnt(2), rows(1), rows(0), rows(2), live))
  }

  /** manifest_file record for the manifest list, with per-spec-field
    * partition summaries over the manifest's entries. */
  private def manifestFileRecord(m: MInfo, fields: Seq[SpecField],
      allParts: Seq[Vector[Any]]): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", m.path)
    r.put("manifest_length", java.lang.Long.valueOf(m.length))
    r.put("partition_spec_id", Integer.valueOf(m.specId))
    r.put("content", Integer.valueOf(0))
    r.put("sequence_number", java.lang.Long.valueOf(m.seq))
    r.put("min_sequence_number", java.lang.Long.valueOf(m.minSeq))
    r.put("added_snapshot_id", java.lang.Long.valueOf(m.addedSnapshotId))
    r.put("added_data_files_count", Integer.valueOf(m.addedFiles))
    r.put("existing_data_files_count", Integer.valueOf(m.existingFiles))
    r.put("deleted_data_files_count", Integer.valueOf(m.deletedFiles))
    r.put("added_rows_count", java.lang.Long.valueOf(m.addedRows))
    r.put("existing_rows_count", java.lang.Long.valueOf(m.existingRows))
    r.put("deleted_rows_count", java.lang.Long.valueOf(m.deletedRows))
    if (fields.nonEmpty && allParts.nonEmpty) {
      val arrS = manifestListSchema.getField("partitions")
        .schema().getTypes.get(1)
      val itemS = arrS.getElementType
      val l = new java.util.ArrayList[GenericRecord](fields.size)
      fields.zipWithIndex.foreach { case (sf, i) =>
        val vals = allParts.map(_(i))
        val nonNull = vals.filter(_ != null)
        val s = new GenericData.Record(itemS)
        s.put("contains_null",
          java.lang.Boolean.valueOf(nonNull.size < vals.size))
        if (nonNull.nonEmpty) {
          val lo = nonNull.reduce((a, b) =>
            if (partitionLt(sf.dt, a, b)) a else b)
          val hi = nonNull.reduce((a, b) =>
            if (partitionLt(sf.dt, a, b)) b else a)
          partitionBytes(sf.dt, lo).foreach(b =>
            s.put("lower_bound", java.nio.ByteBuffer.wrap(b)))
          partitionBytes(sf.dt, hi).foreach(b =>
            s.put("upper_bound", java.nio.ByteBuffer.wrap(b)))
        }
        l.add(s)
      }
      r.put("partitions", l)
    }
    r
  }

  // ------------------------------------------------------------------
  // v3 deletion-vector WRITE (puffin blobs + DELETE manifests)
  // ------------------------------------------------------------------

  /** manifest_entry schema for a DELETE manifest carrying v3 deletion
    * vectors: the data_file struct under an UNPARTITIONED spec (a DV
    * applies to exactly one referenced file — partition pruning rides
    * the data manifests), plus the v3 fields 143-145 locating the
    * blob inside its puffin file. */
  private lazy val dvEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
        {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
        {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}
      ]},"field-id":2}
    ]}""")

  private def dvEntryRecord(status: Int, snapshotId: Long,
      dataSeq: Long, d: DvEntry): GenericRecord = {
    val e = new GenericData.Record(dvEntrySchema)
    e.put("status", Integer.valueOf(status))
    e.put("snapshot_id", java.lang.Long.valueOf(snapshotId))
    e.put("sequence_number", java.lang.Long.valueOf(dataSeq))
    e.put("file_sequence_number", java.lang.Long.valueOf(dataSeq))
    val dfS = dvEntrySchema.getField("data_file").schema()
    val df = new GenericData.Record(dfS)
    df.put("content", Integer.valueOf(1))
    df.put("file_path", d.puffin)
    df.put("file_format", "PUFFIN")
    df.put("partition",
      new GenericData.Record(dfS.getField("partition").schema()))
    df.put("record_count", java.lang.Long.valueOf(d.cardinality))
    df.put("file_size_in_bytes", java.lang.Long.valueOf(d.fileSize))
    df.put("referenced_data_file", d.referenced)
    df.put("content_offset", java.lang.Long.valueOf(d.offset))
    df.put("content_size_in_bytes", java.lang.Long.valueOf(d.sizeInBytes))
    e.put("data_file", df)
    e
  }

  /** Build + serialize one DELETE manifest; same carry/rewrite shape
    * as [[buildManifest]] (path/length assigned by the caller). */
  private def buildDvManifest(entries: Seq[(Int, Long, Long, DvEntry)],
      specId: Int, schemaJson: String, addedSnapshotId: Long, seq: Long)
      : (Array[Byte], DvmInfo) = {
    val recs = entries.map { case (status, sid, dseq, d) =>
      dvEntryRecord(status, sid, dseq, d)
    }
    val bytes = writeAvroBytes(dvEntrySchema, Seq(
      "schema" -> schemaJson,
      "partition-spec" -> "[]",
      "partition-spec-id" -> specId.toString,
      "format-version" -> "3", // DV manifests exist only in v3 trees
      "content" -> "deletes"), recs)
    val by = entries.groupBy(_._1)
    def cnt(s: Int) = by.getOrElse(s, Nil).size
    def rows(s: Int) = by.getOrElse(s, Nil).map(_._4.cardinality).sum
    val live = entries.filter(_._1 != 2).map { case (_, sid, dseq, d) =>
      d.copy(snapshotId = sid, dataSeq = dseq)
    }.toVector
    (bytes, DvmInfo("", bytes.length.toLong, specId, seq,
      entries.map(_._3).minOption.getOrElse(seq), addedSnapshotId,
      cnt(1), cnt(0), cnt(2), rows(1), rows(0), rows(2), live))
  }

  /** manifest_file record for a DELETE manifest (content=1, no
    * partition summaries — the spec is unpartitioned). */
  private def dvManifestFileRecord(m: DvmInfo): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", m.path)
    r.put("manifest_length", java.lang.Long.valueOf(m.length))
    r.put("partition_spec_id", Integer.valueOf(m.specId))
    r.put("content", Integer.valueOf(1))
    r.put("sequence_number", java.lang.Long.valueOf(m.seq))
    r.put("min_sequence_number", java.lang.Long.valueOf(m.minSeq))
    r.put("added_snapshot_id", java.lang.Long.valueOf(m.addedSnapshotId))
    r.put("added_data_files_count", Integer.valueOf(m.addedFiles))
    r.put("existing_data_files_count", Integer.valueOf(m.existingFiles))
    r.put("deleted_data_files_count", Integer.valueOf(m.deletedFiles))
    r.put("added_rows_count", java.lang.Long.valueOf(m.addedRows))
    r.put("existing_rows_count", java.lang.Long.valueOf(m.existingRows))
    r.put("deleted_rows_count", java.lang.Long.valueOf(m.deletedRows))
    r
  }

  /** Serialize ONE puffin file holding a deletion-vector-v1 blob per
    * (referenced data file, portable-roaring bitmap bytes,
    * cardinality) — the public Puffin container (magic, blobs, JSON
    * footer) with each blob in the v3 framing (4-byte BE length of
    * the vector, the magic-led portable RoaringBitmapArray, 4-byte BE
    * CRC-32 of the vector). Returns the file bytes and each blob's
    * (content_offset, content_size_in_bytes) for the manifest. */
  private def buildPuffin(blobs: Seq[(String, Array[Byte], Long)],
      snapshotId: Long, seq: Long)
      : (Array[Byte], Map[String, (Long, Long)]) = {
    val magic = Array[Byte]('P', 'F', 'A', '1')
    val body = new java.io.ByteArrayOutputStream()
    body.write(magic)
    val located = blobs.map { case (referenced, vec, card) =>
      val off = body.size().toLong
      val crc = new java.util.zip.CRC32(); crc.update(vec)
      val bb = java.nio.ByteBuffer.allocate(vec.length + 8)
      bb.putInt(vec.length); bb.put(vec); bb.putInt(crc.getValue.toInt)
      body.write(bb.array())
      (referenced, off, vec.length + 8L, card)
    }
    def jstr(s: String): String = JsonMethods.compact(
      JsonMethods.render(JString(s)))
    val payload = located.map { case (referenced, off, sz, card) =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$seq,""" +
        s""""offset":$off,"length":$sz,"properties":{""" +
        s""""referenced-data-file":${jstr(referenced)},""" +
        s""""cardinality":"$card"}}"""
    }.mkString("""{"blobs":[""", ",", """],"properties":{}}""")
      .getBytes("UTF-8")
    val footer = java.nio.ByteBuffer.allocate(4 + payload.length + 12)
    footer.put(magic).put(payload)
    footer.order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length)
    footer.putInt(0) // flags: payload uncompressed
    footer.put(magic)
    body.write(footer.array())
    (body.toByteArray,
      located.map(l => l._1 -> (l._2, l._3)).toMap)
  }

  /** Row count of a parquet file from its footer (fallback for
    * pre-stats manifests) — metadata-only, no data IO. */
  private def footerRowCount(conf: org.apache.hadoop.conf.Configuration,
      file: String): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(file), conf))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

  /** Mirror `table`'s snapshot history into an Iceberg v2 metadata
    * tree under `<table>/metadata/` — one Iceberg snapshot per graft
    * version, zero data copies. Incremental: already-mirrored versions
    * are skipped (cursor = the `graft-version` summary property of the
    * current snapshot). Graft MERGE-ON-READ deletion vectors mirror
    * as format-v3 puffin blobs + DELETE manifests (one puffin per
    * version packing every new/changed bitmap; unchanged DVs carry
    * forward; a replaced bitmap tombstones its old entry — the spec's
    * at-most-one-DV-per-file rule); the first DV-bearing version
    * upgrades the tree to v3 ONLY under `allowV3 = true` (this writer
    * emits no v3 row-lineage fields, so spec-strict readers reject
    * its v3 trees; the default is a loud refusal that publishes
    * nothing). Returns the number of versions mirrored. */
  def mirror(spark: SparkSession, table: String,
             fromVersion: Option[Long] = None,
             allowV3: Boolean = false): Long = {
    val versions = LakeWriter.snapshotVersions(spark, table)
    require(versions.nonEmpty, s"no snapshot history at $table")
    val md = metaDir(table)
    val fs = LakeWriter.fsOf(spark, md)
    val root = fs.makeQualified(new Path(table)).toString

    val st = loadState(spark, table).getOrElse {
      val s = new IceState
      s.tableUuid = java.util.UUID.nameUUIDFromBytes(
        s"graft:iceberg:$table".getBytes("UTF-8")).toString
      s.location = root
      s
    }
    require(st.snapshots.isEmpty || st.lastGraft.nonEmpty,
      s"iceberg mirror of $table: existing metadata tree carries no " +
        "graft-version cursor — not a graft mirror; refusing to extend")

    val tsByVersion = LakeWriter.snapshotTimestamps(spark, table).toMap
    val todo = st.lastGraft match {
      case Some(g) => versions.filter(_ > g)
      case None =>
        val start = fromVersion.getOrElse(versions.head)
        require(versions.contains(start),
          s"iceberg mirror of $table: fromVersion $start is not a " +
            s"snapshot version (have ${versions.mkString(",")})")
        versions.filter(_ >= start)
    }
    if (todo.isEmpty) return 0L

    // plan EVERY write before publishing any: a refusal mid-history
    // must leave the tree untouched (version-hint.text goes last)
    val planned = mutable.ListBuffer[(Path, Array[Byte])]()
    // puffin bytes planned THIS call, by qualified path: a later
    // version's DV carry-check must read an earlier version's blob
    // before anything is published
    val plannedPuffins = mutable.Map[String, Array[Byte]]()
    val hconf = spark.sessionState.newHadoopConf()

    todo.foreach { gv =>
      // MERGE-ON-READ deletion vectors mirror as v3 puffin blobs +
      // DELETE manifests below — the first DV-bearing version
      // upgrades the tree to format v3 (a legal, monotone upgrade;
      // prior snapshots stay valid, v3 readers read v2 manifests).
      // The upgrade is OPT-IN: this writer does not emit the v3
      // row-lineage fields (next-row-id / first-row-id — their
      // assignment rules need the authoritative spec, unavailable
      // here), so spec-strict v3 readers (e.g. Iceberg Java) reject
      // the tree; without `allowV3` the mirror refuses loudly and
      // publishes NOTHING rather than hand a foreign engine a tree it
      // cannot read. An already-v3 tree carries on without the flag —
      // the one-way choice was already made.
      val dvsByBase = LakeWriter.parseManifestDvs(spark, table, gv)
      if (dvsByBase.nonEmpty && st.formatVersion < 3) {
        require(allowV3,
          s"iceberg mirror of $table: graft version $gv carries " +
            "merge-on-read deletion vectors, which mirror as Iceberg " +
            "format-v3 puffin DVs — but this writer emits no v3 " +
            "row-lineage fields (next-row-id / first-row-id), so " +
            "spec-strict v3 readers reject the tree. Pass " +
            "allowV3 = true to upgrade anyway (one-way, even after " +
            "compaction clears the DVs), or clear the DVs first " +
            "(compactSnapshot or a copy-on-write rewrite) to keep " +
            "the mirror v2. Nothing was published.")
        st.formatVersion = 3
      }
      val files = LakeWriter.snapshotFiles(spark, table, gv)
        .map(f => fs.makeQualified(new Path(f)).toString)
      val partCols = LakeWriter.snapshotPartitionCols(spark, table, gv)
      val colmapV = LakeWriter.parseManifestColmap(spark, table, gv)
      val logical = LakeWriter.readSnapshot(spark, table, Some(gv)).schema
      partCols.foreach { c =>
        require(colmapV.phys(c) == c,
          s"iceberg mirror of $table: partition column $c is renamed " +
            "in the column mapping — not mirrorable")
      }
      def alloc(path: String, name: String): Int =
        st.colIds.getOrElseUpdate(path, {
          st.lastColumnId += 1; st.lastColumnId })
      // schema JSON under STABLE ids (keyed by physical name: renames
      // keep the id, type widening keeps the id under the wider type)
      val fieldsJson = logical.fields.map { f =>
        val phys = colmapV.phys(f.name)
        JObject(List(
          "id" -> JInt(BigInt(alloc(phys, phys))),
          "name" -> JString(f.name),
          "required" -> JBool(false),
          "type" -> icebergTypeJson(f.dataType, phys, alloc)))
      }.toList
      val schemaIdOf: Option[Int] = st.schemas.zipWithIndex.collectFirst {
        case (s, i) if (s \ "fields") == JArray(fieldsJson) => i
      }
      val schemaId = schemaIdOf.getOrElse {
        val id = st.schemas.size
        st.schemas += JObject(List(
          "type" -> JString("struct"),
          "schema-id" -> JInt(BigInt(id)),
          "fields" -> JArray(fieldsJson)))
        id
      }
      st.currentSchemaId = schemaId
      val physOfL: Map[String, String] =
        logical.fields.map(f => f.name -> colmapV.phys(f.name)).toMap
      val typeOfL: Map[String, DataType] =
        logical.fields.map(f => f.name -> f.dataType).toMap

      // partition spec: identity on the hive partition columns; a
      // CHANGED spec allocates a new spec-id (Iceberg expresses spec
      // evolution natively — old manifests keep their old spec)
      val wantSpec = partCols.map(c => (c, st.colIds(c)))
      val specIdOf: Option[Int] = st.specFields.zipWithIndex.collectFirst {
        case (sf, i) if sf.map(f => (f.name, f.sourceId)) == wantSpec => i
      }
      val specId = specIdOf.getOrElse {
        val id = st.specs.size
        val fields = partCols.map { c =>
          st.lastPartitionId += 1
          SpecField(c, st.colIds(c), st.lastPartitionId, typeOfL(c))
        }.toVector
        st.specFields += fields
        st.specs += JObject(List(
          "spec-id" -> JInt(BigInt(id)),
          "fields" -> JArray(fields.map(f => JObject(List(
            "name" -> JString(f.name),
            "transform" -> JString("identity"),
            "source-id" -> JInt(BigInt(f.sourceId)),
            "field-id" -> JInt(BigInt(f.fieldId)))): JValue).toList)))
        id
      }
      st.defaultSpecId = specId
      val spec = st.specFields(specId)
      val specJson = JsonMethods.compact(JsonMethods.render(
        st.specs(specId) \ "fields"))
      val schemaJsonStr = JsonMethods.compact(JsonMethods.render(
        st.schemas(schemaId)))

      val prevLive: Set[String] =
        st.manifests.flatMap(_.live.map(_.path)).toSet
      val nowLive = files.toSet
      val addPaths = files.filterNot(prevLive.contains)
      val removedSet = prevLive -- nowLive

      val ts0 = tsByVersion.getOrElse(gv, System.currentTimeMillis())
      val ts = math.max(ts0, st.lastUpdated + 1) // snapshot-log monotone
      val sid = snapshotIdOf(st.tableUuid, gv)
      val parent = st.currentSnapshotId
      st.lastSeq += 1
      val seq = st.lastSeq

      // a spec change over CARRIED files would leave old-layout files
      // in old-spec manifests forever; graft's migratePartitionSpec
      // rewrites them, after which they arrive here as adds
      val stats = LakeWriter.parseManifestStatsFull(spark, table, gv)
      val meta: Map[String, (Long, Long)] =
        if (addPaths.isEmpty) Map.empty
        else {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(16, math.max(1, addPaths.size)))
          try addPaths.map { f =>
            f -> pool.submit(
              new java.util.concurrent.Callable[(Long, Long)] {
                def call(): (Long, Long) = {
                  val s0 = fs.getFileStatus(new Path(f))
                  (s0.getLen, s0.getModificationTime)
                }
              })
          }.map { case (f, fut) => f -> fut.get() }.toMap
          finally pool.shutdown()
        }

      val physToType: Map[String, DataType] =
        logical.fields.map(f => colmapV.phys(f.name) -> f.dataType).toMap
      val newFiles: Seq[DFile] = addPaths.map { f =>
        val vals: Vector[Any] =
          if (partCols.isEmpty) Vector.empty
          else {
            // hive path extraction, one value per spec field (the
            // shared partitionOfOpt primitive: anchored segments,
            // %XX unescape); a missing segment means the file
            // predates the spec and must be migrated first
            val raws = partCols.map(c => LakeWriter.hiveSegmentOf(c, f))
            require(raws.forall(_.nonEmpty),
              s"iceberg mirror of $table: $f predates the " +
                s"${partCols.mkString(",")} partition spec — run " +
                "migratePartitionSpec before mirroring")
            raws.flatten.toVector.zip(spec).map { case (v, sf) =>
              partitionJvm(sf.dt, hiveUnescape(v)) }
          }
        val fst = stats.get(f.split('/').last)
        val rows = fst.flatMap(_.rows).getOrElse(footerRowCount(hconf, f))
        val (valueCounts, nullCounts, lower, upper) = fst match {
          case None => (Map.empty[Int, Long], Map.empty[Int, Long],
            Map.empty[Int, Array[Byte]], Map.empty[Int, Array[Byte]])
          case Some(s0) =>
            val byId = s0.cols.toSeq.flatMap { case (phys, cs) =>
              st.colIds.get(phys).map(id =>
                (id, physToType.getOrElse(phys, StringType), cs))
            }
            (byId.map { case (id, _, _) => id -> rows }.toMap,
             byId.flatMap { case (id, _, cs) =>
               cs.nulls.map(id -> _) }.toMap,
             byId.flatMap { case (id, dt, cs) =>
               cs.lo.flatMap(boundBytes(dt, _)).map(id -> _) }.toMap,
             byId.flatMap { case (id, dt, cs) =>
               cs.hi.flatMap(boundBytes(dt, _)).map(id -> _) }.toMap)
        }
        DFile(f, vals, rows, meta(f)._1,
          valueCounts, nullCounts, lower, upper, sid, seq)
      }

      var mSeq = 0
      def manifestPath(): Path = {
        val name = java.util.UUID.nameUUIDFromBytes(
          s"${st.tableUuid}:g$gv".getBytes("UTF-8")).toString
        val p = new Path(md, s"$name-m$mSeq.avro")
        mSeq += 1; p
      }

      val nextManifests = mutable.ListBuffer[MInfo]()
      val listParts = mutable.ListBuffer[(MInfo, Seq[SpecField],
        Seq[Vector[Any]])]()
      // carry / rewrite existing manifests
      st.manifests.foreach { m =>
        val hit = m.live.exists(f => removedSet.contains(f.path))
        if (!hit) {
          if (m.live.nonEmpty) {
            nextManifests += m
            listParts += ((m, st.specFields(m.specId),
              m.live.map(_.partition)))
          }
          // else: fully-deleted manifest from an earlier rewrite —
          // drops out of the list (its tombstones served their snapshot)
        } else {
          val kept = m.live.filterNot(f => removedSet.contains(f.path))
          val gone = m.live.filter(f => removedSet.contains(f.path))
          val entries =
            kept.map(f => (0, f.snapshotId, f.dataSeq, f)) ++
            gone.map(f => (2, sid, f.dataSeq, f))
          val mfields = st.specFields(m.specId)
          val mSpecJson = JsonMethods.compact(JsonMethods.render(
            st.specs(m.specId) \ "fields"))
          val (bytes, info0) = buildManifest(entries, mfields, m.specId,
            mSpecJson, schemaJsonStr, sid, seq)
          val p = manifestPath()
          planned += (p -> bytes)
          val info = info0.copy(path = fs.makeQualified(p).toString)
          nextManifests += info
          listParts += ((info, mfields, m.live.map(_.partition)))
        }
      }
      // new manifest for this version's adds
      if (newFiles.nonEmpty) {
        val entries = newFiles.map(f => (1, sid, seq, f))
        val (bytes, info0) = buildManifest(entries, spec, specId,
          specJson, schemaJsonStr, sid, seq)
        val p = manifestPath()
        planned += (p -> bytes)
        val info = info0.copy(path = fs.makeQualified(p).toString)
        nextManifests += info
        listParts += ((info, spec, newFiles.map(_.partition)))
      }
      st.manifests = nextManifests.toVector
        .filter(m => m.live.nonEmpty || m.deletedFiles > 0)

      // ---- v3 deletion vectors (merge-on-read deletes) ----
      // desired state: graft's per-file inline DVs, re-keyed from
      // base names to the mirrored absolute paths; identity check vs
      // the previously mirrored entry is (size, cardinality), with a
      // byte-compare read-back for the rare same-size same-count case
      // (an unchanged bitmap must carry forward, not re-publish)
      val byBase: Map[String, String] =
        files.map(f => f.split('/').last -> f).toMap
      // a base-name collision between live files (possible across
      // partition directories) would silently re-key a DV to the
      // WRONG data file and delete the wrong rows — refuse instead
      // (only DV re-keying reads byBase, so DV-less versions with a
      // collision stay mirrorable)
      require(dvsByBase.isEmpty || byBase.size == files.size, {
        val dup = files.groupBy(_.split('/').last)
          .collect { case (bn, fs) if fs.size > 1 => bn }
        s"iceberg mirror of $table: version $gv has ${files.size} " +
          s"live files but only ${byBase.size} distinct base names " +
          s"(duplicates: ${dup.take(3).mkString(", ")}) — deletion " +
          "vectors key by base name, so a collision would mis-assign " +
          "a DV; not mirrorable"
      })
      val dvWanted: Map[String, LakeWriter.InlineDv] =
        dvsByBase.map { case (bn, dv) =>
          val p = byBase.getOrElse(bn, sys.error(
            s"iceberg mirror of $table: version $gv carries a DV " +
              s"for $bn which is not a live file — corrupt manifest"))
          p -> dv
        }
      val prevDv: Map[String, DvEntry] =
        st.dvManifests.flatMap(_.live.map(e => e.referenced -> e)).toMap
      val blobCache = mutable.Map[(String, Long), Array[Byte]]()
      def blobBytes(e: DvEntry): Array[Byte] =
        blobCache.getOrElseUpdate((e.puffin, e.offset), {
          val b = plannedPuffins.get(e.puffin) match {
            case Some(bytes) => // planned this call, not yet on disk
              java.util.Arrays.copyOfRange(bytes, e.offset.toInt,
                (e.offset + e.sizeInBytes).toInt)
            case None =>
              val in = fs.open(new Path(e.puffin))
              try {
                in.seek(e.offset)
                val buf = new Array[Byte](e.sizeInBytes.toInt)
                in.readFully(buf); buf
              } finally in.close()
          }
          java.util.Arrays.copyOfRange(b, 4, b.length - 4)
        })
      val changedRefs: Set[String] = dvWanted.filter { case (p, dv) =>
        prevDv.get(p) match {
          case None => true
          case Some(e) =>
            e.sizeInBytes != dv.sizeInBytes + 8L ||
            e.cardinality != dv.cardinality ||
            !java.util.Arrays.equals(blobBytes(e), dv.bytes)
        }
      }.keySet
      // entries that must leave: the referenced file left, graft's DV
      // is gone (restore to a pre-DV version), or a new bitmap
      // replaces it (the spec's at-most-one-DV-per-file rule)
      val dvGone: Set[String] = prevDv.keySet.filter(p =>
        removedSet.contains(p) || !dvWanted.contains(p) ||
        changedRefs.contains(p))
      val dvChanged = changedRefs.nonEmpty || dvGone.nonEmpty
      // DELETE manifests ride the UNPARTITIONED spec (a DV scopes to
      // exactly one referenced file); allocated on first use, never
      // touching the table's default spec
      lazy val dvSpecId: Int =
        st.specFields.zipWithIndex.collectFirst {
          case (sf, i) if sf.isEmpty => i
        }.getOrElse {
          val id = st.specs.size
          st.specFields += Vector.empty[SpecField]
          st.specs += JObject(List(
            "spec-id" -> JInt(BigInt(id)),
            "fields" -> JArray(Nil)))
          id
        }
      val dvListParts = mutable.ListBuffer[DvmInfo]()
      val nextDvManifests = mutable.ListBuffer[DvmInfo]()
      st.dvManifests.foreach { m =>
        val hit = m.live.exists(e => dvGone.contains(e.referenced))
        if (!hit) {
          if (m.live.nonEmpty) {
            nextDvManifests += m
            dvListParts += m
          }
        } else {
          val kept = m.live.filterNot(e => dvGone.contains(e.referenced))
          val gone = m.live.filter(e => dvGone.contains(e.referenced))
          val entries =
            kept.map(e => (0, e.snapshotId, e.dataSeq, e)) ++
            gone.map(e => (2, sid, e.dataSeq, e))
          val (bytes, info0) = buildDvManifest(entries, m.specId,
            schemaJsonStr, sid, seq)
          val p = manifestPath()
          planned += (p -> bytes)
          val info = info0.copy(path = fs.makeQualified(p).toString)
          nextDvManifests += info
          dvListParts += info
        }
      }
      if (changedRefs.nonEmpty) {
        // one puffin per mirrored version holding every new/changed
        // bitmap (the spec's recommended packing — a version deleting
        // from 10k files is one metadata file, not 10k)
        val puffinName = java.util.UUID.nameUUIDFromBytes(
          s"${st.tableUuid}:dv:$gv".getBytes("UTF-8")).toString
        val puffinPath = new Path(md, s"$puffinName.puffin")
        val ordered = changedRefs.toSeq.sorted
        val (pBytes, locs) = buildPuffin(ordered.map(p =>
          (p, dvWanted(p).bytes, dvWanted(p).cardinality)), sid, seq)
        planned += (puffinPath -> pBytes)
        val qp = fs.makeQualified(puffinPath).toString
        plannedPuffins(qp) = pBytes
        val newEntries = ordered.map { p =>
          val (off, sz) = locs(p)
          (1, sid, seq, DvEntry(qp, p, off, sz, pBytes.length.toLong,
            dvWanted(p).cardinality, sid, seq))
        }
        val (bytes, info0) = buildDvManifest(newEntries, dvSpecId,
          schemaJsonStr, sid, seq)
        val p = manifestPath()
        planned += (p -> bytes)
        val info = info0.copy(path = fs.makeQualified(p).toString)
        nextDvManifests += info
        dvListParts += info
      }
      st.dvManifests = nextDvManifests.toVector
        .filter(m => m.live.nonEmpty || m.deletedFiles > 0)

      // manifest list
      val mlRecords = listParts.map { case (m, fields, parts) =>
        manifestFileRecord(m, fields, parts.toSeq)
      }.toSeq ++ dvListParts.map(dvManifestFileRecord)
      val mlName = s"snap-$sid-1-${java.util.UUID.nameUUIDFromBytes(
        s"${st.tableUuid}:ml:$gv".getBytes("UTF-8"))}.avro"
      val mlPath = new Path(md, mlName)
      planned += (mlPath -> writeAvroBytes(manifestListSchema, Seq(
        "snapshot-id" -> sid.toString,
        "parent-snapshot-id" ->
          (if (parent < 0) "null" else parent.toString),
        "sequence-number" -> seq.toString,
        "format-version" -> st.formatVersion.toString), mlRecords))

      // row-neutral rewrites (graft compaction / z-order / spec
      // migration: files changed, rows did not) stamp the spec's
      // "replace" operation — the signal changelog consumers (ours
      // and Iceberg's reference scan) use to SKIP the snapshot
      // instead of reporting the whole table deleted+reinserted
      val rowNeutral = Set("compact", "optimize", "migrate")
        .contains(LakeWriter.parseManifestMode(spark, table, gv))
      val op =
        if (rowNeutral && (removedSet.nonEmpty || dvChanged)) "replace"
        else if (removedSet.isEmpty && newFiles.isEmpty && dvChanged)
          "delete" // merge-on-read delete: files unchanged, DVs grew
        else if (removedSet.isEmpty && !dvChanged) "append"
        else if (newFiles.isEmpty && !dvChanged) "delete"
        else "overwrite"
      st.snapshots += JObject(List(
        "snapshot-id" -> JInt(BigInt(sid))) ++
        (if (parent >= 0)
          List("parent-snapshot-id" -> (JInt(BigInt(parent)): JValue))
         else Nil) ++ List(
        "sequence-number" -> JInt(BigInt(seq)),
        "timestamp-ms" -> JInt(BigInt(ts)),
        "manifest-list" -> JString(fs.makeQualified(mlPath).toString),
        "summary" -> JObject(List(
          "operation" -> JString(op),
          "graft-version" -> JString(gv.toString),
          "added-data-files" -> JString(newFiles.size.toString),
          "deleted-data-files" -> JString(removedSet.size.toString),
          "added-records" -> JString(
            newFiles.map(_.recordCount).sum.toString)) ++
          (if (dvChanged) List(
            "added-dvs" -> (JString(changedRefs.size.toString): JValue),
            "removed-dvs" -> (JString(dvGone.size.toString): JValue))
           else Nil)),
        "schema-id" -> JInt(BigInt(schemaId))))
      st.snapshotLog += JObject(List(
        "timestamp-ms" -> JInt(BigInt(ts)),
        "snapshot-id" -> JInt(BigInt(sid))))
      if (st.hintVersion > 0)
        st.metadataLog += JObject(List(
          "timestamp-ms" -> JInt(BigInt(st.lastUpdated)),
          "metadata-file" -> JString(fs.makeQualified(
            metadataJsonPath(md, st.hintVersion)).toString)))
      st.currentSnapshotId = sid
      st.lastUpdated = ts
      st.lastGraft = Some(gv)
      st.hintVersion += 1

      val mapping = nameMappingJson(logical, physOfL, st.colIds)
      // v3 once any version mirrors a deletion vector (row lineage is
      // NOT written: this mirror never assigns row ids, and its own
      // reader + loadState refuse lineage-bearing trees — the same
      // whitelist posture, documented in docs/iceberg_mirror.md)
      val metaJson = JObject(List(
        "format-version" -> JInt(BigInt(st.formatVersion)),
        "table-uuid" -> JString(st.tableUuid),
        "location" -> JString(st.location),
        "last-sequence-number" -> JInt(BigInt(st.lastSeq)),
        "last-updated-ms" -> JInt(BigInt(st.lastUpdated)),
        "last-column-id" -> JInt(BigInt(st.lastColumnId)),
        "current-schema-id" -> JInt(BigInt(st.currentSchemaId)),
        "schemas" -> JArray(st.schemas.toList),
        "default-spec-id" -> JInt(BigInt(st.defaultSpecId)),
        "partition-specs" -> JArray(st.specs.toList),
        "last-partition-id" -> JInt(BigInt(st.lastPartitionId)),
        "default-sort-order-id" -> JInt(0),
        "sort-orders" -> JArray(List(JObject(List(
          "order-id" -> JInt(0), "fields" -> JArray(Nil))))),
        "properties" -> JObject(List(
          "write.format.default" -> JString("parquet"),
          "schema.name-mapping.default" -> JString(
            JsonMethods.compact(JsonMethods.render(mapping))))),
        "current-snapshot-id" -> JInt(BigInt(st.currentSnapshotId)),
        "refs" -> JObject(List("main" -> JObject(List(
          "snapshot-id" -> JInt(BigInt(st.currentSnapshotId)),
          "type" -> JString("branch"))))),
        "snapshots" -> JArray(st.snapshots.toList),
        "snapshot-log" -> JArray(st.snapshotLog.toList),
        "metadata-log" -> JArray(st.metadataLog.toList)))
      planned += (metadataJsonPath(md, st.hintVersion) ->
        JsonMethods.pretty(JsonMethods.render(metaJson))
          .getBytes("UTF-8"))
    }

    // publish: every planned file via tmp + rename — each lands
    // ATOMICALLY under its durable name (a metadata JSON is never
    // listable half-written, which is what lets streamIcebergChanges
    // treat the metadata dir as a file stream) — then the hint LAST
    // (overwrite-rename): a reader sees the old complete tree or the
    // new one
    fs.mkdirs(md)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      md.toUri, spark.sessionState.newHadoopConf())
    planned.foreach { case (p, bytes) =>
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      writeFileBytes(fs, tmp, bytes)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    val hintTmp = new Path(md, ".version-hint.text.tmp")
    writeFileBytes(fs, hintTmp, st.hintVersion.toString.getBytes("UTF-8"))
    org.apache.hadoop.fs.FileContext.getFileContext(hintTmp.toUri,
        spark.sessionState.newHadoopConf())
      .rename(hintTmp, hintPath(md),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    todo.size.toLong
  }

  // ------------------------------------------------------------------
  // expireSnapshots (the cleanupLog twin: own the retention invariant)
  // ------------------------------------------------------------------

  /** Expire all but the newest `retainSnapshots` snapshots — the
    * Iceberg maintenance action (`expire_snapshots`) that keeps a
    * per-version mirror's metadata tree bounded forever. Snapshots a
    * branch or tag points at are RETENTION ROOTS and never expire
    * with the recency window (Iceberg's own semantics — a pinned
    * audit tag keeps resolving; drop the ref to release it).
    * Publishes a NEW metadata JSON with the pruned snapshot set
    * (hint last, the mirror's own atomicity discipline), THEN deletes
    * what nothing retained references: expired manifest lists,
    * manifests referenced only by expired snapshots, and metadata
    * JSONs older than the retained window. Data files are NOT
    * touched — reclaiming them is vacuum's reference-counted job on
    * the graft side. Like Delta's cleanupLog, time travel below the
    * retained window refuses loudly afterwards (readIceberg: "no
    * snapshot"). Works on the raw metadata JSON, so every writer
    * property (schemas, specs, name mapping) carries verbatim.
    * Returns the number of snapshots expired. */
  def expireSnapshots(spark: SparkSession, table: String,
                      retainSnapshots: Int,
                      catalogs: Seq[String] = Nil): Long = {
    require(retainSnapshots >= 1,
      "expireSnapshots: must retain at least the current snapshot")
    val md = metaDir(table)
    val fs = LakeWriter.fsOf(spark, md)
    val n = currentMetadataVersion(fs, md).getOrElse(
      sys.error(s"no iceberg metadata at $table"))
    val j = JsonMethods.parse(new String(
      readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
    val snaps = (j \ "snapshots") match {
      case JArray(ss) => ss.sortBy(s =>
        lng(s \ "sequence-number").getOrElse(0L))
      case _ => Nil
    }
    if (snaps.size <= retainSnapshots) return 0L
    // refs are RETENTION ROOTS (Iceberg's expire_snapshots
    // semantics): a snapshot a branch or tag points at never expires
    // with the recency window — a pinned audit tag keeps resolving
    // however long the stream lives. Recency counts over the full
    // history; ref-pinned snapshots are retained ON TOP of it.
    val refIds: Set[Long] = (j \ "refs") match {
      case JObject(fields) => fields.flatMap { case (_, r) =>
        lng(r \ "snapshot-id") }.toSet
      case _ => Set.empty
    }
    // catalog pins are retention roots too (the graft-catalog twin of
    // refs — a cross-table commit/tag/branch pinning graft version gv
    // protects its mirrored snapshot): graft versions map to snapshot
    // ids via the mirror's deterministic id derivation
    val catalogIds: Set[Long] =
      if (catalogs.isEmpty) Set.empty
      else {
        val uuid = str(j \ "table-uuid").getOrElse(sys.error(
          s"iceberg metadata at $table carries no table-uuid"))
        catalogs.flatMap(c => Catalog.pinnedVersionsOf(spark, c, table))
          .map(gv => snapshotIdOf(uuid, gv)).toSet
      }
    val keepIds = snaps.takeRight(retainSnapshots)
      .flatMap(s => lng(s \ "snapshot-id")).toSet ++ refIds ++
      catalogIds
    val (kept, expired) = snaps.partition(s =>
      lng(s \ "snapshot-id").exists(keepIds))
    if (expired.isEmpty) return 0L
    val curId = lng(j \ "current-snapshot-id").getOrElse(-1L)
    require(kept.exists(s => lng(s \ "snapshot-id").contains(curId)),
      s"expireSnapshots at $table would expire the CURRENT snapshot " +
        "— refusing (the retained window must include the tip)")
    def manifestsOf(lists: Seq[JValue]): Set[(String, Long)] =
      lists.flatMap(s => str(s \ "manifest-list")).flatMap { ml =>
        readAvroBytes(readFileBytes(fs, new Path(ml)))._3
          .map(r => (asString(fieldById(r, 500, "manifest_path")).get,
            asLong(fieldById(r, 517, "content")).getOrElse(0L)))
      }.toSet
    val keptWithContent = manifestsOf(kept)
    val keptManifests = keptWithContent.map(_._1)
    val doomedWithContent = manifestsOf(expired)
      .filterNot(mc => keptManifests.contains(mc._1))
    val doomedManifests = doomedWithContent.map(_._1)
    // puffin DV files referenced ONLY by expired DELETE manifests are
    // delete-plane metadata (the mirror writes them under metadata/);
    // they expire with their manifests — data files are untouched.
    // Only LIVE (status != 2) references retain: a tombstone entry is
    // never opened by a reader, so a puffin whose every retained
    // mention is a tombstone is reclaimable.
    def puffinsOf(ms: Set[(String, Long)], liveOnly: Boolean)
        : Set[String] =
      ms.filter(_._2 == 1L).flatMap { case (m, _) =>
        readAvroBytes(readFileBytes(fs, new Path(m)))._3.flatMap { e =>
          val status = asLong(fieldById(e, 0, "status")).getOrElse(0L)
          if (liveOnly && status == 2L) None
          else {
            val df = fieldById(e, 2, "data_file")
              .asInstanceOf[GenericRecord]
            asString(fieldById(df, 101, "file_format"))
              .filter(_.equalsIgnoreCase("puffin"))
              .flatMap(_ => asString(fieldById(df, 100, "file_path")))
          }
        }
      }
    val doomedPuffins =
      puffinsOf(doomedWithContent, liveOnly = false) --
        puffinsOf(keptWithContent, liveOnly = true)
    val doomedLists = expired.flatMap(s => str(s \ "manifest-list"))
    val expiredIds = expired.flatMap(s => lng(s \ "snapshot-id")).toSet
    // new metadata JSON: snapshots/snapshot-log pruned, metadata-log
    // pruned to files that survive the sweep below, everything else
    // (schemas, specs, properties, ids) verbatim
    val keepMetaFloor = n - retainSnapshots + 1
    val newJ = JObject((j match {
      case JObject(fields) => fields
      case _ => sys.error(s"malformed metadata JSON at $table")
    }).map {
      case ("snapshots", _) => "snapshots" -> JArray(kept)
      case ("snapshot-log", JArray(es)) => "snapshot-log" -> JArray(
        es.filter(e => !lng(e \ "snapshot-id").exists(expiredIds)))
      case ("metadata-log", JArray(es)) => "metadata-log" -> JArray(
        es.filter { e =>
          str(e \ "metadata-file").exists { f =>
            "v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(f)
              .exists(_.group(1).toInt >= keepMetaFloor)
          }
        })
      case other => other
    })
    // tmp + rename: the new metadata JSON lands atomically under its
    // durable name (the streamIcebergChanges file-source contract)
    val mjPath = metadataJsonPath(md, n + 1)
    val mjTmp = new Path(md, s".${mjPath.getName}.tmp")
    writeFileBytes(fs, mjTmp,
      JsonMethods.pretty(JsonMethods.render(newJ)).getBytes("UTF-8"))
    org.apache.hadoop.fs.FileContext.getFileContext(mjTmp.toUri,
        spark.sessionState.newHadoopConf())
      .rename(mjTmp, mjPath,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    val hintTmp = new Path(md, ".version-hint.text.tmp")
    writeFileBytes(fs, hintTmp, (n + 1).toString.getBytes("UTF-8"))
    org.apache.hadoop.fs.FileContext.getFileContext(hintTmp.toUri,
        spark.sessionState.newHadoopConf())
      .rename(hintTmp, hintPath(md),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // sweep AFTER the publish: a crash here leaves orphans, never a
    // hint pointing at missing files
    (doomedLists ++ doomedManifests ++ doomedPuffins).foreach(p =>
      fs.delete(new Path(p), false): Unit)
    // one listing, not a version-count walk: a long-lived stream's
    // floor grows forever while only O(retain) files actually exist
    val vRe = """v(\d+)\.metadata\.json""".r
    fs.listStatus(md).foreach { st0 =>
      st0.getPath.getName match {
        case vRe(k) if k.toInt < keepMetaFloor =>
          fs.delete(st0.getPath, false): Unit
        case _ => ()
      }
    }
    expired.size.toLong
  }

  // ------------------------------------------------------------------
  // readIceberg (import direction)
  // ------------------------------------------------------------------

  /** Snapshots of an Iceberg table: (snapshotId, timestampMs), oldest
    * first — from the current metadata JSON, metadata-only. */
  def icebergSnapshots(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val md = metaDir(dir)
    val fs = LakeWriter.fsOf(spark, md)
    val n = currentMetadataVersion(fs, md).getOrElse(
      sys.error(s"no iceberg metadata at $dir"))
    val j = JsonMethods.parse(new String(
      readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
    (j \ "snapshots") match {
      case JArray(ss) => ss.flatMap(s => for {
        id <- lng(s \ "snapshot-id")
        ts <- lng(s \ "timestamp-ms")
      } yield (id, ts)).sortBy(_._2)
      case _ => Seq.empty
    }
  }

  /** Read an Iceberg table (format v1/v2, plus the v3
    * deletion-vector surface) at its current — or a named — snapshot.
    * Implements the spec's column-projection rule for identity
    * partitions (metadata value when the source column is absent from
    * a data file), v2 POSITION and EQUALITY deletes, and v3 puffin
    * DELETION VECTORS (merge-on-read, all three applied with the
    * sequence-number guards). REFUSES what it cannot serve correctly:
    * v4+, v3 row lineage / initial-defaults, non-parquet data files,
    * and column renames on tables with no name mapping (this reader
    * resolves file columns by name; serving a renamed column would
    * silently read nulls). */
  def readIceberg(spark: SparkSession, dir: String,
                  snapshotId: Option[Long] = None): DataFrame =
    readIcebergImpl(spark, dir, snapshotId, None)

  /** [[readIceberg]] with FILE PRUNING: of the snapshot's live data
    * files, scan only those whose manifest evidence cannot DISPROVE
    * `predicate` — identity-partition values are exact per-file
    * stats, manifest lower/upper bounds (the spec's single-value
    * binary form, decoded by type) carry range proofs, and
    * null_value_counts unlock IS NULL pruning. Pure metadata, no data
    * IO; the predicate is then applied to surviving rows, so results
    * stay exact whatever the bounds coverage (truncated foreign
    * bounds are still valid bounds — pruning stays sound). On a
    * large foreign table this is the difference between scanning a
    * partition and scanning the lake. */
  def readIcebergWhere(spark: SparkSession, dir: String,
                       predicate: org.apache.spark.sql.Column,
                       snapshotId: Option[Long] = None): DataFrame =
    readIcebergImpl(spark, dir, snapshotId, Some(predicate))
      .where(predicate)

  /** Decode a single-value bound into the stat-string space
    * [[graft.plans.GraftDataSkipping]] evaluates (temporal = integer
    * epoch micros/days, numerics in decimal form, strings verbatim);
    * None = no proof (unknown type, malformed length, non-finite). */
  private def statStringOf(dt: DataType, b: Array[Byte]): Option[String] = {
    def le(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (b(i).toLong & 0xff) << (8 * i); i += 1 }
      v
    }
    dt match {
      case ByteType | ShortType | IntegerType | DateType
          if b.length == 4 => Some(le(4).toInt.toString)
      case LongType | TimestampType | TimestampNTZType
          if b.length == 8 => Some(le(8).toString)
      case FloatType if b.length == 4 =>
        val f = java.lang.Float.intBitsToFloat(le(4).toInt)
        if (java.lang.Float.isFinite(f)) Some(f.toString) else None
      case DoubleType if b.length == 8 =>
        val d = java.lang.Double.longBitsToDouble(le(8))
        if (java.lang.Double.isFinite(d)) Some(d.toString) else None
      case StringType => Some(new String(b, "UTF-8"))
      case _ => None
    }
  }

  /** An avro partition value in Spark's EXTERNAL row representation
    * (what createDataFrame expects), typed by the source column. */
  private def avroPvToExternal(dt: DataType, v: Any,
                               dir: String): Any = v match {
    case null => null
    case _ => dt match {
      case IntegerType => Integer.valueOf(v.asInstanceOf[Number].intValue)
      case LongType => java.lang.Long.valueOf(
        v.asInstanceOf[Number].longValue)
      case ShortType => java.lang.Short.valueOf(
        v.asInstanceOf[Number].shortValue)
      case StringType => v.toString
      case BooleanType => v
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue))
      case TimestampType =>
        val us = v.asInstanceOf[Number].longValue
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
      case TimestampNTZType =>
        val us = v.asInstanceOf[Number].longValue
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case other => sys.error(
        s"iceberg table at $dir: identity partition on $other is " +
          "not supported by this reader")
    }
  }

  /** A path as Spark's `_metadata.file_path` renders it (url-encoded
    * single-slash URI form) — the broadcast join key. */
  private def fileKeyOf(p: String,
      hconf: org.apache.hadoop.conf.Configuration): String = {
    val abs = new Path(p)
    val q = abs.getFileSystem(hconf).makeQualified(abs).toUri
    new java.net.URI(q.getScheme, q.getAuthority,
      q.getPath, null, null).toString
  }

  /** (field id, name, type json) of a schema's top-level fields. */
  private def schemaFieldsOf(s: JValue): List[(Int, String, JValue)] =
    (s \ "fields") match {
      case JArray(fs0) => fs0.flatMap(f => for {
        id <- lng(f \ "id")
        nm <- str(f \ "name")
      } yield (id.toInt, nm, f \ "type"))
      case _ => Nil
    }

  /** FILE column names of `curFields` (the name mapping when
    * published, else current names) with the full rename-refusal
    * discipline at every nesting depth — shared by the batch
    * reader and the incremental changes reader. */
  private def resolvePhysByName(dir: String, j: JValue,
      schemasJ: List[JValue], curSchemaJ: JValue,
      curFields: List[(Int, String, JValue)])
      : Map[String, String] = {
    def fieldsOf(s: JValue): List[(Int, String, JValue)] =
      schemaFieldsOf(s)
    val idToName = curFields.map(f => (f._1, f._2)).toMap
    // FILE column names: the name mapping when published (file name ->
    // field id -> current name); else current names — refusing when
    // history shows a rename this reader would misresolve. NESTED
    // fields (struct members at any depth) are walked too: this
    // reader resolves physical names only at the TOP level, so a
    // nested field whose file name differs from its current name —
    // either a mapping entry naming it differently, or a historical
    // schema renaming it with no mapping published — would silently
    // read nulls; both refuse loudly instead.
    def nestedFieldsOf(s: JValue): List[(Int, String)] = {
      def walk(t: JValue, prefix: String, depth: Int): List[(Int, String)] =
        (str(t \ "type"), t \ "fields") match {
          case (Some("struct"), JArray(fs0)) => fs0.flatMap { f =>
            (for { id <- lng(f \ "id"); nm <- str(f \ "name") } yield {
              val path = if (prefix.isEmpty) nm else s"$prefix.$nm"
              val self =
                if (depth > 0) List((id.toInt, path)) else Nil
              self ++ walk(f \ "type", path, depth + 1)
            }).getOrElse(Nil)
          }
          case _ => Nil
        }
      walk(s, "", 0)
    }
    val curNested = nestedFieldsOf(curSchemaJ)
    val curNestedById = curNested.toMap
    val mapping = str(j \ "properties" \ "schema.name-mapping.default")
      .map(JsonMethods.parse(_))
    mapping match {
      case Some(JArray(entries)) =>
        def firstName(e: JValue): Option[String] = (e \ "names") match {
          case JArray(JString(x) :: _) => Some(x)
          case _ => None
        }
        val idToPhys = entries.flatMap(e => for {
          id <- lng(e \ "field-id")
          nm <- firstName(e)
        } yield (id.toInt, nm)).toMap
        // nested mapping entries: (field-id -> file-side name) at any
        // depth below the top level
        def walkNested(es: List[JValue], depth: Int): List[(Int, String)] =
          es.flatMap { e =>
            val self =
              if (depth > 0)
                (for { id <- lng(e \ "field-id"); nm <- firstName(e) }
                  yield (id.toInt, nm)).toList
              else Nil
            self ++ ((e \ "fields") match {
              case JArray(sub) => walkNested(sub, depth + 1)
              case _ => Nil
            })
          }
        val nestedMapped = walkNested(entries, 0)
        nestedMapped.foreach { case (id, fileNm) =>
          curNestedById.get(id).foreach { path =>
            require(path.split('.').last == fileNm,
              s"iceberg table at $dir: name mapping resolves NESTED " +
                s"field id $id to file name '$fileNm' but the current " +
                s"schema names it '$path' — this reader resolves " +
                "physical names at the top level only and would read " +
                "nulls for the renamed member; refusing")
          }
        }
        // ids the mapping does NOT cover still misresolve if history
        // renamed them — same refusal as the no-mapping case, at the
        // top level AND below (a writer-maintained mapping can be
        // stale; falling back to the current name would read nulls
        // from pre-rename files)
        schemasJ.foreach { s =>
          fieldsOf(s).foreach { case (id, nm, _) =>
            if (!idToPhys.contains(id))
              idToName.get(id).foreach(cur => require(cur == nm,
                s"iceberg table at $dir renamed column '$nm' -> " +
                  s"'$cur' and the name mapping carries no entry for " +
                  "it — files written before the rename would read " +
                  "nulls; refusing"))
          }
        }
        val nestedCovered = nestedMapped.map(_._1).toSet
        schemasJ.foreach { s =>
          nestedFieldsOf(s).foreach { case (id, path) =>
            if (!nestedCovered.contains(id))
              curNestedById.get(id).foreach(cur =>
                require(cur.split('.').last == path.split('.').last,
                  s"iceberg table at $dir renamed nested field " +
                    s"'$path' -> '$cur' and the name mapping carries " +
                    "no entry for it — files written before the " +
                    "rename would read nulls; refusing"))
          }
        }
        curFields.map { case (id, nm, _) =>
          nm -> idToPhys.getOrElse(id, nm) }.toMap
      case _ =>
        schemasJ.foreach { s =>
          fieldsOf(s).foreach { case (id, nm, _) =>
            idToName.get(id).foreach(cur => require(cur == nm,
              s"iceberg table at $dir renamed column '$nm' -> '$cur' " +
                "and publishes no schema.name-mapping.default — this " +
                "reader resolves file columns by name and would read " +
                "nulls; refusing"))
          }
          nestedFieldsOf(s).foreach { case (id, path) =>
            curNestedById.get(id).foreach(cur =>
              require(cur.split('.').last == path.split('.').last,
                s"iceberg table at $dir renamed nested field " +
                  s"'$path' -> '$cur' and publishes no " +
                  "schema.name-mapping.default — files written before " +
                  "the rename would read nulls for it; refusing"))
          }
        }
        curFields.map { case (_, nm, _) => nm -> nm }.toMap
    }

  }

  private def readIcebergImpl(spark: SparkSession, dir: String,
                              snapshotId: Option[Long],
                              pruneWith: Option[org.apache.spark.sql.Column])
      : DataFrame = {
    val md = metaDir(dir)
    val fs = LakeWriter.fsOf(spark, md)
    val n = currentMetadataVersion(fs, md).getOrElse(
      sys.error(s"no iceberg metadata at $dir"))
    val j = JsonMethods.parse(new String(
      readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
    val fv = lng(j \ "format-version").getOrElse(1L)
    require(fv <= 3L,
      s"iceberg table at $dir is format v$fv — this reader implements " +
        "v1/v2 and the v3 deletion-vector surface; refusing " +
        "(later-format features would be silently dropped)")
    // v3 acceptance is a WHITELIST: puffin deletion vectors read
    // natively below; everything else v3 adds that would change what
    // a read returns refuses loudly. Row lineage implies synthesized
    // `_row_id`/`_last_updated_sequence_number` columns this reader
    // does not serve; a field's initial-default rewrites what
    // pre-existing files read for an added column.
    if (fv >= 3L) {
      require((j \ "row-lineage") != JBool(true) &&
          (j \ "next-row-id") == JNothing,
        s"iceberg table at $dir enables v3 row lineage — this reader " +
          "does not maintain row ids; refusing")
    }
    val location = str(j \ "location").getOrElse(dir)

    // schemas: current + history (rename detection)
    val schemasJ: List[JValue] = (j \ "schemas") match {
      case JArray(ss) => ss
      case _ => (j \ "schema") match { // v1 single-schema form
        case o: JObject => List(o)
        case _ => sys.error(s"iceberg table at $dir carries no schema")
      }
    }
    val currentSchemaId = lng(j \ "current-schema-id").getOrElse(
      schemasJ.headOption.flatMap(s => lng(s \ "schema-id"))
        .getOrElse(0L))
    val curSchemaJ = schemasJ.find(s =>
      lng(s \ "schema-id").contains(currentSchemaId))
      .orElse(schemasJ.headOption)
      .getOrElse(sys.error(s"iceberg table at $dir: no current schema"))
    def fieldsOf(s: JValue): List[(Int, String, JValue)] =
      schemaFieldsOf(s)
    val curFields = fieldsOf(curSchemaJ)
    // v3 default values: a field carrying initial-default changes
    // what files written BEFORE the column existed must read — this
    // reader would serve nulls there; refuse at any nesting depth
    curSchemaJ.filterField {
      case ("initial-default", v) => v != JNull && v != JNothing
      case _ => false
    } match {
      case Nil =>
      case _ => sys.error(
        s"iceberg table at $dir: a schema field declares a v3 " +
          "initial-default — this reader would serve nulls where the " +
          "default applies; refusing")
    }
    val schema = StructType(curFields.map { case (_, nm, t) =>
      StructField(nm, sparkTypeOf(t, dir), nullable = true)
    })
    val idToName = curFields.map(f => (f._1, f._2)).toMap
    val idToType: Map[Int, DataType] = curFields.map { case (id, _, t) =>
      id -> sparkTypeOf(t, dir) }.toMap

    val physByName: Map[String, String] =
      resolvePhysByName(dir, j, schemasJ, curSchemaJ, curFields)

    // partition specs: spec-id -> identity fields (partition field-id,
    // source field-id); non-identity transforms need no resolution
    // (their source columns live in the data files)
    val specsJ: List[JValue] = (j \ "partition-specs") match {
      case JArray(ss) => ss
      case _ => Nil
    }
    val identityOf: Map[Int, Seq[(Int, Int)]] = specsJ.flatMap { p =>
      lng(p \ "spec-id").map { sidJ =>
        sidJ.toInt -> ((p \ "fields") match {
          case JArray(fs0) => fs0.flatMap { f =>
            if (!str(f \ "transform").contains("identity")) None
            else for {
              fid <- lng(f \ "field-id")
              src <- lng(f \ "source-id")
            } yield (fid.toInt, src.toInt)
          }
          case _ => Nil
        })
      }
    }.toMap
    val specFieldCount: Map[Int, Int] = specsJ.flatMap { p =>
      lng(p \ "spec-id").map(sid => sid.toInt -> ((p \ "fields") match {
        case JArray(fs0) => fs0.size
        case _ => 0
      }))
    }.toMap

    // resolve snapshot
    val snapsJ: List[JValue] = (j \ "snapshots") match {
      case JArray(ss) => ss
      case _ => Nil
    }
    val wantSid = snapshotId.getOrElse(
      lng(j \ "current-snapshot-id").filter(_ >= 0).getOrElse(
        sys.error(s"iceberg table at $dir has no current snapshot")))
    val snap = snapsJ.find(s => lng(s \ "snapshot-id").contains(wantSid))
      .getOrElse(sys.error(
        s"iceberg table at $dir has no snapshot $wantSid"))
    val mlPath = str(snap \ "manifest-list").getOrElse(
      sys.error(s"iceberg table at $dir: snapshot $wantSid carries no " +
        "manifest-list (v1 'manifests' listing form is not supported)"))

    def resolvePath(p: String): String = {
      val hp = new Path(p)
      if (hp.isAbsolute || hp.toUri.getScheme != null) p
      else s"${location.stripSuffix("/")}/$p"
    }

    // live data files with their identity-partition metadata and data
    // sequence numbers; POSITION-DELETE files (merge-on-read v2) are
    // collected alongside — each applies to data files whose data
    // sequence number is <= the delete file's
    final case class Live(path: String, stored: String,
        pvById: Map[Int, Any], dataSeq: Long, rows: Option[Long],
        lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]],
        nullCnt: Map[Int, Long], specId: Int)
    final case class PosDel(path: String, seq: Long)
    final case class EqDel(path: String, seq: Long, eqIds: Seq[Int],
        pvById: Map[Int, Any], scoped: Boolean, specId: Int)
    // v3 puffin deletion vector: one blob inside a puffin file,
    // located by the manifest's (content_offset, content_size)
    final case class DvDel(path: String, seq: Long, referenced: String,
        offset: Long, size: Long, cardinality: Option[Long])
    val (_, _, mlRows) = readAvroBytes(
      readFileBytes(fs, new Path(resolvePath(mlPath))))
    val live = mutable.LinkedHashMap[String, Live]()
    val posDels = mutable.ListBuffer[PosDel]()
    val eqDels = mutable.ListBuffer[EqDel]()
    val dvDels = mutable.ListBuffer[DvDel]()
    // DRIVER-HEAP guard (the readDelta maxLiveFiles twin): the
    // resolved live map is driver state — one entry per data file,
    // with bounds byte-arrays. A million-file foreign tree would OOM
    // the driver SILENTLY mid-fold; fail loudly at a conf-set ceiling
    // instead, re-checked as each manifest folds in.
    val liveCeiling = spark.conf.get("spark.graft.iceberg.maxLiveFiles",
      "2000000").toLong
    def guardLive(): Unit = {
      val n = live.size.toLong + posDels.size + eqDels.size + dvDels.size
      if (n > liveCeiling) sys.error(
        s"readIceberg at $dir: snapshot $wantSid resolves more than " +
          s"$liveCeiling live/delete file entries — the file list is " +
          "driver-resident state and this tree would exhaust the " +
          "driver heap. Raise spark.graft.iceberg.maxLiveFiles if " +
          "the heap allows, or compact the table first")
    }
    // manifest avro fetch+decode is I/O-bound and per-manifest
    // independent: run it on a bounded pool (the footer-sweep
    // discipline) with a BOUNDED LOOKAHEAD — at most 32 decoded
    // manifests are ever in flight, so the maxLiveFiles ceiling below
    // stays the binding limit (a strict prefetch of every manifest
    // would hold the whole tree's decoded entries on the driver and
    // OOM before the guard could fire). The fold stays serial in
    // manifest-list order, so the resolved state is deterministic.
    val manifestPool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, mlRows.size)))
    def foldManifests(
        handle: (GenericRecord, Seq[GenericRecord]) => Unit): Unit =
      try {
        val pending = scala.collection.mutable.Queue[
          (GenericRecord,
            java.util.concurrent.Future[Seq[GenericRecord]])]()
        val it = mlRows.iterator
        def submit(mrec: GenericRecord): Unit = {
          val mPath = asString(fieldById(mrec, 500, "manifest_path")).get
          pending += (mrec -> manifestPool.submit(
            new java.util.concurrent.Callable[Seq[GenericRecord]] {
              def call(): Seq[GenericRecord] = readAvroBytes(
                readFileBytes(fs, new Path(resolvePath(mPath))))._3
            }))
        }
        while (it.hasNext && pending.size < 32) submit(it.next())
        while (pending.nonEmpty) {
          val (mrec, fut) = pending.dequeue()
          handle(mrec, fut.get())
          if (it.hasNext) submit(it.next())
        }
      } finally manifestPool.shutdown()
    foldManifests { case (mrec, entries) =>
      val content = asLong(fieldById(mrec, 517, "content")).getOrElse(0L)
      val mSeq = asLong(fieldById(mrec, 515, "sequence_number"))
        .getOrElse(0L)
      val specId = asLong(fieldById(mrec, 502, "partition_spec_id"))
        .getOrElse(0L).toInt
      val ids = identityOf.getOrElse(specId, Nil)
      entries.foreach { e =>
        val status = asLong(fieldById(e, 0, "status")).getOrElse(0L)
        if (status != 2L) {
          val df = fieldById(e, 2, "data_file").asInstanceOf[GenericRecord]
          val dfContent = asLong(fieldById(df, 134, "content"))
            .getOrElse(if (content == 1L) 1L else 0L)
          val fmt = asString(fieldById(df, 101, "file_format"))
            .getOrElse("PARQUET")
          val isPuffinDv = fmt.equalsIgnoreCase("puffin")
          require(fmt.equalsIgnoreCase("parquet") || isPuffinDv,
            s"iceberg table at $dir stores $fmt files — this " +
              "reader serves parquet (and v3 puffin deletion " +
              "vectors) only; refusing")
          // v2 inheritance: a null entry sequence number inherits the
          // manifest list's (added entries); explicit values win
          val seq = asLong(fieldById(e, 3, "sequence_number"))
            .getOrElse(mSeq)
          val stored = asString(fieldById(df, 100, "file_path")).get
          val p = resolvePath(stored)
          val part = fieldById(df, 102, "partition")
          val pv = part match {
            case r: GenericRecord => ids.flatMap { case (fid, src) =>
              idToName.get(src).map { nm =>
                src -> avroToJvm(fieldById(r, fid, nm))
              }
            }.toMap
            case _ => Map.empty[Int, Any]
          }
          def longMapOf(id: Int, name: String): Map[Int, Long] =
            fieldById(df, id, name) match {
              case l: java.util.List[_] => l.asScala.flatMap { kv =>
                val r0 = kv.asInstanceOf[GenericRecord]
                for (k <- asLong(r0.get("key")); v <- asLong(r0.get("value")))
                  yield k.toInt -> v
              }.toMap
              case _ => Map.empty
            }
          def bytesMapOf(id: Int, name: String): Map[Int, Array[Byte]] =
            fieldById(df, id, name) match {
              case l: java.util.List[_] => l.asScala.flatMap { kv =>
                val r0 = kv.asInstanceOf[GenericRecord]
                for (k <- asLong(r0.get("key")); v <- asBytes(r0.get("value")))
                  yield k.toInt -> v
              }.toMap
              case _ => Map.empty
            }
          dfContent match {
            case 0L => live(p) = Live(p, stored, pv, seq,
              asLong(fieldById(df, 103, "record_count")),
              bytesMapOf(125, "lower_bounds"),
              bytesMapOf(128, "upper_bounds"),
              longMapOf(110, "null_value_counts"), specId)
            case 1L if isPuffinDv =>
              require(fv >= 3L,
                s"iceberg table at $dir: puffin deletion vector in a " +
                  s"format-v$fv tree — DVs are a v3 feature; refusing")
              val refd = asString(fieldById(df, 143,
                "referenced_data_file")).getOrElse(sys.error(
                s"iceberg table at $dir: DV entry $stored carries no " +
                  "referenced_data_file — refusing"))
              val off = asLong(fieldById(df, 144, "content_offset"))
                .getOrElse(sys.error(
                  s"iceberg table at $dir: DV entry $stored carries " +
                    "no content_offset — refusing"))
              val sz = asLong(fieldById(df, 145,
                "content_size_in_bytes")).getOrElse(sys.error(
                s"iceberg table at $dir: DV entry $stored carries no " +
                  "content_size_in_bytes — refusing"))
              dvDels += DvDel(p, seq, refd, off, sz,
                asLong(fieldById(df, 103, "record_count")))
            case 1L => posDels += PosDel(p, seq)
            case 2L =>
              val eqIds = fieldById(df, 135, "equality_ids") match {
                case l: java.util.List[_] =>
                  l.asScala.map(_.asInstanceOf[Number].intValue).toSeq
                case _ => Seq.empty[Int]
              }
              require(eqIds.nonEmpty,
                s"iceberg table at $dir: equality delete file $stored " +
                  "declares no equality_ids — refusing")
              eqIds.foreach(id => require(idToName.contains(id),
                s"iceberg table at $dir: equality delete on field id " +
                  s"$id which the current schema does not carry — " +
                  "refusing (the delete could not be applied)"))
              // partition-SCOPED when the manifest's spec has identity
              // fields: the delete applies only inside its partition.
              // Per the spec only an UNPARTITIONED spec makes a delete
              // global — a spec with non-identity transforms (bucket/
              // truncate/days) scopes the delete to a partition this
              // reader cannot reconstruct, and applying it globally
              // would OVER-delete rows in other partitions: refuse.
              require(specFieldCount.getOrElse(specId, 0) == ids.size,
                s"iceberg table at $dir: equality delete file $stored " +
                  "rides a partition spec with non-identity " +
                  "transforms — this reader scopes equality deletes " +
                  "by identity partitions only; applying it unscoped " +
                  "would silently over-delete, refusing")
              eqDels += EqDel(p, seq, eqIds.sorted, pv, ids.nonEmpty,
                specId)
            case other => sys.error(
              s"iceberg table at $dir: data_file content=$other is " +
                "not defined by format v2 — refusing")
          }
        }
      }
      guardLive()
    }

    // FILE PRUNING (readIcebergWhere): keep only data files whose
    // manifest evidence cannot disprove the predicate — the shared
    // GraftDataSkipping evaluator over identity-partition values
    // (exact stats), decoded lower/upper bounds, and null counts.
    // Delete files are never pruned (a surviving data file may still
    // need their rows); a pruned data file's delete rows simply stop
    // matching anything.
    pruneWith.foreach { pred =>
      val typesByName = schema.fields.map(f => f.name -> f.dataType).toMap
      live.filterInPlace { case (_, lv) =>
        val minmax: Map[String, (String, String)] =
          (lv.lower.keySet & lv.upper.keySet).flatMap { id =>
            for {
              nm <- idToName.get(id)
              dt <- idToType.get(id)
              lo <- statStringOf(dt, lv.lower(id))
              hi <- statStringOf(dt, lv.upper(id))
            } yield nm -> (lo, hi)
          }.toMap
        // an identity partition value is an exact per-file stat:
        // min == max == value (the stat space matches the avro form —
        // epoch days/micros, decimal strings); a NULL value proves
        // the column all-NULL for the file
        val pstats = lv.pvById.collect {
          case (src, v) if v != null &&
              idToType.get(src).exists(_ != BooleanType) &&
              idToName.contains(src) =>
            idToName(src) -> (v.toString, v.toString)
        }
        val pnulls = lv.pvById.collect {
          case (src, null) if idToName.contains(src) && lv.rows.nonEmpty =>
            idToName(src) -> lv.rows.get
        }
        val nulls = lv.nullCnt.flatMap { case (id, n) =>
          idToName.get(id).map(_ -> n) } ++ pnulls
        org.apache.spark.sql.GraftDataSkipping.mayMatchColumn(
          pred, minmax ++ pstats, typesByName, nulls, lv.rows)
      }: Unit
    }

    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)

    // identity source columns of any live file's spec, in current
    // schema — these may be absent from data files (spec column
    // projection) and resolve from partition metadata
    val identitySources: Seq[Int] =
      identityOf.values.flatten.map(_._2).toSeq.distinct
        .filter(idToName.contains).sorted
    val readSchema = StructType(schema.fields.map(f =>
      StructField(physByName(f.name), f.dataType, nullable = true)))
    val base = spark.read.schema(readSchema)
      .parquet(live.keys.toSeq: _*)

    // V3 DELETION VECTORS: at most one per data file (spec rule),
    // applicable when the DV's data sequence is >= the file's. The
    // blob parses DRIVER-SIDE (metadata-plane, O(deleted rows)
    // compressed, CRC + cardinality verified HERE so corruption
    // refuses before any scan); bytes ride the partition-values
    // broadcast and filter by `_metadata.row_index` through the same
    // cached-parse DvContains kernel the Delta reader uses — v3
    // adopted Delta's framing (4-byte BE length of magic+vector, the
    // magic-led portable RoaringBitmapArray, 4-byte BE CRC-32), so
    // the parse is shared, not duplicated.
    val liveByStored: Map[String, Live] =
      live.values.map(lv => lv.stored -> lv).toMap
    dvDels.groupBy(_.referenced).find(_._2.size > 1).foreach {
      case (r, _) => sys.error(
        s"iceberg table at $dir: data file $r carries more than one " +
          "deletion vector — format v3 allows at most one; refusing")
    }
    val applicableDvs = dvDels.toSeq.filter(d =>
      liveByStored.get(d.referenced).exists(lv => d.seq >= lv.dataSeq))
    // blob fetches are independent remote reads — the bounded-pool
    // discipline manifests already use (thousands of DVs would
    // otherwise serialize one round trip each); parse + verify stays
    // on the calling thread per future result
    val dvBlobPool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, applicableDvs.size)))
    val dvByStored: Map[String, (Array[Byte], String)] =
      try applicableDvs.map { d =>
        d -> dvBlobPool.submit(
          new java.util.concurrent.Callable[Array[Byte]] {
            def call(): Array[Byte] = {
              val in = fs.open(new Path(d.path))
              try {
                in.seek(d.offset)
                val b = new Array[Byte](d.size.toInt)
                in.readFully(b); b
              } finally in.close()
            }
          })
      }.map { case (d, fut) =>
            val blob = fut.get()
            require(blob.length >= 8, s"iceberg table at $dir: DV " +
              s"blob for ${d.referenced} is ${blob.length} bytes — " +
              "too short for the v3 framing; refusing")
            val len = java.nio.ByteBuffer.wrap(blob, 0, 4).getInt
            require(len == d.size - 8,
              s"iceberg table at $dir: DV blob for ${d.referenced} " +
                s"declares $len magic+vector bytes but the manifest " +
                s"sized it ${d.size} — corrupt metadata, refusing")
            val data = java.util.Arrays.copyOfRange(blob, 4, 4 + len)
            val crc = java.nio.ByteBuffer.wrap(blob, 4 + len, 4).getInt
            val c = new java.util.zip.CRC32(); c.update(data)
            require(crc == c.getValue.toInt,
              s"iceberg table at $dir: DV checksum mismatch for " +
                s"${d.referenced} — a corrupt deletion vector would " +
                "silently resurrect deleted rows; refusing")
            val parsed = DeletionVectors.RoaringArray.deserialize(data)
            d.cardinality.foreach(n => require(parsed.cardinality == n,
              s"iceberg table at $dir: DV for ${d.referenced} holds " +
                s"${parsed.cardinality} rows but its manifest entry " +
                s"declares $n — corrupt metadata, refusing"))
            d.referenced -> (data, s"${d.path}@${d.offset}")
      }.toMap
      finally dvBlobPool.shutdown()

    if (identitySources.isEmpty && posDels.isEmpty && eqDels.isEmpty &&
        dvByStored.isEmpty)
      return base.select(schema.fields.map(f =>
        col(physByName(f.name)).as(f.name)).toIndexedSeq: _*)

    // broadcast (file -> typed partition values); key built exactly as
    // Spark's `_metadata.file_path` renders it (url-encoded URI form),
    // LEFT join + per-row raise so an encoding regression is loud
    def jvmToExternal(dt: DataType, v: Any): Any =
      avroPvToExternal(dt, v, dir)
    val hconf = spark.sessionState.newHadoopConf()
    def canonicalKey(p: String): String = fileKeyOf(p, hconf)
    val pvRows: Seq[Row] = live.values.toSeq.map { lv =>
      val dv = dvByStored.get(lv.stored)
      Row.fromSeq((canonicalKey(lv.path) +: identitySources.map(src =>
        jvmToExternal(idToType(src), lv.pvById.get(src).orNull))) ++
        Seq(lv.stored, java.lang.Long.valueOf(lv.dataSeq),
          Integer.valueOf(lv.specId),
          dv.map(_._1).orNull,
          // the DvContains cache key must carry the DV GENERATION
          // (puffin path + blob offset), not just the file — the
          // kernel's thread-local cache outlives a query
          dv.map(t => canonicalKey(lv.path) + "\u0000" + t._2).orNull,
          java.lang.Boolean.TRUE))
    }
    val pvSchema = StructType(
      (StructField("__graft_file", StringType, false) +:
      identitySources.map(src => StructField(
        s"__graft_pv_${idToName(src)}", idToType(src), true))) ++
      Seq(StructField("__graft_stored", StringType, true),
        StructField("__graft_seq", LongType, true),
        StructField("__graft_specid", IntegerType, true),
        StructField("__graft_dv", BinaryType, true),
        StructField("__graft_dvkey", StringType, true),
        StructField("__graft_matched", BooleanType, true)))
    val pvDf = spark.createDataFrame(pvRows.asJava, pvSchema)
    val identityNames = identitySources.map(idToName).toSet
    val keyed = base.withColumn("__graft_file", col("_metadata.file_path"))
    val withIdx =
      if (posDels.nonEmpty || dvByStored.nonEmpty)
        keyed.withColumn("__graft_ridx", col("_metadata.row_index"))
      else keyed
    val dvKeep =
      if (dvByStored.isEmpty) lit(true)
      else col("__graft_dv").isNull ||
        !org.apache.spark.sql.GraftColumnBridge.column(
          graft.plans.DvContains(
            org.apache.spark.sql.GraftColumnBridge.expression(
              col("__graft_dvkey")),
            org.apache.spark.sql.GraftColumnBridge.expression(
              col("__graft_dv")),
            org.apache.spark.sql.GraftColumnBridge.expression(
              col("__graft_ridx"))))
    val joined = withIdx
      .join(broadcast(pvDf), Seq("__graft_file"), "left")
      .where(when(col("__graft_matched").isNotNull, dvKeep)
        .otherwise(raise_error(concat(
          lit(s"readIceberg at $dir: data file "), col("__graft_file"),
          lit(" failed to match its manifest entry (path-encoding " +
            "regression)"))).cast("boolean")))
    // POSITION DELETES (merge-on-read): delete rows are DATA-scale —
    // they scan distributedly and anti-join the base on
    // (data file, row index), never through the driver. A delete
    // row's file_path must equal the data file's file_path as the
    // metadata records it (the spec's matching rule), so delete rows
    // key through a broadcast stored-path -> canonical-file map; the
    // sequence-number guard (a delete applies only to data files with
    // data_seq <= the delete's) rides the same join condition.
    val afterPos =
      if (posDels.isEmpty) joined
      else {
        val delMeta = posDels.toSeq.map(pd =>
          Row(canonicalKey(pd.path), java.lang.Long.valueOf(pd.seq)))
        val delMetaDf = spark.createDataFrame(delMeta.asJava,
          StructType(Seq(
            StructField("__graft_dfile", StringType, false),
            StructField("__del_seq", LongType, false))))
        val dels = spark.read
          .schema("file_path string, pos long")
          .parquet(posDels.map(_.path).toSeq: _*)
          .withColumn("__graft_dfile", col("_metadata.file_path"))
          .join(broadcast(delMetaDf), Seq("__graft_dfile"))
          .select(col("file_path").as("__del_stored"),
            col("pos").as("__del_pos"), col("__del_seq"))
        joined.join(dels,
          col("__graft_stored") === col("__del_stored") &&
            col("__graft_ridx") === col("__del_pos") &&
            col("__del_seq") >= col("__graft_seq"),
          "left_anti")
      }
    // EQUALITY DELETES (merge-on-read, Flink-CDC-style): each delete
    // row is a predicate on the file's equality_ids columns. Applies
    // to data files with data sequence STRICTLY below the delete's
    // (the spec's rule — same-commit data is exempt), null-safe
    // equality per the spec's "null matches null", and partition
    // SCOPING when the delete file's spec is partitioned (its rows
    // apply only inside its own partition tuple; unpartitioned-spec
    // deletes are global). Delete rows scan distributed; one anti-join
    // per distinct equality_ids signature.
    val served = eqDels.toSeq.groupBy(_.eqIds).foldLeft(afterPos) {
      case (acc, (eqIds, group)) =>
        val eqNames = eqIds.map(idToName)
        val delReadSchema = StructType(eqIds.map(id => StructField(
          physByName(idToName(id)), idToType(id), nullable = true)))
        val pvCols = identitySources.map(idToName)
        val delMeta = group.map { ed =>
          Row.fromSeq((canonicalKey(ed.path) +:
            java.lang.Long.valueOf(ed.seq) +:
            java.lang.Boolean.valueOf(ed.scoped) +:
            Integer.valueOf(ed.specId) +:
            identitySources.map(src =>
              jvmToExternal(idToType(src), ed.pvById.get(src).orNull))))
        }
        val delMetaDf = spark.createDataFrame(delMeta.asJava,
          StructType(
            Seq(StructField("__graft_dfile", StringType, false),
              StructField("__del_seq", LongType, false),
              StructField("__del_scoped", BooleanType, false),
              StructField("__del_specid", IntegerType, false)) ++
            identitySources.map(src => StructField(
              s"__del_pv_${idToName(src)}", idToType(src), true))))
        val dels = spark.read.schema(delReadSchema)
          .parquet(group.map(_.path): _*)
          .withColumn("__graft_dfile", col("_metadata.file_path"))
          .join(broadcast(delMetaDf), Seq("__graft_dfile"))
        val eqCond = eqNames.map { n =>
          // compare the PROJECTED data value (identity partition
          // columns may live only in metadata) against the delete row
          val dataVal =
            if (identityNames(n))
              coalesce(acc(physByName(n)), acc(s"__graft_pv_$n"))
            else acc(physByName(n))
          dataVal <=> dels(physByName(n))
        }.reduce(_ && _)
        // a scoped delete applies only to data files of ITS OWN spec
        // in the same partition tuple (Iceberg's DeleteFileIndex keys
        // deletes by (spec-id, partition)): without the spec-id
        // equality, a delete scoped under spec A could match a spec-B
        // data file whose shared identity values are all null on both
        // sides (null <=> null), over-deleting across specs
        val scopeCond = !dels("__del_scoped") ||
          (acc("__graft_specid") === dels("__del_specid") &&
            pvCols.map(n =>
                acc(s"__graft_pv_$n") <=> dels(s"__del_pv_$n"))
              .reduceOption(_ && _).getOrElse(lit(true)))
        acc.join(dels,
          eqCond && dels("__del_seq") > acc("__graft_seq") && scopeCond,
          "left_anti")
    }
    served.select(schema.fields.map { f =>
      // the spec's column projection: file value when the column is
      // materialized in the file, identity partition value otherwise
      if (identityNames(f.name))
        coalesce(col(physByName(f.name)),
          col(s"__graft_pv_${f.name}")).as(f.name)
      else col(physByName(f.name)).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** INCREMENTAL CHANGELOG SCAN over an Iceberg table — the
    * consumer's read of row-level changes between two snapshots
    * (exclusive `fromSnapshot`, inclusive `toSnapshot`), the Iceberg
    * twin of [[DeltaMirror.readChangeFeed]]. Resolution is exactly
    * what Iceberg's own incremental scans consume: each in-range
    * snapshot's manifest entries stamped with its snapshot id —
    * status-1 adds read as "insert" rows, status-2 tombstones read
    * their (still-on-disk) files as "delete" rows — so the cost is
    * bounded by the CHANGED files, never table size, and graft's own
    * mirror is incrementally consumable by construction (no extra
    * metadata: the mirror's adds and tombstones already carry their
    * snapshot ids). v3 DELETION VECTORS diff to ROW-level changes: a
    * DV added on a live file emits exactly the newly-deleted rows
    * (new bitmap minus the bitmap it replaced), a removed file's
    * delete rows EXCLUDE its retired bitmap (those rows were
    * reported when the DV appeared), and a DV retired without
    * replacement (restore) re-inserts its rows. Emits the table
    * columns plus `_change_type`, `_change_ordinal` (1-based
    * position in the range) and `_commit_snapshot_id`.
    *
    * Position/equality delete FILES in an in-range snapshot refuse
    * loudly (their membership is data, not metadata — a file-granular
    * changelog cannot diff them). The parent chain must reach
    * `fromSnapshot` (expired history refuses — a silently partial
    * feed never serves). */
  def readIcebergChanges(spark: SparkSession, dir: String,
                         fromSnapshot: Long,
                         toSnapshot: Long): DataFrame = {
    val md = metaDir(dir)
    val fs = LakeWriter.fsOf(spark, md)
    val n = currentMetadataVersion(fs, md).getOrElse(
      sys.error(s"no iceberg metadata at $dir"))
    val j = JsonMethods.parse(new String(
      readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
    val fv = lng(j \ "format-version").getOrElse(1L)
    require(fv <= 3L,
      s"iceberg table at $dir is format v$fv — refusing")
    // the batch reader's v3 whitelist applies here identically: a
    // changelog serving nulls where a default applies (or dropping
    // lineage columns) would be silently wrong, not incomplete
    if (fv >= 3L) {
      require((j \ "row-lineage") != JBool(true) &&
          (j \ "next-row-id") == JNothing,
        s"iceberg table at $dir enables v3 row lineage — this reader " +
          "does not maintain row ids; refusing")
    }
    val location = str(j \ "location").getOrElse(dir)
    def resolvePath(p: String): String = {
      val hp = new Path(p)
      if (hp.isAbsolute || hp.toUri.getScheme != null) p
      else s"${location.stripSuffix("/")}/$p"
    }
    val schemasJ: List[JValue] = (j \ "schemas") match {
      case JArray(ss) => ss
      case _ => (j \ "schema") match {
        case o: JObject => List(o)
        case _ => sys.error(s"iceberg table at $dir carries no schema")
      }
    }
    val currentSchemaId = lng(j \ "current-schema-id").getOrElse(
      schemasJ.headOption.flatMap(s => lng(s \ "schema-id"))
        .getOrElse(0L))
    val curSchemaJ = schemasJ.find(s =>
      lng(s \ "schema-id").contains(currentSchemaId))
      .orElse(schemasJ.headOption)
      .getOrElse(sys.error(s"iceberg table at $dir: no current schema"))
    curSchemaJ.filterField {
      case ("initial-default", v) => v != JNull && v != JNothing
      case _ => false
    } match {
      case Nil =>
      case _ => sys.error(
        s"iceberg table at $dir: a schema field declares a v3 " +
          "initial-default — this reader would serve nulls where the " +
          "default applies; refusing")
    }
    val curFields = schemaFieldsOf(curSchemaJ)
    val schema = StructType(curFields.map { case (_, nm, t) =>
      StructField(nm, sparkTypeOf(t, dir), nullable = true)
    })
    val idToName = curFields.map(f => (f._1, f._2)).toMap
    val idToType: Map[Int, DataType] = curFields.map { case (id, _, t) =>
      id -> sparkTypeOf(t, dir) }.toMap
    val physByName =
      resolvePhysByName(dir, j, schemasJ, curSchemaJ, curFields)
    val specsJ: List[JValue] = (j \ "partition-specs") match {
      case JArray(ss) => ss
      case _ => Nil
    }
    val identityOf: Map[Int, Seq[(Int, Int)]] = specsJ.flatMap { p =>
      lng(p \ "spec-id").map { sid =>
        sid.toInt -> ((p \ "fields") match {
          case JArray(fs0) => fs0.flatMap { f =>
            if (!str(f \ "transform").contains("identity")) None
            else for {
              fid <- lng(f \ "field-id")
              src <- lng(f \ "source-id")
            } yield (fid.toInt, src.toInt)
          }
          case _ => Nil
        })
      }
    }.toMap
    // the parent chain to..from, oldest first
    val snapsJ: List[JValue] = (j \ "snapshots") match {
      case JArray(ss) => ss
      case _ => Nil
    }
    def snap(sid: Long): JValue = snapsJ.find(s =>
      lng(s \ "snapshot-id").contains(sid)).getOrElse(sys.error(
      s"iceberg table at $dir has no snapshot $sid (expired?) — the " +
        "changelog below the retention window is gone; refusing a " +
        "silently partial feed"))
    val chain = scala.collection.mutable.ListBuffer[Long]()
    var cur = toSnapshot
    while (cur != fromSnapshot) {
      val sj = snap(cur)
      chain.prepend(cur)
      cur = lng(sj \ "parent-snapshot-id").getOrElse(sys.error(
        s"iceberg table at $dir: snapshot $cur has no parent — the " +
          s"chain never reaches $fromSnapshot; refusing"))
    }
    snap(fromSnapshot): Unit // the base must exist too
    // per in-range snapshot: its own manifest list, entries stamped
    // with the snapshot id decide membership. A unit may carry DV
    // bitmaps narrowing WHICH rows of its file it emits: `inDv` =
    // only row indexes IN this bitmap, `exDv` = minus this bitmap
    // (both raw portable-roaring bytes riding the broadcast).
    final case class Changed(path: String, pvById: Map[Int, Any],
        snapId: Long, ordinal: Int, insert: Boolean,
        inDv: Option[(Array[Byte], String)] = None,
        exDv: Option[(Array[Byte], String)] = None)
    val changed = scala.collection.mutable.ListBuffer[Changed]()
    // REPLACE snapshots (compaction / z-order / rewrite_data_files:
    // files changed, rows did not) are excluded, exactly as Iceberg's
    // reference changelog scan excludes them — reporting a rewrite as
    // the whole table deleted+reinserted would be spurious AND
    // unbounded (the doc's cost-bounded-by-changed-files claim).
    // Ordinals number the EMITTING snapshots consecutively.
    val emitting = chain.toSeq.filterNot { sid =>
      (snap(sid) \ "summary" \ "operation") == JString("replace")
    }
    // DV blob fetch (driver-side, metadata-plane): framing + CRC
    // verified exactly as the batch reader does; cached per blob
    // across the range (a carried bitmap diffed by two snapshots
    // fetches once)
    val identitySources: Seq[Int] =
      identityOf.values.flatten.map(_._2).toSeq.distinct
        .filter(idToName.contains).sorted
    val identityNames = identitySources.map(idToName).toSet
    val blobCache = scala.collection.mutable.Map[String, Array[Byte]]()
    // carried delete manifests decode once per range (liveness +
    // kind validation below), keyed by resolved path
    val carriedDeleteCache =
      scala.collection.mutable.Map[String, Seq[String]]()
    def fetchBlob(puffin: String, off: Long, size: Long)
        : (Array[Byte], String) = {
      val key = s"$puffin@$off"
      (blobCache.getOrElseUpdate(key, {
        val in = fs.open(new Path(puffin))
        val blob = try {
          in.seek(off)
          val b = new Array[Byte](size.toInt)
          in.readFully(b); b
        } finally in.close()
        require(blob.length >= 8, s"iceberg table at $dir: DV blob " +
          s"at $key is ${blob.length} bytes — too short; refusing")
        val len = java.nio.ByteBuffer.wrap(blob, 0, 4).getInt
        require(len == size - 8, s"iceberg table at $dir: DV blob at " +
          s"$key declares $len bytes but the manifest sized it " +
          s"$size — corrupt metadata, refusing")
        val data = java.util.Arrays.copyOfRange(blob, 4, 4 + len)
        val crc = java.nio.ByteBuffer.wrap(blob, 4 + len, 4).getInt
        val c = new java.util.zip.CRC32(); c.update(data)
        require(crc == c.getValue.toInt, s"iceberg table at $dir: DV " +
          s"checksum mismatch at $key — refusing")
        data
      }), key)
    }
    // identity partition values of a DV-referenced file: the COW path
    // reads them from its manifest entry's partition struct, but a DV
    // unit's data manifest is CARRIED (never opened) — resolve from
    // the hive path segments, refusing a silent null projection
    def pvOfPath(p: String): Map[Int, Any] =
      identitySources.map { src =>
        val nm = idToName(src)
        val raw = LakeWriter.hiveSegmentOf(nm, p).getOrElse(sys.error(
          s"iceberg table at $dir: changelog DV unit for $p cannot " +
            s"resolve identity partition column $nm from the path — " +
            "serving nulls would be silently wrong; refusing"))
        src -> partitionJvm(idToType(src), hiveUnescape(raw))
      }.toMap
    emitting.zipWithIndex.foreach { case (sid, i) =>
      val mlPath = str(snap(sid) \ "manifest-list").getOrElse(sys.error(
        s"iceberg table at $dir: snapshot $sid carries no manifest-list"))
      val (_, _, mlRows) = readAvroBytes(
        readFileBytes(fs, new Path(resolvePath(mlPath))))
      // entries stamped with sid live ONLY in manifests the snapshot
      // itself added (appends AND rewrites both produce a new
      // manifest file whose added_snapshot_id is the committing
      // snapshot) — carried manifests are never opened, so metadata
      // IO is bounded by the CHANGED manifests, not table size
      final case class DvLoc(puffin: String, off: Long, size: Long)
      val dataAdds = scala.collection.mutable.LinkedHashMap[
        String, Map[Int, Any]]()
      val dataRemoves = scala.collection.mutable.LinkedHashMap[
        String, Map[Int, Any]]()
      val dvAdded = scala.collection.mutable.LinkedHashMap[String, DvLoc]()
      val dvRetired = scala.collection.mutable.LinkedHashMap[String, DvLoc]()
      // files still covered by a CARRIED live DV this snapshot — used
      // below to refuse a non-conforming writer that removed a data
      // file without retiring its deletion vector (the removed file's
      // delete rows would silently over-report)
      val carriedLiveDv = scala.collection.mutable.Set[String]()
      mlRows.foreach { mrec =>
        val mAddedSid = asLong(fieldById(mrec, 503, "added_snapshot_id"))
          .getOrElse(-1L)
        val mContent = asLong(fieldById(mrec, 517, "content"))
          .getOrElse(0L)
        if (mAddedSid != sid && mContent == 1L) {
          // carried delete manifest: never emits, but its KIND and
          // liveness gate safety (cached — each manifest file decodes
          // once per range however many snapshots carry it)
          val mPath = resolvePath(
            asString(fieldById(mrec, 500, "manifest_path")).get)
          carriedDeleteCache.getOrElseUpdate(mPath, {
            readAvroBytes(readFileBytes(fs, new Path(mPath)))._3
              .flatMap { e =>
                val df = fieldById(e, 2, "data_file")
                  .asInstanceOf[GenericRecord]
                val fmt = asString(fieldById(df, 101, "file_format"))
                  .getOrElse("")
                require(fmt.equalsIgnoreCase("puffin"),
                  s"iceberg table at $dir: the changelog range " +
                    s"carries a $fmt delete file — only v3 deletion " +
                    "vectors are changelog-representable; refusing")
                if (asLong(fieldById(e, 0, "status"))
                    .getOrElse(0L) == 2L) None
                else asString(fieldById(df, 143, "referenced_data_file"))
                  .map(resolvePath)
              }
          }).foreach(carriedLiveDv += _)
        }
        if (mAddedSid == sid) {
          val mPath = asString(fieldById(mrec, 500, "manifest_path")).get
          val specId = asLong(fieldById(mrec, 502, "partition_spec_id"))
            .getOrElse(0L).toInt
          val ids = identityOf.getOrElse(specId, Nil)
          val (_, _, entries) = readAvroBytes(
            readFileBytes(fs, new Path(resolvePath(mPath))))
          entries.foreach { e =>
            val status = asLong(fieldById(e, 0, "status")).getOrElse(0L)
            // v2 inheritance: a null entry snapshot_id inherits the
            // manifest's added_snapshot_id (same rule the batch
            // reader honors for sequence numbers)
            val esid = asLong(fieldById(e, 1, "snapshot_id"))
              .getOrElse(mAddedSid)
            if (esid == sid && status != 0L) {
              val df = fieldById(e, 2, "data_file")
                .asInstanceOf[GenericRecord]
              val stored = asString(fieldById(df, 100, "file_path")).get
              if (mContent == 1L) {
                // delete manifest: v3 puffin DVs diff to ROW-level
                // changes; position/equality delete FILES stay
                // unrepresentable (their membership is data, not
                // metadata)
                val fmt = asString(fieldById(df, 101, "file_format"))
                  .getOrElse("")
                require(fmt.equalsIgnoreCase("puffin"),
                  s"iceberg table at $dir: snapshot $sid adds a $fmt " +
                    "delete file — only v3 deletion vectors are " +
                    "changelog-representable; refusing")
                val refd = resolvePath(asString(fieldById(df, 143,
                  "referenced_data_file")).getOrElse(sys.error(
                  s"iceberg table at $dir: DV entry $stored carries " +
                    "no referenced_data_file — refusing")))
                val loc = DvLoc(resolvePath(stored),
                  asLong(fieldById(df, 144, "content_offset"))
                    .getOrElse(sys.error(s"iceberg table at $dir: DV " +
                      s"entry $stored has no content_offset")),
                  asLong(fieldById(df, 145, "content_size_in_bytes"))
                    .getOrElse(sys.error(s"iceberg table at $dir: DV " +
                      s"entry $stored has no content_size_in_bytes")))
                if (status == 1L) {
                  require(!dvAdded.contains(refd),
                    s"iceberg table at $dir: snapshot $sid adds two " +
                      s"deletion vectors for $refd — format v3 allows " +
                      "at most one; refusing")
                  dvAdded(refd) = loc
                } else dvRetired(refd) = loc
              } else {
                val pv = fieldById(df, 102, "partition") match {
                  case r: GenericRecord => ids.flatMap { case (fid, src) =>
                    idToName.get(src).map { nm =>
                      src -> avroToJvm(fieldById(r, fid, nm))
                    }
                  }.toMap
                  case _ => Map.empty[Int, Any]
                }
                if (status == 1L) dataAdds(resolvePath(stored)) = pv
                else dataRemoves(resolvePath(stored)) = pv
              }
            } else if (mContent == 1L && status != 2L) {
              // EXISTING (status 0) or older-stamped live entry inside
              // a delete manifest this snapshot itself added (a
              // manifest REWRITE): not one of this snapshot's changes,
              // but still a live carried DV — it must gate the
              // dataRemoves conformance check below exactly like a
              // carried manifest's entries, or a non-conforming
              // remove-without-retire slips through and over-reports
              val df = fieldById(e, 2, "data_file")
                .asInstanceOf[GenericRecord]
              val fmt = asString(fieldById(df, 101, "file_format"))
                .getOrElse("")
              require(fmt.equalsIgnoreCase("puffin"),
                s"iceberg table at $dir: snapshot $sid rewrites a " +
                  s"delete manifest carrying a $fmt delete file — " +
                  "only v3 deletion vectors are " +
                  "changelog-representable; refusing")
              asString(fieldById(df, 143, "referenced_data_file"))
                .map(resolvePath).foreach(carriedLiveDv += _)
            }
          }
        }
      }
      // a removed file whose DV is STILL live in a carried manifest
      // means the writer broke the spec's remove-DVs-with-their-files
      // rule — its delete rows would over-report; refuse
      dataRemoves.keySet.foreach { p =>
        require(!carriedLiveDv.contains(p) || dvRetired.contains(p),
          s"iceberg table at $dir: snapshot $sid removes data file " +
            s"$p while a carried deletion vector still references " +
            "it — non-conforming writer; the changelog cannot tell " +
            "which rows were already reported deleted; refusing")
      }
      // emission per file, DV bitmaps narrowing rows:
      //  - added file: insert its rows, minus a same-snapshot DV
      //  - removed file: delete its rows, minus the retired DV (those
      //    rows were reported deleted when the DV appeared)
      //  - DV change on a live file: delete rows in (new \ old) AND
      //    insert rows in (old \ new) — deletes normally only grow
      //    the bitmap so the insert side is empty, but a RESTORE
      //    re-pins a smaller one and its rows come back
      //  - DV retired without replacement on a live file: the whole
      //    old bitmap's rows come back — insert them
      dataAdds.foreach { case (p, pv) =>
        changed += Changed(p, pv, sid, i + 1, insert = true,
          exDv = dvAdded.get(p).map(l => fetchBlob(l.puffin, l.off, l.size)))
      }
      dataRemoves.foreach { case (p, pv) =>
        changed += Changed(p, pv, sid, i + 1, insert = false,
          exDv = dvRetired.get(p).map(l => fetchBlob(l.puffin, l.off, l.size)))
      }
      (dvAdded.keySet -- dataAdds.keySet -- dataRemoves.keySet)
        .toSeq.sorted.foreach { p =>
          val l = dvAdded(p)
          val nw = fetchBlob(l.puffin, l.off, l.size)
          val old = dvRetired.get(p).map(o =>
            fetchBlob(o.puffin, o.off, o.size))
          changed += Changed(p, pvOfPath(p), sid, i + 1, insert = false,
            inDv = Some(nw), exDv = old)
          old.foreach { o =>
            changed += Changed(p, pvOfPath(p), sid, i + 1, insert = true,
              inDv = Some(o), exDv = Some(nw))
          }
        }
      (dvRetired.keySet -- dvAdded.keySet -- dataRemoves.keySet)
        .toSeq.sorted.foreach { p =>
          val l = dvRetired(p)
          changed += Changed(p, pvOfPath(p), sid, i + 1, insert = true,
            inDv = Some(fetchBlob(l.puffin, l.off, l.size)))
        }
    }
    val outFields = schema.fields.toSeq ++ Seq(
      StructField("_change_type", StringType, true),
      StructField("_change_ordinal", IntegerType, true),
      StructField("_commit_snapshot_id", LongType, true))
    if (changed.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(outFields))
    val hconf = spark.sessionState.newHadoopConf()
    // one scan over the distinct changed files; the broadcast meta
    // join fans each file into every (snapshot, side, DV-window) it
    // changed in — a unit's bitmaps ride as binary columns and filter
    // by `_metadata.row_index` through the cached-parse DvContains
    // kernel (cache keys carry the blob GENERATION)
    val anyDv = changed.exists(c => c.inDv.nonEmpty || c.exDv.nonEmpty)
    val metaRows: Seq[Row] = changed.toSeq.map { c =>
      Row.fromSeq((fileKeyOf(c.path, hconf) +:
        identitySources.map(src =>
          avroPvToExternal(idToType(src), c.pvById.get(src).orNull,
            dir))) ++
        Seq(if (c.insert) "insert" else "delete",
          Integer.valueOf(c.ordinal),
          java.lang.Long.valueOf(c.snapId),
          c.inDv.map(_._1).orNull,
          c.inDv.map(_._2).orNull,
          c.exDv.map(_._1).orNull,
          c.exDv.map(_._2).orNull,
          java.lang.Boolean.TRUE))
    }
    val metaSchema = StructType(
      (StructField("__graft_file", StringType, false) +:
        identitySources.map(src => StructField(
          s"__graft_pv_${idToName(src)}", idToType(src), true))) ++ Seq(
        StructField("__graft_ct", StringType, false),
        StructField("__graft_ord", IntegerType, false),
        StructField("__graft_sid", LongType, false),
        StructField("__graft_indv", BinaryType, true),
        StructField("__graft_inkey", StringType, true),
        StructField("__graft_exdv", BinaryType, true),
        StructField("__graft_exkey", StringType, true),
        StructField("__graft_matched", BooleanType, true)))
    val metaDf = spark.createDataFrame(metaRows.asJava, metaSchema)
    val readSchema = StructType(schema.fields.map(f =>
      StructField(physByName(f.name), f.dataType, nullable = true)))
    def dvTest(dvCol: String, keyCol: String) =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.DvContains(
          org.apache.spark.sql.GraftColumnBridge.expression(col(keyCol)),
          org.apache.spark.sql.GraftColumnBridge.expression(col(dvCol)),
          org.apache.spark.sql.GraftColumnBridge.expression(
            col("__graft_ridx"))))
    val dvKeep =
      if (!anyDv) lit(true)
      else (col("__graft_indv").isNull ||
          dvTest("__graft_indv", "__graft_inkey")) &&
        (col("__graft_exdv").isNull ||
          !dvTest("__graft_exdv", "__graft_exkey"))
    val base0 = spark.read.schema(readSchema)
      .parquet(changed.map(_.path).distinct.toSeq: _*)
      .withColumn("__graft_file", col("_metadata.file_path"))
    (if (anyDv)
      base0.withColumn("__graft_ridx", col("_metadata.row_index"))
     else base0)
      .join(broadcast(metaDf), Seq("__graft_file"), "left")
      .where(when(col("__graft_matched").isNotNull, dvKeep)
        .otherwise(raise_error(concat(
          lit(s"readIcebergChanges at $dir: file "), col("__graft_file"),
          lit(" failed to match its manifest entry (path-encoding " +
            "regression)"))).cast("boolean")))
      .select(outFields.map { f =>
        if (f.name == "_change_type") col("__graft_ct").as(f.name)
        else if (f.name == "_change_ordinal")
          col("__graft_ord").as(f.name)
        else if (f.name == "_commit_snapshot_id")
          col("__graft_sid").as(f.name)
        else if (identityNames(f.name))
          coalesce(col(physByName(f.name)),
            col(s"__graft_pv_${f.name}")).as(f.name)
        else col(physByName(f.name)).as(f.name)
      }.toIndexedSeq: _*)
  }

  // ------------------------------------------------------------------
  // streaming changelog consumption
  // ------------------------------------------------------------------

  /** STREAMING consumption of the incremental changelog — the Iceberg
    * twin of [[DeltaMirror.streamChangeFeed]]: the table's metadata
    * dir IS the stream. Every committed snapshot publishes one
    * durably-named `vN.metadata.json` (the mirror lands it atomically
    * via tmp + rename; in-flight tmps are dot-hidden, so the
    * Structured-Streaming file source only ever lists whole files —
    * HadoopCatalog writers follow the same discipline). Each
    * micro-batch drains pending metadata versions OLDEST-FIRST; for
    * each, `apply(mkFeed, sequenceNumber, snapshotId)` is offered
    * EVERY snapshot on the version's tip-ancestor chain, ascending by
    * sequence number — not just the tip. That closes the hole-masking
    * window: if a version is offered out of order (the file source
    * may split a drain across micro-batches, and listing order is not
    * version order) or its metadata file was expired before first
    * observation, the next offered version still CARRIES the missed
    * snapshot and absorbs it in sequence — a high-water stamp can
    * then never strand a live snapshot behind it. Each offer's feed
    * is [[readIcebergChanges]] from its parent (a parentless first
    * snapshot feeds the full state as inserts), LAZILY so an
    * already-absorbed snapshot skips without resolving anything (the
    * common case: every re-offer from a later version's chain, a
    * maintenance re-listing, a replay whose parent has since
    * expired). The stream checkpoint is only the cursor; replay
    * safety is the CONSUMER's contract — skip on a stamp of the
    * SEQUENCE NUMBER (strictly monotone where snapshot ids are
    * hashes), the [[streamIcebergChangesInto]] discipline.
    *
    * Runs with `Trigger.AvailableNow` and blocks until every metadata
    * version on disk is offered; re-invoke on a live checkpoint to
    * drain later commits. Cost per drain is bounded by the CHANGED
    * files of pending snapshots plus one metadata parse per version —
    * never table size. A fresh consumer over a table whose early
    * history has EXPIRED refuses loudly inside `mkFeed` (a silently
    * partial feed never serves); seed such a consumer from a full
    * read first. */
  def streamIcebergChanges(spark: SparkSession, dir: String,
                           checkpoint: String)
                          (apply: (() => DataFrame, Long, Long) => Unit)
      : Unit = {
    val md = metaDir(dir)
    // heavy work runs on the OUTER session (the stream's cloned
    // session disables AQE); only the name collect below touches the
    // clone — the streamChangeFeed discipline
    val metas = spark.readStream
      .option("pathGlobFilter", "*.metadata.json")
      // FileStreamSource silently ignores files older than
      // maxFileAge (default 7d) relative to the newest seen — a
      // pending version older than that would be skipped FOREVER
      // (the stamp then masks the hole); age-based eviction is wrong
      // for a commit log, so effectively disable it
      .option("maxFileAge", "36500d")
      .text(md.toString)
      .select(col("_metadata.file_path").as("p"))
    val vRe = """v(\d+)\.metadata\.json$""".r
    val q = metas.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = LakeWriter.fsOf(spark, md)
        val versions = batch.distinct()
          .collect().map(_.getString(0))
          .flatMap(p => vRe.findFirstMatchIn(p).map(_.group(1).toInt))
          .sorted
        versions.foreach { n =>
          val j = JsonMethods.parse(new String(
            readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
          lng(j \ "current-snapshot-id").filter(_ >= 0).foreach { tip =>
            val snapsJ = (j \ "snapshots") match {
              case JArray(ss) => ss
              case _ => Nil
            }
            val byId = snapsJ.flatMap(s =>
              lng(s \ "snapshot-id").map(_ -> s)).toMap
            require(byId.contains(tip),
              s"streamIcebergChanges at $dir: v$n.metadata.json names " +
                s"current snapshot $tip it does not carry — torn tree")
            // the tip's ANCESTOR CHAIN, oldest first (a retained
            // branch/tag snapshot off the chain is not part of main's
            // changelog); every chain member is offered so an
            // out-of-order or never-observed earlier version cannot
            // leave a live snapshot stranded behind the stamp
            val chain = scala.collection.mutable.ListBuffer[JValue]()
            var cur: Option[Long] = Some(tip)
            while (cur.nonEmpty) {
              require(chain.size <= byId.size,
                s"streamIcebergChanges at $dir: v$n.metadata.json " +
                  "has a cyclic parent chain — corrupt tree")
              val s = cur.flatMap(byId.get)
              s.foreach(chain.prepend(_))
              cur = s.flatMap(x => lng(x \ "parent-snapshot-id"))
            }
            chain.foreach { sj =>
              val sid = lng(sj \ "snapshot-id").get
              val seqNo = lng(sj \ "sequence-number").getOrElse(
                sys.error(s"streamIcebergChanges at $dir: snapshot " +
                  s"$sid carries no sequence-number — v1 trees have " +
                  "no monotone stamp; refusing"))
              def mkFeed(): DataFrame =
                lng(sj \ "parent-snapshot-id") match {
                  case Some(par) =>
                    readIcebergChanges(spark, dir, par, sid)
                  case None =>
                    // parentless first snapshot: full state IS the feed
                    readIceberg(spark, dir, Some(sid))
                      .withColumn("_change_type", lit("insert"))
                      .withColumn("_change_ordinal", lit(1))
                      .withColumn("_commit_snapshot_id", lit(sid))
                }
              apply(mkFeed _, seqNo, sid)
            }
          }
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private val IceChangesStreamTxnApp = "graft.iceberg.changes.stream"

  /** [[streamIcebergChanges]] with the exactly-once consumer built
    * in: append each snapshot's changelog rows (table columns +
    * `_change_type`, `_commit_snapshot_id`, plus `_commit_sequence` —
    * the replayable order stamp) to graft snapshot table `out`,
    * stamping the sequence number as an application transaction
    * ATOMICALLY with the append. A crash or a fresh stream checkpoint
    * replays metadata versions and every already-absorbed sequence
    * SKIPS on its stamp — without resolving its feed, so a
    * maintenance re-list or an expired-parent replay costs a JSON
    * parse, not a refusal. `_change_ordinal` (range-local, not
    * replayable across drains) is dropped. Returns the highest
    * absorbed sequence number (-1 = nothing yet). */
  def streamIcebergChangesInto(spark: SparkSession, dir: String,
                               out: String, checkpoint: String): Long = {
    // the stamp read once per drain, then tracked locally: this
    // consumer is the only writer to `out` inside the drain, and the
    // chain re-offers (most of them already absorbed) would otherwise
    // re-read the out manifest per offer
    var absorbedCache = Long.MinValue
    streamIcebergChanges(spark, dir, checkpoint) { (mkFeed, seqNo, _) =>
      if (absorbedCache == Long.MinValue)
        absorbedCache = LakeWriter.lastTxnVersion(spark, out,
          IceChangesStreamTxnApp).getOrElse(-1L)
      val absorbed = absorbedCache
      if (seqNo > absorbed) {
        val rows = mkFeed().drop("_change_ordinal")
          .withColumn("_commit_sequence", lit(seqNo))
        // a replace-only (compaction) snapshot feeds zero rows; the
        // stamp still advances so a replay never re-resolves it
        LakeWriter.commitSnapshot(rows, out,
          mode = if (LakeWriter.snapshotVersions(spark, out).isEmpty)
            "overwrite" else "append",
          txn = Some(IceChangesStreamTxnApp -> seqNo)): Unit
        absorbedCache = seqNo
      }
    }
    LakeWriter.lastTxnVersion(spark, out, IceChangesStreamTxnApp)
      .getOrElse(-1L)
  }

  /** Read an Iceberg table at a named REF (branch or tag — the
    * metadata's `refs` map): `readIcebergRef(spark, dir, "audit-tag")`
    * resolves the ref's snapshot-id and serves it through
    * [[readIceberg]]. Unknown refs list the ones that exist. */
  def readIcebergRef(spark: SparkSession, dir: String,
                     ref: String): DataFrame = {
    val md = metaDir(dir)
    val fs = LakeWriter.fsOf(spark, md)
    val n = currentMetadataVersion(fs, md).getOrElse(
      sys.error(s"no iceberg metadata at $dir"))
    val j = JsonMethods.parse(new String(
      readFileBytes(fs, metadataJsonPath(md, n)), "UTF-8"))
    val refs: Map[String, Long] = (j \ "refs") match {
      case JObject(fields) => fields.flatMap { case (name, r) =>
        lng(r \ "snapshot-id").map(name -> _) }.toMap
      case _ => Map.empty
    }
    val sid = refs.getOrElse(ref, sys.error(
      s"iceberg table at $dir has no ref '$ref' (refs: " +
        s"${refs.keys.toSeq.sorted.mkString(", ")})"))
    readIceberg(spark, dir, Some(sid))
  }

  /** TIMESTAMP AS OF over the snapshot-log: the newest snapshot at or
    * before `tsMillis`. */
  def readIcebergTimestamp(spark: SparkSession, dir: String,
                           tsMillis: Long): DataFrame = {
    val snaps = icebergSnapshots(spark, dir)
    val at = snaps.filter(_._2 <= tsMillis).lastOption.getOrElse(
      sys.error(s"iceberg table at $dir has no snapshot at or before " +
        s"$tsMillis (oldest is ${snaps.headOption.map(_._2)})"))
    readIceberg(spark, dir, Some(at._1))
  }
}
