package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, concat, lit, raise_error, when}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta-Lake-format LIVE MIRROR of a snapshot table — the
  * zero-export-step interop bridge (the reference's lake is Iceberg
  * precisely so external engines read it natively:
  * /root/reference/airflow/dags/spark_code/write_iceberg_sample.py —
  * this is that property rebuilt on Delta's open `_delta_log`
  * protocol, which is plain JSON + parquet checkpoints and needs no
  * jars to write).
  *
  * [[mirror]] writes a spec-conformant `_delta_log/` INSIDE the
  * table directory, one Delta commit per graft snapshot version,
  * each `add`/`remove` referencing the table's OWN parquet files by
  * relative path (files OUTSIDE the table root — convert/clone
  * adoptions — ride as absolute-URI adds, which the protocol
  * allows) — zero bytes of data are copied, and after the call
  * the graft table root IS a Delta table: Spark-with-Delta, Trino,
  * DuckDB's delta reader, delta-rs/pandas all read it natively, at
  * whatever version history graft has committed. Incremental by
  * construction: a re-invocation resolves the log's current file
  * set and mirrors only versions committed since (cost is O(delta
  * manifests) once a checkpoint bounds the replay), so a scheduler
  * can call it after every load. Idempotent: no new graft versions
  * ⇒ no new log entries, byte-identical log.
  *
  * Fidelity contract (spec'd in DeltaMirrorSpec): resolving the
  * mirrored log at Delta version i yields exactly
  * `readSnapshot(table, graft version i+1)` — adds/removes are the
  * manifest file-set diff, `metaData` re-emits on schema or
  * partition-spec change, `partitionValues` derive from the same
  * hive paths graft prunes by, and each add carries Delta's stats
  * JSON (`numRecords`/`minValues`/`maxValues`/`nullCount` from the
  * manifest's own footer stats) so foreign engines file-skip on the
  * mirror exactly like graft does on the manifest.
  *
  * CHECKPOINTS ([[checkpoint]], or `mirror(checkpointEvery = n)`):
  * a classic Delta checkpoint (one parquet file of flattened
  * actions + `_last_checkpoint`) bounds every subsequent log
  * resolution — reader cost drops from O(all versions) to
  * O(versions since checkpoint). This is what keeps a
  * one-commit-per-micro-batch STREAMING sink's mirror readable: a
  * month-old stream table replays a handful of JSON tails, not tens
  * of thousands. [[mirror]]'s own resume uses the same checkpoint.
  *
  * Renamed/dropped columns mirror NATIVELY: graft's column mapping is
  * the same logical->physical indirection as Delta's
  * `columnMapping.mode=name`, so the mirror emits physicalName/id
  * field metadata (+ the protocol upgrade to reader 2 / writer 5 in
  * the commit that first needs it) and conforming readers resolve
  * old and new files alike. Column ids are allocated MONOTONE above
  * `delta.columnMapping.maxColumnId` (never reused after a drop, as
  * the spec requires).
  *
  * Not mirrored (refused loudly, not silently wrong):
  *  - renamed PARTITION columns (graft itself refuses those, so only
  *    a hand-built manifest could hit this);
  *  - mixed partition layouts mid-evolution (a pre-spec file has no
  *    path-derived partition values — run `migratePartitionSpec`
  *    first).
  *
  * Partition values hive escapes as %XX on disk ('=', '#', ':' …)
  * mirror correctly: relative `add.path`s are RFC-2396
  * percent-ENCODED on write (literal '%' -> %25), so a conforming
  * reader's URL-decode lands back on the on-disk name, while the
  * `partitionValues` map carries the decoded logical value.
  *
  * Scale shape at 100 TB: mirroring is pure METADATA — per new
  * version, one manifest parse, one file-status sweep over the
  * version's NEW files on a bounded pool (sizes/mtimes; row counts +
  * min/max ride the manifest's existing footer stats), one small
  * JSON write; a checkpoint is one metadata-sized parquet write.
  * The data plane is untouched.
  */
object DeltaMirror {

  private def logDir(table: String) =
    new org.apache.hadoop.fs.Path(table, "_delta_log")

  private def commitName(v: Long): String = f"$v%020d.json"
  private def checkpointName(v: Long): String = f"$v%020d.checkpoint.parquet"

  /** Is `p` an absolute add.path (rooted path or scheme://-URI), as
    * opposed to a table-root-relative one? Shared by the write
    * direction ([[mirror]], raw graft file names) and the read
    * direction ([[readDelta]], after percent-decoding) so the two
    * sides cannot drift on the path-form contract. */
  private def isAbsolutePath(p: String): Boolean =
    p.startsWith("/") || p.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:/.*")

  /** Delta versions present as JSON commits in the log, ascending
    * (a checkpoint may additionally cover versions below these). */
  def deltaVersions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = logDir(table)
    val fs = LakeWriter.fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.dropRight(5).toLong).sorted
  }

  private def readCommit(fs: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path): Seq[JValue] = {
    val in = fs.open(p)
    val body = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    in.close()
    body.split('\n').toSeq.filter(_.trim.nonEmpty)
      .map(JsonMethods.parse(_))
  }

  private def str(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case _ => None
  }

  /** Byte-accurate %XX percent-decoding — what a Delta `add.path`
    * needs (RFC-2396 URI escaping). NOT URLDecoder: form decoding
    * turns a literal '+' into a space, corrupting any path or
    * partition value containing '+' (never percent-encoded by URI
    * rules). Multi-byte sequences (%C3%A9) decode through UTF-8. */
  private def percentDecode(s: String): String = {
    if (!s.contains('%')) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else if (Character.isHighSurrogate(c) && i + 1 < s.length) {
        out.write(s.substring(i, i + 2).getBytes("UTF-8")); i += 2
      } else { out.write(c.toString.getBytes("UTF-8")); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Raw (still-escaped) per-column partition path values of `file`,
    * or None when the file predates the spec. */
  private def partValuesOf(partitionCols: Seq[String],
                           file: String): Option[Seq[String]] = {
    val vals = partitionCols.flatMap { c =>
      ("(?:^|/)" + java.util.regex.Pattern.quote(c) + "=([^/]*)/").r
        .findFirstMatchIn(file).map(_.group(1))
    }
    if (vals.length == partitionCols.length) Some(vals) else None
  }

  // ------------------------------------------------------------------
  // log replay (shared by mirror resume, readDelta, checkpoint)
  // ------------------------------------------------------------------

  /** One live file's action payload as the log recorded it. */
  private final case class AddInfo(
      partitionValues: Seq[(String, Option[String])],
      size: Long, modificationTime: Long, stats: Option[String],
      dv: Option[DeletionVectors.DvDescriptor] = None)

  /** Mutable fold state of a log replay. Live files key on the spec's
    * logical-file identity `(path, deletionVector uniqueId)` — a
    * DELETE rewrites a file's DV by removing the old pairing and
    * adding the new in ONE commit, and the two actions must not
    * cancel whichever order the commit lists them in. Tables without
    * DVs degenerate to path-only keys (uid = ""), byte-identical to
    * the pre-DV behavior. */
  private final class LogState {
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Seq.empty
    /** the governing metaData ACTION value, verbatim */
    var metaData: Option[JValue] = None
    var protocol: (Int, Int) = (1, 2)
    /** table features a reader must implement (protocol v3+). */
    var readerFeatures: Set[String] = Set.empty
    /** table features a writer must implement (protocol v7) — state a
      * checkpoint must carry forward, never drop. */
    var writerFeatures: Set[String] = Set.empty
    var lastGraft: Option[Long] = None
    /** newest commitInfo.inCommitTimestamp seen — the monotonicity
      * cursor of the ICT writer feature. */
    var lastIct: Option[Long] = None
    val live = scala.collection.mutable
      .LinkedHashMap[(String, String), AddInfo]()
    /** latest SetTransaction version per appId (protocol: checkpoints
      * must preserve these — a writer's idempotence cursor). */
    val txns = scala.collection.mutable.LinkedHashMap[String, Long]()
    /** latest domainMetadata per domain: configuration + removed flag
      * (protocol: checkpoints must preserve non-removed domains). */
    val domains = scala.collection.mutable
      .LinkedHashMap[String, (String, Boolean)]()
    /** action kinds seen that this replay does not model — state a
      * checkpoint would silently drop, so checkpointing refuses. */
    val unknownActions = scala.collection.mutable.LinkedHashSet[String]()
  }

  /** Action kinds replay models (cdc is per-commit change-data
    * plumbing — it never affects the reconciled state and the spec
    * excludes it from checkpoints, so it is known-and-skipped). */
  private val knownActionKinds = Set("metaData", "protocol", "add",
    "remove", "txn", "commitInfo", "cdc", "domainMetadata",
    "checkpointMetadata", "sidecar")

  private def parseDvDescriptor(j: JValue)
      : Option[DeletionVectors.DvDescriptor] = j match {
    case JNothing | JNull => None
    case d =>
      def int(v: JValue): Option[Int] = v match {
        case JInt(n) => Some(n.toInt)
        case _ => None
      }
      def lng(v: JValue): Option[Long] = v match {
        case JInt(n) => Some(n.toLong)
        case _ => None
      }
      Some(DeletionVectors.DvDescriptor(
        str(d \ "storageType").getOrElse(
          sys.error("deletionVector descriptor without storageType")),
        str(d \ "pathOrInlineDv").getOrElse(
          sys.error("deletionVector descriptor without pathOrInlineDv")),
        int(d \ "offset"),
        int(d \ "sizeInBytes").getOrElse(
          sys.error("deletionVector descriptor without sizeInBytes")),
        lng(d \ "cardinality").getOrElse(
          sys.error("deletionVector descriptor without cardinality"))))
  }

  private def applyAction(st: LogState, j: JValue): Unit = {
    j match {
      case JObject(fields) => fields.foreach { case (k, _) =>
        if (!knownActionKinds(k)) st.unknownActions += k }
      case _ =>
    }
    j \ "metaData" match {
      case JNothing =>
      case md =>
        st.metaData = Some(md)
        st.schemaJson = str(md \ "schemaString")
        st.partCols = md \ "partitionColumns" match {
          case JArray(xs) => xs.flatMap(str)
          case _ => Seq.empty
        }
    }
    (j \ "protocol" \ "minReaderVersion", j \ "protocol" \ "minWriterVersion") match {
      case (JInt(r), JInt(w)) => st.protocol = (r.toInt, w.toInt)
      case _ =>
    }
    j \ "protocol" \ "readerFeatures" match {
      case JArray(xs) => st.readerFeatures ++= xs.flatMap(str)
      case _ =>
    }
    j \ "protocol" \ "writerFeatures" match {
      case JArray(xs) => st.writerFeatures ++= xs.flatMap(str)
      case _ =>
    }
    str(j \ "add" \ "path").foreach { p =>
      val a = j \ "add"
      val pv = a \ "partitionValues" match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> (v match { case JString(s) => Some(s); case _ => None }) }
        case _ => List.empty[(String, Option[String])]
      }
      def lng(v: JValue): Long = v match {
        case JInt(n) => n.toLong
        case JDouble(d) => d.toLong
        case JDecimal(d) => d.toLong
        case _ => 0L
      }
      val dv = parseDvDescriptor(a \ "deletionVector")
      st.live((p, dv.map(_.uniqueId).getOrElse(""))) =
        AddInfo(pv, lng(a \ "size"), lng(a \ "modificationTime"),
          str(a \ "stats"), dv)
    }
    str(j \ "remove" \ "path").foreach { p =>
      val uid = parseDvDescriptor(j \ "remove" \ "deletionVector")
        .map(_.uniqueId).getOrElse("")
      st.live -= ((p, uid))
    }
    (str(j \ "txn" \ "appId"), j \ "txn" \ "version") match {
      case (Some(a), JInt(v)) => st.txns(a) = v.toLong
      case _ =>
    }
    (str(j \ "domainMetadata" \ "domain"),
        j \ "domainMetadata" \ "removed") match {
      case (Some(d), removed) =>
        val cfg = str(j \ "domainMetadata" \ "configuration").getOrElse("")
        st.domains(d) = (cfg, removed == JBool(true))
      case _ =>
    }
    j \ "commitInfo" \ "graftVersion" match {
      case JInt(g) => st.lastGraft = Some(g.toLong)
      case _ =>
    }
    j \ "commitInfo" \ "inCommitTimestamp" match {
      case JInt(t) => st.lastIct = Some(t.toLong)
      case _ =>
    }
  }

  /** COMPLETE checkpoints present on disk, by listing: version ->
    * part count. A multi-part set counts only when every named part
    * exists (a partial set must never be chosen — it would silently
    * drop files). Listing-based discovery (the protocol's own
    * fallback when `_last_checkpoint` is stale) is what lets replay
    * resolve a version BELOW the newest checkpoint through an older
    * one — the invariant [[cleanupLog]] trades on. */
  /** The three checkpoint layouts the protocol defines. */
  private sealed trait CpForm
  /** classic: one file, or N disjoint parts (all must exist). */
  private final case class ClassicCp(parts: Int) extends CpForm
  /** v2: one UUID-named top file (parquet or json) holding the
    * non-file actions + `sidecar` pointers into `_sidecars/`. */
  private final case class V2Cp(fileName: String) extends CpForm

  private def checkpointsOnDisk(fs: org.apache.hadoop.fs.FileSystem,
      log: org.apache.hadoop.fs.Path): Map[Long, CpForm] = {
    if (!fs.exists(log)) return Map.empty
    val names = fs.listStatus(log).map(_.getPath.getName).toSeq
    val multiRe = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val multis: Map[Long, CpForm] = names.collect {
      case multiRe(v, i, t) => (v.toLong, t.toInt, i.toInt) }
      .groupBy(x => (x._1, x._2))
      .collect { case ((v, t), parts)
        if parts.map(_._3).toSet == (1 to t).toSet =>
        v -> (ClassicCp(t): CpForm) }
      .toMap
    // v2 naming: %020d.checkpoint.<uniqueStr>.(parquet|json); the
    // unique string is anything that is not a classic part index pair
    val v2Re = """(\d{20})\.checkpoint\.([A-Za-z0-9._-]+)\.(parquet|json)""".r
    val v2s: Map[Long, CpForm] = names.collect {
      case n @ v2Re(v, _, _) if !n.matches(multiRe.regex) =>
        v.toLong -> (V2Cp(n): CpForm) }.toMap
    val singles: Map[Long, CpForm] = names.collect {
      case n if n.matches("""\d{20}\.checkpoint\.parquet""") =>
        n.take(20).toLong -> (ClassicCp(1): CpForm) }.toMap
    // preference on a version tie: classic single > multi-part > v2
    v2s ++ multis ++ singles
  }

  /** `_last_checkpoint` pointer: the checkpointed delta version, its
    * part count (1 = classic single file), plus two graft-private
    * cursor fields foreign readers ignore — the graft version the
    * mirror had absorbed and the newest inCommitTimestamp (the ICT
    * monotonicity floor must survive covered-JSON cleanup, since
    * commitInfo actions are not checkpointed). */
  private final case class LcInfo(version: Long, graft: Option[Long],
                                  parts: Int, ict: Option[Long])

  private def lastCheckpointInfo(fs: org.apache.hadoop.fs.FileSystem,
      log: org.apache.hadoop.fs.Path): Option[LcInfo] = {
    val p = new org.apache.hadoop.fs.Path(log, "_last_checkpoint")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    in.close()
    val j = JsonMethods.parse(body)
    val v = j \ "version" match {
      case JInt(n) => n.toLong
      case _ => sys.error(s"$p: no version field")
    }
    val parts = j \ "parts" match {
      case JNothing | JNull => 1
      case JInt(n) if n.toInt >= 1 => n.toInt
      case other => sys.error(s"$p: unparseable parts field $other")
    }
    def lng(field: String): Option[Long] = j \ field match {
      case JInt(n) => Some(n.toLong)
      case _ => None
    }
    Some(LcInfo(v, lng("graftVersion"), parts, lng("ict")))
  }

  /** Fold a checkpoint into `st` — CLASSIC (single parquet or N
    * disjoint multi-parts; one row per action, columns
    * txn/add/remove/metaData/protocol/domainMetadata) or V2 (a
    * UUID-named parquet/json top file holding the non-file actions
    * plus `sidecar` pointers; add/remove rows live in the named
    * `_sidecars/` parquet files, or inline in the top file). Rows are
    * a reconciled snapshot, so order is immaterial. EVERY named
    * part/sidecar must exist and parse: a partial fold would silently
    * drop files. */
  private def loadCheckpoint(spark: SparkSession, dir: String, cv: Long,
                             form: CpForm, st: LogState): Unit = {
    val log = logDir(dir)
    val fs = LakeWriter.fsOf(spark, log)
    val topFiles: Seq[org.apache.hadoop.fs.Path] = form match {
      case ClassicCp(parts) if parts <= 1 =>
        Seq(new org.apache.hadoop.fs.Path(log, checkpointName(cv)))
      case ClassicCp(parts) =>
        (1 to parts).map(i => new org.apache.hadoop.fs.Path(log,
          f"$cv%020d.checkpoint.$i%010d.$parts%010d.parquet"))
      case V2Cp(name) => Seq(new org.apache.hadoop.fs.Path(log, name))
    }
    topFiles.foreach(cp => require(fs.exists(cp),
      s"_last_checkpoint at $dir points at version $cv " +
        s"but ${cp.getName} is missing"))
    // fold one parquet action file (top or sidecar); returns the
    // sidecar file names this file pointed at
    def foldParquet(paths: Seq[org.apache.hadoop.fs.Path],
                    isSidecar: Boolean): Seq[String] =
      foldRows(spark.read.parquet(paths.map(_.toString): _*),
        paths.head, isSidecar)
    def foldRows(df: DataFrame, cp: org.apache.hadoop.fs.Path,
                 isSidecar: Boolean): Seq[String] = {
    val sidecars = scala.collection.mutable.ListBuffer[String]()
    val cols = df.columns.toSet
    def field(r: Row, n: String): Option[Int] = {
      val names = r.schema.fieldNames
      val i = names.indexOf(n)
      if (i >= 0 && !r.isNullAt(i)) Some(i) else None
    }
    def rowMapJ(r: Row, n: String): List[(String, JValue)] =
      field(r, n).map { i =>
        r.getMap[String, String](i).toList.map { case (k, v) =>
          k -> (if (v == null) JNull else JString(v): JValue) }
      }.getOrElse(List.empty)
    // an action COLUMN this parse does not model is reconciled state a
    // re-checkpoint would drop — track it like an unknown JSON action
    // kind (commitInfo sometimes rides in foreign checkpoints; it is
    // per-commit provenance, not state, so it stays known-and-skipped)
    val knownCpCols = Set("txn", "add", "remove", "metaData", "protocol",
      "domainMetadata", "commitInfo", "checkpointMetadata", "sidecar")
    st.unknownActions ++= cols.filterNot(knownCpCols)
    df.collect().foreach { row =>
      def struct(n: String): Option[Row] =
        if (!cols(n)) None else field(row, n).map(row.getStruct)
      struct("protocol").foreach { p =>
        st.protocol = (
          field(p, "minReaderVersion").map(p.getInt).getOrElse(1),
          field(p, "minWriterVersion").map(p.getInt).getOrElse(2))
        field(p, "readerFeatures").foreach(i =>
          st.readerFeatures ++= p.getSeq[String](i))
        field(p, "writerFeatures").foreach(i =>
          st.writerFeatures ++= p.getSeq[String](i))
      }
      struct("metaData").foreach { m =>
        def gs(r: Row, n: String): JValue =
          field(r, n).map(i => JString(r.getString(i)): JValue)
            .getOrElse(JNull)
        val fmt = field(m, "format").map(m.getStruct)
        val pcs = field(m, "partitionColumns")
          .map(i => m.getSeq[String](i)).getOrElse(Seq.empty)
        val md: JValue = JObject(List(
          "id" -> gs(m, "id"), "name" -> gs(m, "name"),
          "description" -> gs(m, "description"),
          "format" -> JObject(List(
            "provider" -> fmt.map(gs(_, "provider"))
              .getOrElse(JString("parquet")),
            "options" -> JObject(fmt.map(rowMapJ(_, "options"))
              .getOrElse(Nil)))),
          "schemaString" -> gs(m, "schemaString"),
          "partitionColumns" -> JArray(
            pcs.map(JString(_): JValue).toList),
          "configuration" -> JObject(rowMapJ(m, "configuration")),
          "createdTime" -> field(m, "createdTime")
            .map(i => JInt(BigInt(m.getLong(i))): JValue)
            .getOrElse(JNull)))
        applyAction(st, JObject(List("metaData" -> md)))
      }
      def dvOf(parent: Row): Option[DeletionVectors.DvDescriptor] =
        field(parent, "deletionVector").map(parent.getStruct).map { d =>
          DeletionVectors.DvDescriptor(
            field(d, "storageType").map(d.getString).getOrElse(
              sys.error(s"$cp: deletionVector without storageType")),
            field(d, "pathOrInlineDv").map(d.getString).getOrElse(
              sys.error(s"$cp: deletionVector without pathOrInlineDv")),
            field(d, "offset").map(d.getInt),
            field(d, "sizeInBytes").map(d.getInt).getOrElse(
              sys.error(s"$cp: deletionVector without sizeInBytes")),
            field(d, "cardinality").map(d.getLong).getOrElse(
              sys.error(s"$cp: deletionVector without cardinality")))
        }
      struct("add").foreach { a =>
        val path = field(a, "path").map(a.getString).getOrElse(
          sys.error(s"$cp: add action without a path"))
        val pv: Seq[(String, Option[String])] =
          field(a, "partitionValues").map { i =>
            a.getMap[String, String](i).toSeq.map { case (k, v) =>
              k -> Option(v) }
          }.getOrElse(Seq.empty)
        val dv = dvOf(a)
        st.live((path, dv.map(_.uniqueId).getOrElse(""))) = AddInfo(pv,
          field(a, "size").map(a.getLong).getOrElse(0L),
          field(a, "modificationTime").map(a.getLong).getOrElse(0L),
          field(a, "stats").map(a.getString),
          dv)
      }
      struct("remove").foreach { rm =>
        field(rm, "path").foreach { i =>
          val uid = dvOf(rm).map(_.uniqueId).getOrElse("")
          st.live -= ((rm.getString(i), uid))
        }
      }
      struct("txn").foreach { t =>
        for (ai <- field(t, "appId"); vi <- field(t, "version"))
          st.txns(t.getString(ai)) = t.getLong(vi)
      }
      struct("domainMetadata").foreach { dm =>
        for (di <- field(dm, "domain"))
          st.domains(dm.getString(di)) = (
            field(dm, "configuration").map(dm.getString).getOrElse(""),
            field(dm, "removed").exists(dm.getBoolean))
      }
      struct("checkpointMetadata").foreach { cm =>
        field(cm, "version").foreach { i =>
          val declared = cm.getLong(i)
          require(declared == cv,
            s"$cp: checkpointMetadata declares version $declared, " +
              s"expected $cv — wrong or corrupt checkpoint")
        }
      }
      struct("sidecar").foreach { sc =>
        require(!isSidecar,
          s"$cp: sidecar action inside a sidecar file — malformed")
        field(sc, "path").foreach(i => sidecars += sc.getString(i))
      }
    }
    sidecars.toSeq
    }
    form match {
      case _: ClassicCp =>
        val extra = foldParquet(topFiles, isSidecar = false)
        require(extra.isEmpty,
          s"classic checkpoint at $dir carries sidecar pointers — " +
            "malformed (sidecars belong to v2 checkpoints)")
      case V2Cp(name) =>
        val top = topFiles.head
        val sidecarNames: Seq[String] =
          if (name.endsWith(".json")) {
            // json-format v2 top: non-file actions fold through the
            // same applyAction as commits; sidecar pointers + the
            // checkpointMetadata version check are handled here
            val lines = readCommit(fs, top)
            lines.foreach { j =>
              j \ "checkpointMetadata" \ "version" match {
                case JInt(n) => require(n.toLong == cv,
                  s"$top: checkpointMetadata declares version $n, " +
                    s"expected $cv — wrong or corrupt checkpoint")
                case _ =>
              }
              applyAction(st, j)
            }
            lines.flatMap(j => str(j \ "sidecar" \ "path"))
          } else foldParquet(Seq(top), isSidecar = false)
        val scDir = new org.apache.hadoop.fs.Path(log, "_sidecars")
        sidecarNames.foreach { n =>
          val p = new org.apache.hadoop.fs.Path(scDir, n)
          require(fs.exists(p),
            s"v2 checkpoint at $dir names sidecar $n but it is " +
              "missing — a partial fold would silently drop files")
          foldParquet(Seq(p), isSidecar = true): Unit
        }
    }
  }

  /** Resolve the log at `upTo` (default: latest): checkpoint base (if
    * one covers the range) + contiguous JSON tail. Refuses loudly when
    * the commits on disk cannot PROVABLY reconstruct the version —
    * e.g. early JSON commits cleaned up with no checkpoint, or time
    * travel below the oldest surviving commit — instead of silently
    * resolving a partial file set. */
  private def replay(spark: SparkSession, dir: String,
                     upTo: Option[Long]): (LogState, Long) = {
    val log = logDir(dir)
    val fs = LakeWriter.fsOf(spark, log)
    require(fs.exists(log), s"no _delta_log at $dir")
    val jsons = deltaVersions(spark, dir)
    val lc = lastCheckpointInfo(fs, log)
    val onDisk = checkpointsOnDisk(fs, log)
    val latest = (jsons ++ lc.map(_.version) ++ onDisk.keys).maxOption
      .getOrElse(sys.error(s"empty _delta_log at $dir"))
    val v = upTo.getOrElse(latest)
    require(v >= 0 && v <= latest,
      s"no delta version $v at $dir (latest is $latest)")
    val st = new LogState
    // newest COMPLETE checkpoint at or below the target: time travel
    // below the latest checkpoint resolves through an older one when
    // it survives on disk. A `_last_checkpoint` pointer whose named
    // files are incomplete must stay LOUD (the pointer is the
    // published contract), not silently fall back past it.
    val startAfter: Long = onDisk.keys.filter(_ <= v).maxOption match {
      case Some(cv) =>
        loadCheckpoint(spark, dir, cv, onDisk(cv), st)
        lc.filter(_.version == cv).foreach { i =>
          st.lastGraft = i.graft
          st.lastIct = i.ict
        }
        cv
      case None =>
        lc.filter(_.version <= v).foreach(i => // loud: parts missing
          loadCheckpoint(spark, dir, i.version, ClassicCp(i.parts), st))
        -1L
    }
    val tail = jsons.filter(x => x > startAfter && x <= v)
    require(tail == (startAfter + 1 to v),
      s"_delta_log at $dir cannot resolve version $v: JSON commits " +
        s"[${tail.mkString(",")}] do not contiguously cover " +
        s"(${startAfter}, $v]" + (if (startAfter < 0)
        " and no checkpoint covers the gap (early commits cleaned " +
          "up?) — refusing a silently partial resolution" else ""))
    // DRIVER-HEAP GUARD: the reconciled live set is driver-resident
    // (the standard Delta-reader posture — the log IS driver-resolved
    // metadata), so a million-file foreign table is an O(files) driver
    // allocation. Fail LOUDLY past the ceiling instead of dissolving
    // into a silent driver OOM mid-replay; the limit is a conf knob
    // sized to the repo's pinned 8 g policy heap (an AddInfo row costs
    // roughly 0.5-1 KB with its stats JSON).
    val ceiling = spark.conf.get("spark.graft.delta.maxLiveFiles",
      "2000000").toLong
    def guard(): Unit =
      if (st.live.size > ceiling) sys.error(
        s"_delta_log at $dir resolves to over $ceiling live files — " +
          "refusing to hold the action state on the driver (raise " +
          "spark.graft.delta.maxLiveFiles if the heap allows, or " +
          "compact/checkpoint the table to shrink its live file count)")
    guard()
    tail.foreach { dv =>
      readCommit(fs, new org.apache.hadoop.fs.Path(log, commitName(dv)))
        .foreach(applyAction(st, _))
      guard()
    }
    (st, v)
  }

  // ------------------------------------------------------------------
  // stats: manifest footer stats -> Delta's add.stats JSON
  // ------------------------------------------------------------------

  /** One manifest FileStats as Delta's stats JSON (numRecords /
    * minValues / maxValues / nullCount), typed per the physical
    * schema: numerics as JSON numbers, dates/timestamps as ISO
    * strings, strings verbatim. Columns whose type is outside the
    * stat set (or whose stats the footer withheld) are simply absent
    * — Delta readers treat missing stats as "cannot skip". */
  private def deltaStatsJson(
      fst: LakeWriter.FileStats,
      types: Map[String, org.apache.spark.sql.types.DataType])
      : Option[String] = {
    import org.apache.spark.sql.types._
    def valJson(dt: DataType, s: String): Option[JValue] = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(JInt(BigInt(s)))
      case FloatType | DoubleType => Some(JDecimal(BigDecimal(s)))
      case StringType =>
        // the manifest's string min/max were reduced under UTF-16
        // ordering; Delta readers data-skip on these with UTF-8
        // binary comparisons, and the orders diverge above the BMP —
        // emit only ASCII bounds (identical under both orders); a
        // dropped stat costs a scan, never a wrong skip
        if (s.forall(_ < 0x80)) Some(JString(s)) else None
      case DateType => Some(JString(
        java.time.LocalDate.ofEpochDay(s.toLong).toString))
      case TimestampType =>
        // manifest canonical form is epoch MICROS
        Some(JString(java.time.Instant.EPOCH
          .plus(s.toLong, java.time.temporal.ChronoUnit.MICROS).toString))
      case TimestampNTZType =>
        val us = s.toLong
        Some(JString(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC).toString))
      case _ => None
    }
    val byCol = fst.cols.toSeq.sortBy(_._1)
    val mins = byCol.flatMap { case (c, cs) =>
      for { t <- types.get(c); lo <- cs.lo; j <- valJson(t, lo) }
        yield c -> j }
    val maxs = byCol.flatMap { case (c, cs) =>
      for { t <- types.get(c); hi <- cs.hi; j <- valJson(t, hi) }
        yield c -> j }
    val nulls = byCol.flatMap { case (c, cs) =>
      if (!types.contains(c)) None
      else cs.nulls.map(n => c -> (JInt(BigInt(n)): JValue)) }
    val parts =
      fst.rows.map(r => "numRecords" -> (JInt(BigInt(r)): JValue)).toList ++
        (if (mins.nonEmpty) List("minValues" -> (JObject(mins.toList): JValue)) else Nil) ++
        (if (maxs.nonEmpty) List("maxValues" -> (JObject(maxs.toList): JValue)) else Nil) ++
        (if (nulls.nonEmpty) List("nullCount" -> (JObject(nulls.toList): JValue)) else Nil)
    if (parts.isEmpty) None
    else Some(JsonMethods.compact(JsonMethods.render(JObject(parts))))
  }

  // ------------------------------------------------------------------
  // mirror (write direction)
  // ------------------------------------------------------------------

  /** Mirror every graft snapshot version of `table` not yet in its
    * `_delta_log` as one Delta commit each. Returns the number of
    * Delta commits written (0 = already up to date).
    *
    * @param fromVersion on a FRESH mirror, start at this graft
    *        version instead of the first: Delta v0 then adds that
    *        version's full live file set and later versions mirror
    *        as diffs. The escape hatch for tables whose early
    *        history is not Delta-expressible (a partition-spec
    *        change over carried files) — mirror from the
    *        post-`migratePartitionSpec` version. Ignored on resume
    *        (the log's own cursor governs).
    * @param checkpointEvery when > 0, write a classic checkpoint +
    *        `_last_checkpoint` whenever the log tip has advanced at
    *        least this many versions past the previous checkpoint —
    *        the knob a per-micro-batch streaming sink sets so its
    *        mirror stays O(checkpointEvery) to open forever.
    * @param changeDataFeed when true, the mirror is a CHANGE DATA
    *        FEED table (`delta.enableChangeDataFeed=true` +
    *        writerFeatures `changeDataFeed`): each commit that both
    *        adds and removes files gets its NET row changes
    *        ([[LakeWriter.changesBetween]], collapse = true) written
    *        as `_change_data/` parquet (data columns + `_change_type`
    *        "insert" | "delete") referenced by spec `cdc` actions, so
    *        a FOREIGN incremental consumer (Delta CDF reader) pays
    *        for the delta, never the table. Insert-only /
    *        delete-only commits carry no cdc files — the CDF read
    *        protocol synthesizes their changes from the add/remove
    *        actions exactly. A rewrite whose net change is EMPTY (a
    *        compaction) marks its add/remove actions
    *        `dataChange=false`, which a CDF reader skips — the one
    *        honest encoding of "files changed, rows did not". The
    *        cdc write is the only data-plane IO the mirror ever does,
    *        and it is bounded by DELTA size, never table size. */
  def mirror(spark: SparkSession, table: String,
             fromVersion: Option[Long] = None,
             checkpointEvery: Int = 0,
             changeDataFeed: Boolean = false): Long = {
    val versions = LakeWriter.snapshotVersions(spark, table)
    require(versions.nonEmpty, s"no snapshot history at $table")
    val dir = logDir(table)
    val fs = LakeWriter.fsOf(spark, dir)
    val root = fs.makeQualified(
      new org.apache.hadoop.fs.Path(table)).toString

    // RFC-2396 percent-encoding of a table-root-relative add.path: a
    // conforming Delta reader URL-DECODES add.path, so the on-disk
    // name — which may itself contain hive-escaped %XX partition dirs
    // ('=' escapes to %3D on disk), spaces, '+' … — must be ENCODED on
    // write for the reader's decode to land back on the real file.
    // java.net.URI's multi-arg constructor quotes every illegal byte
    // including a literal '%' (-> %25), which is exactly the
    // round-trip inverse of readDelta's percentDecode.
    def encodeRelPath(rel: String): String =
      new java.net.URI(null, null, "/" + rel, null)
        .getRawPath.stripPrefix("/")
    def addPathOf(f: String): String = {
      if (f.startsWith(root + "/")) encodeRelPath(f.stripPrefix(root + "/"))
      else {
        // convert-/clone-referenced foreign file: the protocol allows
        // an absolute add.path (URL-encoded URI) — emitted in the
        // canonical scheme://-form so foreign readers resolve it
        require(!f.contains("%"),
          s"delta mirror of $table: foreign file $f carries a literal " +
            "'%' — a Delta reader URL-decodes add.path and would " +
            "resolve a different name; compact the table to localize")
        val u = new org.apache.hadoop.fs.Path(f).toUri
        if (u.getScheme == null) f else u.toString
      }
    }
    // add.path -> on-disk path: relative adds are percent-ENCODED in
    // the log (encodeRelPath), so decode before touching the fs
    def absOf(p: String): org.apache.hadoop.fs.Path =
      if (isAbsolutePath(p)) new org.apache.hadoop.fs.Path(
        java.net.URI.create(p.replace(" ", "%20")))
      else new org.apache.hadoop.fs.Path(s"$root/${percentDecode(p)}")

    // current live set + cursor + governing metaData per the LOG —
    // checkpoint-bounded replay (self-contained resume: correct even
    // if previously-mirrored graft versions were since vacuumed)
    val hasLog = fs.exists(dir) &&
      (deltaVersions(spark, table).nonEmpty ||
        lastCheckpointInfo(fs, dir).nonEmpty)
    val live = scala.collection.mutable.LinkedHashSet[String]()
    var prevSchemaJson: Option[String] = None
    var prevPartCols: Option[Seq[String]] = None
    var lastMirrored: Option[Long] = None
    var prevConfig: Map[String, String] = Map.empty
    var prevTxns: Map[String, Long] = Map.empty
    var nextDv: Long = 0L
    var prevIct: Long = 0L
    val liveDv = scala.collection.mutable.LinkedHashMap[
      String, DeletionVectors.DvDescriptor]()
    var dvWasOn = false
    if (hasLog) {
      val (st, latest) = replay(spark, table, None)
      live ++= st.live.keys.map(_._1)
      // MERGE-ON-READ state: the resumed live set's (path -> DV
      // descriptor) pairings — removes of a DV-changed file must
      // retire the EXACT old pairing (the spec's (path, dvUniqueId)
      // reconciliation)
      st.live.foreach { case ((pp, _), info) =>
        info.dv.foreach(liveDv(pp) = _) }
      dvWasOn = liveDv.nonEmpty ||
        st.readerFeatures.contains("deletionVectors")
      prevIct = st.lastIct.getOrElse(0L)
      prevTxns = st.txns.toMap
      prevSchemaJson = st.schemaJson
      prevPartCols = if (st.metaData.isEmpty) None else Some(st.partCols)
      lastMirrored = st.lastGraft
      prevConfig = st.metaData.map(md =>
        md \ "configuration" match {
          case JObject(fields) => fields.collect {
            case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty[String, String]
        }).getOrElse(Map.empty)
      nextDv = latest + 1
    }
    require(!hasLog || lastMirrored.nonEmpty,
      s"delta mirror of $table: existing _delta_log carries no " +
        "graftVersion cursor — not a graft mirror; refusing to extend")
    // COLUMN MAPPING state (Delta columnMapping.mode=name — the same
    // logical->physical indirection as graft's colmap, so renames and
    // drops mirror natively): stable per-PHYSICAL-name column ids,
    // seeded from the last mirrored metaData so resume keeps them.
    // Allocation is MONOTONE above delta.columnMapping.maxColumnId
    // (the spec forbids reusing the id of a column dropped before a
    // resume — live-field max alone would free it)
    val colIds = scala.collection.mutable.LinkedHashMap[String, Int]()
    prevSchemaJson.foreach { sj =>
      org.apache.spark.sql.types.DataType.fromJson(sj)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fields.foreach { f =>
          if (f.metadata.contains("delta.columnMapping.physicalName"))
            colIds(f.metadata.getString("delta.columnMapping.physicalName")) =
              f.metadata.getLong("delta.columnMapping.id").toInt
        }
    }
    var maxColId = (colIds.values ++ prevConfig
      .get("delta.columnMapping.maxColumnId").map(_.toInt)).maxOption
      .getOrElse(0)
    var cmOn = colIds.nonEmpty
    // IN-COMMIT TIMESTAMPS (the Delta writer feature): every FRESH
    // mirror enables it from commit 0 — commitInfo carries a strictly
    // monotone inCommitTimestamp derived from graft's own commit
    // wall-clock, so foreign readers resolve TIMESTAMP AS OF from the
    // log itself instead of guessing from file mtimes (the same
    // wall-clock graft's q_snapshot_time_travel resolves against).
    // Enabled-at-0 needs no provenance properties per the spec; a
    // RESUMED pre-ICT mirror stays legacy (mid-history enablement
    // would need provenance bookkeeping for no gain on graft logs).
    val ictOn = !hasLog ||
      prevConfig.get("delta.enableInCommitTimestamps").contains("true")
    // CHANGE DATA FEED state: sticky once on (a CDF consumer must
    // never see the feed silently stop), enabled either by the flag
    // or by the resumed log's own configuration. CDF rides the
    // writer-v7 feature list, so a resumed LEGACY (pre-ICT) mirror
    // cannot enable it mid-history — refuse rather than emit a
    // protocol shape the spec does not define for minWriterVersion 2.
    val cdfWasOn = prevConfig.get("delta.enableChangeDataFeed")
      .contains("true")
    val cdfOn = changeDataFeed || cdfWasOn
    require(!cdfOn || ictOn,
      s"delta mirror of $table: changeDataFeed needs the writer-v7 " +
        "feature list but this resumed mirror predates in-commit " +
        "timestamps (legacy protocol) — start a fresh mirror to " +
        "enable the change data feed")
    // mid-history enablement: the first commit of this run re-emits
    // metaData (with the CDF config) and a protocol upgrade
    var cdfMetaPending = cdfOn && !cdfWasOn
    var cdfAnnounced = cdfWasOn
    // DELETION VECTORS: announced (protocol upgrade + metaData
    // config) by the first mirrored version that carries one; sticky
    // (a DV consumer must keep resolving pairings) — exactly the CDF
    // enablement pattern
    var dvOn = dvWasOn
    var dvAnnounced = dvWasOn
    var dvMetaPending = false
    val tsByVersion = LakeWriter.snapshotTimestamps(spark, table).toMap
    val todo = lastMirrored match {
      case Some(g) => versions.filter(_ > g)
      case None =>
        val start = fromVersion.getOrElse(versions.head)
        require(versions.contains(start),
          s"delta mirror of $table: fromVersion $start is not a " +
            s"snapshot version (have ${versions.mkString(",")})")
        versions.filter(_ >= start)
    }
    // plan EVERY pending commit before writing any (metadata IO
    // only): a refusal mid-history must leave the log untouched, not
    // wedge the resume cursor behind a partially-mirrored prefix.
    // (With changeDataFeed on, `_change_data/` parquet IS written
    // during planning — the cdc actions need the file sizes — but a
    // refusal after some cdc dirs land leaves only INERT files: the
    // log never references them, exactly like an aborted attempt dir.)
    val planned = scala.collection.mutable.ListBuffer[(Long, String)]()
    // graft version the PREVIOUS mirrored commit captured — the
    // change-feed base for this one (None only before the first
    // commit, whose live set is empty, so it never has removes)
    var prevGv: Option[Long] = lastMirrored
    todo.zipWithIndex.foreach { case (gv, i) =>
      val dv = nextDv + i
      val files = LakeWriter.snapshotFiles(spark, table, gv)
      val partCols = LakeWriter.snapshotPartitionCols(spark, table, gv)
      val colmapV = LakeWriter.parseManifestColmap(spark, table, gv)
      val logical = LakeWriter.readSnapshot(spark, table, Some(gv)).schema
      // once any version carries a non-identity colmap, the mirror is
      // a column-mapped Delta table from that commit on (mode=name:
      // the reader resolves file columns by physicalName, which for
      // always-identity fields equals the logical name, so files
      // written BEFORE the upgrade keep resolving too)
      val needCm = cmOn || colmapV.map.nonEmpty || colmapV.dropped.nonEmpty
      partCols.foreach { c =>
        require(colmapV.phys(c) == c,
          s"delta mirror of $table: partition column $c is renamed " +
            "in the column mapping — not mirrorable")
      }
      val schemaJson =
        if (!needCm) logical.json
        else org.apache.spark.sql.types.StructType(logical.fields.map { f =>
          val phys = colmapV.phys(f.name)
          val id = colIds.getOrElseUpdate(phys, {
            maxColId += 1; maxColId })
          f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong("delta.columnMapping.id", id.toLong)
              .putString("delta.columnMapping.physicalName", phys)
              .build())
        }).json
      val ts = tsByVersion.getOrElse(gv, System.currentTimeMillis())
      val rels = files.map(addPathOf)
      val adds = rels.filterNot(live.contains)
      val removes = live.toSeq.filterNot(rels.toSet.contains)
      // MERGE-ON-READ deletion vectors of THIS graft version: a
      // carried file whose DV changed re-ADDS under the new pairing
      // and REMOVES the exact old one ((path, dvUniqueId)
      // reconciliation — bytes in the log, no data rewrite, the whole
      // point of the MOR delete at 100 TB)
      val dvsV = LakeWriter.parseManifestDvs(spark, table, gv)
      def descOf(rel: String): Option[DeletionVectors.DvDescriptor] =
        dvsV.get(percentDecode(rel).split('/').last).map(d =>
          DeletionVectors.DvDescriptor("i", d.z85, None,
            d.sizeInBytes, d.cardinality))
      val dvChanged = rels.filter(r => live.contains(r) &&
        liveDv.get(r).map(_.uniqueId) != descOf(r).map(_.uniqueId))
      if (dvsV.nonEmpty) {
        require(ictOn,
          s"delta mirror of $table: graft v$gv carries deletion " +
            "vectors, which need the writer-v7 feature list, but " +
            "this resumed mirror predates in-commit timestamps " +
            "(legacy protocol) — start a fresh mirror")
        dvOn = true
        if (!dvAnnounced) dvMetaPending = true
      }
      val addEmit = adds ++ dvChanged
      val removeEmit = removes ++ dvChanged
      // a partition-spec CHANGE over carried files is not
      // Delta-expressible: the carried files' add actions recorded
      // partitionValues under the OLD spec, and a conforming reader
      // resolves partitions from those recorded values, not paths.
      // (Graft-side this is the evolution carry — the mirror twin of
      // commitSnapshotDynamic's documented caveat.)
      if (prevPartCols.exists(_ != partCols)) {
        val carried = rels.filter(live.contains)
        require(carried.isEmpty,
          s"delta mirror of $table: partition spec changed " +
            s"${prevPartCols.get.mkString(",")} -> " +
            s"${partCols.mkString(",")} at graft v$gv with " +
            s"${carried.size} carried file(s) — run " +
            "migratePartitionSpec, then mirror from the migrated " +
            "version (mirror(…, fromVersion = Some(v)))")
      }
      val stats = LakeWriter.parseManifestStatsFull(spark, table, gv)
      // physical-name -> type map for the stats JSON (manifest stats
      // are keyed by physical column name, exactly like Delta's
      // stats on a column-mapped table)
      val physTypes = logical.fields.map(f =>
        colmapV.phys(f.name) -> f.dataType).toMap
      // sizes/mtimes: bounded-parallel metadata fetches, new files only
      val meta: Map[String, (Long, Long)] =
        if (addEmit.isEmpty) Map.empty
        else {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(16, addEmit.size))
          try addEmit.map { r =>
            r -> pool.submit(
              new java.util.concurrent.Callable[(Long, Long)] {
                def call(): (Long, Long) = {
                  val st = fs.getFileStatus(absOf(r))
                  (st.getLen, st.getModificationTime)
                }
              })
          }.map { case (r, fut) => r -> fut.get() }.toMap
          finally pool.shutdown()
        }
      def partValuesJson(rel: String): JObject = {
        // rel is the ENCODED add.path; extract values from the
        // decoded ON-DISK name (the form hive escaping lives in)
        if (partCols.isEmpty) JObject(List.empty)
        else partValuesOf(partCols, percentDecode(rel)) match {
          case None => sys.error(
            s"delta mirror of $table: $rel predates the " +
              s"${partCols.mkString(",")} partition spec — run " +
              "migratePartitionSpec before mirroring")
          case Some(raw) =>
            // hive-escaped raw path values decode to the LOGICAL
            // value here (the authoritative partitionValues map);
            // the matching add.path keeps the escaped on-disk form,
            // re-encoded by encodeRelPath so readers' URL-decode
            // lands back on the real directory name
            JObject(partCols.zip(raw).map { case (c, v) =>
              val dec = percentDecode(v)
              c -> (if (dec == "__HIVE_DEFAULT_PARTITION__") JNull
                    else JString(dec): JValue)
            }.toList)
        }
      }
      // the ICT contract: strictly increasing across commits, clamped
      // to the graft commit wall-clock when the clock itself moved
      val ict = math.max(ts, prevIct + 1)
      if (ictOn) prevIct = ict
      val actions = scala.collection.mutable.ListBuffer[JValue]()
      actions += JObject(List("commitInfo" -> JObject(List(
        "timestamp" -> JInt(BigInt(ts)),
        "operation" -> JString(if (dv == 0) "WRITE" else "MERGE"),
        "operationParameters" -> JObject(List.empty),
        "engineInfo" -> JString("graft-snapshot-mirror"),
        "graftVersion" -> JInt(BigInt(gv))) ++
        (if (ictOn) List("inCommitTimestamp" -> (JInt(BigInt(ict)): JValue))
         else Nil))))
      // APPLICATION TRANSACTIONS mirror as SetTransaction actions —
      // the manifest's {appId -> version} map is the same idempotence
      // cursor Delta's txn action carries, so a foreign engine
      // continuing an incremental write sees the graft writer's
      // exactly-once state. Only entries that CHANGED at this version
      // emit (the map carries forward verbatim otherwise).
      val txnsV = LakeWriter.parseManifestTxns(spark, table, gv)
      txnsV.toSeq.sortBy(_._1).foreach { case (a, tv) =>
        if (!prevTxns.get(a).contains(tv))
          actions += JObject(List("txn" -> JObject(List(
            "appId" -> JString(a),
            "version" -> JInt(BigInt(tv)),
            "lastUpdated" -> JInt(BigInt(ts))))))
      }
      prevTxns = txnsV
      // protocol: ICT mirrors write minWriterVersion 7 with the full
      // writerFeatures list (the spec's rule at writer v7: every
      // feature the table uses is named); reader side stays 1, or 2
      // when column mapping is on. Legacy (resumed pre-ICT) mirrors
      // keep (1,2)/(2,5). A mid-history rename/drop emits the
      // protocol UPGRADE action in its own commit, as a Delta writer
      // enabling a feature does.
      def protocolJson(cm: Boolean): JValue = JObject(List(
        "protocol" -> JObject(List(
          "minReaderVersion" -> JInt(
            if (dvOn) 3 else if (cm) 2 else 1),
          "minWriterVersion" -> JInt(
            if (ictOn) 7 else if (cm) 5 else 2)) ++
          // reader v3 (deletion vectors) must NAME every reader
          // feature the table uses
          (if (dvOn) List("readerFeatures" -> (JArray(
            ((if (cm) List("columnMapping") else Nil) :+
              "deletionVectors").map(JString(_): JValue)): JValue))
           else Nil) ++
          (if (ictOn) List("writerFeatures" -> (JArray(
            ((if (cm) List("columnMapping") else Nil) ++
              (if (cdfOn) List("changeDataFeed") else Nil) ++
              (if (dvOn) List("deletionVectors") else Nil) :+
              "inCommitTimestamp").map(JString(_): JValue)): JValue))
           else Nil))))
      if (dv == 0) {
        actions += protocolJson(needCm)
        cdfAnnounced = cdfOn; dvAnnounced = dvOn
      }
      else if ((needCm && !cmOn) || (cdfOn && !cdfAnnounced) ||
          (dvOn && !dvAnnounced)) {
        actions += protocolJson(cm = needCm || cmOn)
        cdfAnnounced = cdfOn; dvAnnounced = dvOn
      }
      cmOn = cmOn || needCm
      if (!prevSchemaJson.contains(schemaJson) ||
          !prevPartCols.contains(partCols) || cdfMetaPending ||
          dvMetaPending) {
        cdfMetaPending = false; dvMetaPending = false
        actions += JObject(List("metaData" -> JObject(List(
          "id" -> JString(java.util.UUID.nameUUIDFromBytes(
            s"graft:$table".getBytes("UTF-8")).toString),
          "name" -> JNull,
          "description" -> JNull,
          "format" -> JObject(List(
            "provider" -> JString("parquet"),
            "options" -> JObject(List.empty))),
          "schemaString" -> JString(schemaJson),
          "partitionColumns" -> JArray(
            partCols.map(JString(_): JValue).toList),
          "configuration" -> JObject(
            (if (needCm) List(
              "delta.columnMapping.mode" -> (JString("name"): JValue),
              "delta.columnMapping.maxColumnId" -> (JString(
                maxColId.toString): JValue))
             else Nil) ++
            (if (ictOn) List("delta.enableInCommitTimestamps" ->
              (JString("true"): JValue)) else Nil) ++
            (if (cdfOn) List("delta.enableChangeDataFeed" ->
              (JString("true"): JValue)) else Nil) ++
            (if (dvOn) List("delta.enableDeletionVectors" ->
              (JString("true"): JValue)) else Nil)),
          "createdTime" -> JInt(BigInt(ts))))))
        prevSchemaJson = Some(schemaJson); prevPartCols = Some(partCols)
      }
      // CHANGE DATA FEED files: only a commit that both adds AND
      // removes needs them — a CDF reader synthesizes insert-only /
      // delete-only commits from the add/remove actions exactly. The
      // net feed is delta-bounded (changesBetween never opens carried
      // files); an EMPTY net feed means the rewrite was a compaction,
      // encoded as dataChange=false on this commit's add/remove
      // actions (the spec's "files changed, rows did not").
      var rowsChanged = true
      val cdcActions = scala.collection.mutable.ListBuffer[JValue]()
      if (cdfOn && addEmit.nonEmpty && removeEmit.nonEmpty) {
        val baseGv = prevGv.getOrElse(sys.error(
          s"delta mirror of $table: commit with removes but no " +
            "predecessor — mirror cursor corrupt"))
        // the CANONICAL feed derivation (net changes + update-image
        // pairing for keyed merges) — shared with the gates so the
        // labels a foreign CDF consumer reads are the labels graft
        // derives
        val feed = LakeWriter.changeFeedBetween(spark, table, baseGv,
          gv).persist()
        try {
          if (feed.isEmpty) rowsChanged = false
          else {
            // data columns to PHYSICAL names (cdc files follow the
            // same column mapping as data files); `_change_type` is
            // spec-literal and passes through colmap untouched
            val dataCols = logical.fieldNames.toSeq :+ "_change_type"
            val physFeed = LakeWriter.toPhysical(
              feed.select(dataCols.map(
                org.apache.spark.sql.functions.col): _*), colmapV)
            val cdcDir = new org.apache.hadoop.fs.Path(
              root, s"_change_data/v$dv-" +
                java.util.UUID.randomUUID().toString.take(8))
            LakeWriter.withMicrosTimestamps(spark) {
              val w = physFeed.write.mode("errorifexists")
              (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
                .parquet(cdcDir.toString)
            }
            LakeWriter.walk(fs, cdcDir).sorted.foreach { f =>
              val rel = encodeRelPath(f.stripPrefix(root + "/"))
              val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
              cdcActions += JObject(List("cdc" -> JObject(List(
                "path" -> JString(rel),
                "partitionValues" -> partValuesJson(rel),
                "size" -> JInt(BigInt(st.getLen)),
                "dataChange" -> JBool(false)))))
            }
          }
        } finally feed.unpersist(): Unit
      }
      def dvJson(d: DeletionVectors.DvDescriptor): JValue =
        JObject(List(
          "storageType" -> JString(d.storageType),
          "pathOrInlineDv" -> JString(d.pathOrInlineDv),
          "sizeInBytes" -> JInt(BigInt(d.sizeInBytes)),
          "cardinality" -> JInt(BigInt(d.cardinality))))
      removeEmit.foreach { r =>
        // the remove retires the pairing the file was LIVE under —
        // with its old DV when it had one, bare otherwise
        actions += JObject(List("remove" -> JObject(List(
          "path" -> JString(r),
          "deletionTimestamp" -> JInt(BigInt(ts)),
          "dataChange" -> JBool(rowsChanged)) ++
          liveDv.get(r).map(d =>
            "deletionVector" -> dvJson(d)).toList)))
      }
      addEmit.foreach { r =>
        val (len, mtime) = meta(r)
        val statsJson = stats.get(percentDecode(r).split('/').last)
          .flatMap(deltaStatsJson(_, physTypes))
        actions += JObject(List("add" -> JObject(List(
          "path" -> JString(r),
          "partitionValues" -> partValuesJson(r),
          "size" -> JInt(BigInt(len)),
          "modificationTime" -> JInt(BigInt(mtime)),
          "dataChange" -> JBool(rowsChanged)) ++
          descOf(r).map(d =>
            "deletionVector" -> dvJson(d)).toList ++
          statsJson.map(sj => "stats" -> (JString(sj): JValue)).toList)))
      }
      actions ++= cdcActions
      val body = actions
        .map(j => JsonMethods.compact(JsonMethods.render(j)))
        .mkString("", "\n", "\n")
      planned += (dv -> body)
      rels.foreach(live += _)
      live.filterInPlace(rels.toSet.contains)
      // DV state follows the live set
      liveDv.keys.filterNot(rels.toSet.contains).toSeq
        .foreach(liveDv -= _)
      rels.foreach(r => descOf(r) match {
        case Some(d) => liveDv(r) = d
        case None => liveDv -= r
      })
      prevGv = Some(gv)
    }
    planned.foreach { case (dv, body) =>
      // atomic publish, like the manifest commit: dot-hidden tmp +
      // rename, so a concurrent reader only ever lists whole commits
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, s".${commitName(dv)}.tmp")
      val out = fs.create(tmp, true)
      out.write(body.getBytes("UTF-8")); out.close()
      val dest = new org.apache.hadoop.fs.Path(dir, commitName(dv))
      if (!fs.rename(tmp, dest))
        sys.error(s"delta mirror of $table: commit $dv lost a publish " +
          "race (concurrent mirror?)")
    }
    // cadence check runs even when nothing new mirrored: a crash
    // between publishing commits and checkpointing would otherwise
    // leave the checkpoint overdue forever on a quiet table (every
    // later no-new-versions call skipping it) — self-healing instead
    if (checkpointEvery > 0) {
      val tip = nextDv + planned.size - 1
      val lastCp = lastCheckpointInfo(fs, dir).map(_.version).getOrElse(-1L)
      if (tip >= 0 && tip - lastCp >= checkpointEvery)
        checkpoint(spark, table): Unit
    }
    todo.size.toLong
  }

  // ------------------------------------------------------------------
  // checkpoint (classic single-file)
  // ------------------------------------------------------------------

  /** Write a CLASSIC Delta checkpoint of `table`'s log at its current
    * tip — one parquet file of flattened actions (the reconciled
    * protocol + metaData + every live add with its partitionValues and
    * stats) plus the `_last_checkpoint` pointer, exactly what the
    * protocol prescribes so foreign readers (and [[readDelta]] /
    * [[mirror]]'s own resume) start from the checkpoint and replay
    * only the JSON tail. Tombstones are dropped (equivalent to an
    * expired retention window — they only matter for VACUUM, which
    * graft handles on the manifest side). Metadata-only: one
    * metadata-sized parquet write, no data IO. Idempotent at a given
    * tip. Returns the checkpointed delta version. */
  def checkpoint(spark: SparkSession, table: String): Long = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val (st, v) = replay(spark, table, None)
    // GUARD before writing: a checkpoint is the reconciled state —
    // anything replay saw but did not MODEL would be silently DROPPED
    // from the base, and once the covered JSON commits are
    // retention-cleaned the information is gone with no refusal left
    // to fire. Protocol feature lists, deletion vectors and
    // domainMetadata are modeled and preserved below; an action KIND
    // outside the modeled set refuses here.
    require(st.unknownActions.isEmpty,
      s"refusing to checkpoint $table: the log carries action kinds " +
        s"(${st.unknownActions.toSeq.sorted.mkString(", ")}) this " +
        "checkpoint schema would drop — a reader starting from the " +
        "checkpoint would silently lose that state")
    val anyDv = st.live.values.exists(_.dv.nonEmpty)
    val hasFeatures = st.protocol._1 >= 3 || st.protocol._2 >= 7
    val log = logDir(table)
    val fs = LakeWriter.fsOf(spark, log)
    val md = st.metaData.getOrElse(sys.error(
      s"no metaData action in $table's _delta_log — nothing to checkpoint"))
    // the deletionVector struct (spec field names) rides only when
    // some live add carries one — plain tables keep the plain schema
    val dvT = StructType(Seq(
      StructField("storageType", StringType, true),
      StructField("pathOrInlineDv", StringType, true),
      StructField("offset", IntegerType, true),
      StructField("sizeInBytes", IntegerType, true),
      StructField("cardinality", LongType, true)))
    val addT = StructType(Seq(
      StructField("path", StringType, false),
      StructField("partitionValues",
        MapType(StringType, StringType, true), true),
      StructField("size", LongType, true),
      StructField("modificationTime", LongType, true),
      StructField("dataChange", BooleanType, true),
      StructField("stats", StringType, true)) ++
      (if (anyDv) Seq(StructField("deletionVector", dvT, true)) else Nil))
    val removeT = StructType(Seq(
      StructField("path", StringType, true),
      StructField("deletionTimestamp", LongType, true),
      StructField("dataChange", BooleanType, true)))
    val metaT = StructType(Seq(
      StructField("id", StringType, true),
      StructField("name", StringType, true),
      StructField("description", StringType, true),
      StructField("format", StructType(Seq(
        StructField("provider", StringType, true),
        StructField("options",
          MapType(StringType, StringType, true), true))), true),
      StructField("schemaString", StringType, true),
      StructField("partitionColumns", ArrayType(StringType, false), true),
      StructField("configuration",
        MapType(StringType, StringType, true), true),
      StructField("createdTime", LongType, true)))
    val protoT = StructType(Seq(
      StructField("minReaderVersion", IntegerType, true),
      StructField("minWriterVersion", IntegerType, true)) ++
      (if (hasFeatures) Seq(
        StructField("readerFeatures", ArrayType(StringType, true), true),
        StructField("writerFeatures", ArrayType(StringType, true), true))
      else Nil))
    val txnT = StructType(Seq(
      StructField("appId", StringType, true),
      StructField("version", LongType, true)))
    val domainT = StructType(Seq(
      StructField("domain", StringType, true),
      StructField("configuration", StringType, true),
      StructField("removed", BooleanType, true)))
    val cpSchema = StructType(Seq(
      StructField("txn", txnT, true),
      StructField("add", addT, true),
      StructField("remove", removeT, true),
      StructField("metaData", metaT, true),
      StructField("protocol", protoT, true)) ++
      (if (st.domains.nonEmpty)
        Seq(StructField("domainMetadata", domainT, true)) else Nil))
    def s0(j: JValue): String = str(j).orNull
    def m0(j: JValue): Map[String, String] = j match {
      case JObject(fields) => fields.map { case (k, jv) =>
        k -> (jv match { case JString(s) => s; case _ => null }) }.toMap
      case _ => Map.empty
    }
    val mdRow = Row(s0(md \ "id"), s0(md \ "name"), s0(md \ "description"),
      Row(str(md \ "format" \ "provider").getOrElse("parquet"),
        m0(md \ "format" \ "options")),
      s0(md \ "schemaString"),
      (md \ "partitionColumns" match {
        case JArray(xs) => xs.flatMap(str); case _ => Seq.empty }),
      m0(md \ "configuration"),
      (md \ "createdTime" match {
        case JInt(n) => java.lang.Long.valueOf(n.toLong); case _ => null }))
    // one action per row, nulls elsewhere; column count varies with
    // the conditional domainMetadata column
    val nCols = cpSchema.length
    def actionRow(i: Int, v: Any): Row = {
      val arr = new Array[Any](nCols)
      arr(i) = v
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
    }
    val protoRow = actionRow(4,
      if (hasFeatures)
        Row(st.protocol._1, st.protocol._2,
          if (st.protocol._1 >= 3) st.readerFeatures.toSeq.sorted else null,
          if (st.protocol._2 >= 7) st.writerFeatures.toSeq.sorted else null)
      else Row(st.protocol._1, st.protocol._2))
    val headRows = Seq(protoRow, actionRow(3, mdRow)) ++
      // SetTransaction state must survive the checkpoint (spec:
      // writers' idempotence cursors are part of the reconciled state)
      st.txns.toSeq.sortBy(_._1).map { case (a, v) =>
        actionRow(0, Row(a, java.lang.Long.valueOf(v))) } ++
      // latest domainMetadata per domain likewise (removed tombstones
      // ride along verbatim — dropping them is a retention policy this
      // writer does not impose)
      st.domains.toSeq.sortBy(_._1).map { case (d, (cfg, rm)) =>
        actionRow(5, Row(d, cfg, java.lang.Boolean.valueOf(rm))) }
    val addRows = st.live.toSeq.map { case ((p, _), i) =>
      val base = Seq(p,
        i.partitionValues.map { case (k, ov) => k -> ov.orNull }.toMap,
        java.lang.Long.valueOf(i.size),
        java.lang.Long.valueOf(i.modificationTime),
        java.lang.Boolean.FALSE, i.stats.orNull)
      val dvCell = i.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
        d.offset.map(java.lang.Integer.valueOf).orNull,
        java.lang.Integer.valueOf(d.sizeInBytes),
        java.lang.Long.valueOf(d.cardinality))).orNull
      actionRow(1, Row.fromSeq(
        if (anyDv) base :+ dvCell else base))
    }
    val rows = headRows ++ addRows
    val df = spark.createDataFrame(rows.asJava, cpSchema).repartition(1)
    val tmpDir = new org.apache.hadoop.fs.Path(log,
      s".cp-$v-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"checkpoint write at $table produced no parquet"))
    val dest = new org.apache.hadoop.fs.Path(log, checkpointName(v))
    // overwrite-rename, NOT delete-then-rename: an idempotent
    // re-checkpoint at the same tip must never open a window where
    // _last_checkpoint points at a missing file (a concurrent reader
    // would refuse spuriously)
    org.apache.hadoop.fs.FileContext.getFileContext(part.toUri,
        spark.sessionState.newHadoopConf())
      .rename(part, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    fs.delete(tmpDir, true)
    // the pointer goes LAST (atomic overwrite-rename): a reader either
    // sees the previous pointer or the new, complete checkpoint.
    // graftVersion rides along so mirror's resume keeps its cursor
    // without replaying pre-checkpoint JSON (foreign readers ignore
    // unknown _last_checkpoint fields)
    val lcBody = JsonMethods.compact(JsonMethods.render(JObject(List(
      "version" -> (JInt(BigInt(v)): JValue),
      "size" -> (JInt(BigInt(rows.size)): JValue),
      // optional pointer fields the protocol defines — foreign readers
      // use them to size the read before opening the checkpoint
      "sizeInBytes" -> (JInt(BigInt(
        fs.getFileStatus(dest).getLen)): JValue),
      "numOfAddFiles" -> (JInt(BigInt(addRows.size)): JValue)) ++
      st.lastGraft.map(g =>
        "graftVersion" -> (JInt(BigInt(g)): JValue)).toList ++
      // the ICT monotonicity floor must survive covered-JSON cleanup
      // (commitInfo actions are not checkpointed); foreign readers
      // ignore unknown _last_checkpoint fields
      st.lastIct.map(t =>
        "ict" -> (JInt(BigInt(t)): JValue)).toList)))
    val lcTmp = new org.apache.hadoop.fs.Path(log, "._last_checkpoint.tmp")
    val out = fs.create(lcTmp, true)
    out.write(lcBody.getBytes("UTF-8")); out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(lcTmp.toUri,
        spark.sessionState.newHadoopConf())
      .rename(lcTmp, new org.apache.hadoop.fs.Path(log, "_last_checkpoint"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    v
  }

  // ------------------------------------------------------------------
  // timestamp resolution (TIMESTAMP AS OF)
  // ------------------------------------------------------------------

  /** One commit's wall clock: ICT when present, else the commitInfo
    * timestamp, else the file mtime — the resolution order both
    * TIMESTAMP AS OF and the change feed's `_commit_timestamp` use. */
  private def commitTsOf(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, acts: Seq[JValue]): Long =
    acts.view.flatMap { j =>
      (j \ "commitInfo" \ "inCommitTimestamp") match {
        case JInt(t) => Some(t.toLong)
        case _ => (j \ "commitInfo" \ "timestamp") match {
          case JInt(t) => Some(t.toLong)
          case _ => None
        }
      }
    }.headOption.getOrElse(fs.getFileStatus(p).getModificationTime)

  /** Resolve `dir` at the newest delta version whose commit timestamp
    * is at or before `tsMillis` and read it — TIMESTAMP AS OF. Per
    * commit the timestamp is [[commitTsOf]]'s spec-precedence
    * resolution. Scans only the SURVIVING JSON commits (O(retention
    * window), metadata-only); a target below the oldest surviving
    * commit refuses loudly like any other unresolvable time travel. */
  def readDeltaTimestamp(spark: SparkSession, dir: String,
                         tsMillis: Long): DataFrame = {
    val log = logDir(dir)
    val fs = LakeWriter.fsOf(spark, log)
    val stamps: Seq[(Long, Long)] = deltaVersions(spark, dir).map { v =>
      val p = new org.apache.hadoop.fs.Path(log, commitName(v))
      v -> commitTsOf(fs, p, readCommit(fs, p))
    }
    val at = stamps.filter(_._2 <= tsMillis).map(_._1).maxOption
      .getOrElse(sys.error(
        s"delta table at $dir: no surviving commit at or before " +
          s"timestamp $tsMillis (oldest surviving commit is " +
          s"${stamps.headOption.map(s => s"version ${s._1} @ ${s._2}")
            .getOrElse("<none>")}) — refusing"))
    readDelta(spark, dir, Some(at))
  }

  /** CHANGE DATA FEED reader — the incremental-consumer side of the
    * bridge: resolve the row-level changes of delta versions
    * `[fromVersion, toVersion]` from a CDF-enabled `_delta_log`
    * exactly as the protocol prescribes, returning the table columns
    * plus `_change_type` ("insert" | "delete" | the file's own value
    * for update pre/post images) and `_commit_version`. Per commit:
    * `cdc` actions are AUTHORITATIVE when present (their
    * `_change_data` parquet is read, add/remove ignored for the
    * feed); otherwise the changes synthesize from the actions —
    * `dataChange=true` adds read as inserts, `dataChange=true`
    * removes read their (still-on-disk) files as deletes, and a
    * `dataChange=false` rewrite (compaction) contributes nothing.
    * DELETION VECTORS synthesize as bitmap diffs: a same-path
    * remove+add re-pairing emits delete rows in (new \ old) and
    * insert rows in (old \ new) — deletes normally grow the bitmap so
    * the insert side is empty, but a restore re-pins a smaller one
    * and its rows come back; a removed DV-paired file's delete rows
    * EXCLUDE the retired bitmap (already reported); a DV on a
    * brand-new file narrows its insert. Works on graft's own CDF
    * mirrors and on foreign CDF tables (the import twin of
    * `mirror(changeDataFeed = true)`); the cost is bounded by the
    * CHANGED files of the range, never table size.
    *
    * Refuses loudly when: a range commit's JSON was retention-cleaned
    * (cdc actions are never checkpointed, so the feed below the log
    * floor is GONE — serving a partial feed would silently lose
    * changes); CDF is not enabled over the whole range; or the schema
    * changes mid-range (Delta's own CDF readers refuse this too). */
  def readChangeFeed(spark: SparkSession, dir: String,
                     fromVersion: Long,
                     toVersion: Option[Long] = None): DataFrame = {
    val log = logDir(dir)
    val fs = LakeWriter.fsOf(spark, log)
    require(fs.exists(log), s"no _delta_log at $dir")
    val jsons = deltaVersions(spark, dir)
    val to = toVersion.getOrElse(jsons.maxOption.getOrElse(sys.error(
      s"readChangeFeed at $dir: no JSON commits survive — the change " +
        "feed resolves from commit JSONs only (cdc actions are never " +
        "checkpointed)")))
    require(fromVersion >= 0 && fromVersion <= to,
      s"readChangeFeed at $dir: bad range [$fromVersion, $to]")
    val jsonSet = jsons.toSet
    val missing = (fromVersion to to).filterNot(jsonSet)
    require(missing.isEmpty,
      s"readChangeFeed at $dir: commit JSON(s) " +
        s"${missing.mkString(", ")} are not on disk (log retention " +
        "cleaned them) — the feed below the retention floor is gone; " +
        "refusing a silently partial feed")
    val st =
      if (fromVersion == 0) new LogState
      else replay(spark, dir, Some(fromVersion - 1))._1
    // the governing (schema, partitioning) of the WHOLE range is what
    // holds after the FIRST in-range commit (a REPLACE TABLE at the
    // range start governs its own changes); any change at a LATER
    // commit refuses — one state must describe every slice served
    var baseline: Option[(Option[String], Seq[String])] = None
    // the state replayed BEFORE the range: a range-start commit that
    // CHANGES it (REPLACE TABLE) governs its own adds/cdc files, but
    // its dataChange REMOVES point at files written under the OLD
    // state — synthesizing those deletes with the new schema/partCols
    // would silently misread them, so that one shape refuses
    val preRange: Option[(Option[String], Seq[String])] =
      if (st.metaData.isEmpty) None
      else Some((st.schemaJson, st.partCols))
    // paths ADDED so far in the range (any dataChange), in commit
    // order: after a range-start REPLACE, a synthesized delete is
    // faithful only when the removed instance was added by the range
    // itself (post-replacement era) — membership is checked AT the
    // remove, so a pre-range file re-added later never masks it
    val addedInRange = scala.collection.mutable.Set[String]()
    val preEraDeletes =
      scala.collection.mutable.ListBuffer[(Long, String)]()
    // (version, change-type override — None when the file carries its
    // own `_change_type` column, i.e. a cdc file —, path, pv, and the
    // optional DV row windows: only rows whose `_metadata.row_index`
    // is IN the first bitmap / NOT in the second are served (the
    // deletion-vector synthesis — bitmap diffs, not whole files)
    val slices = scala.collection.mutable.ListBuffer[
      (Long, Option[String], String, Seq[(String, Option[String])],
        Option[(Array[Byte], String)], Option[(Array[Byte], String)])]()
    val rootQ = fs.makeQualified(
      new org.apache.hadoop.fs.Path(dir)).toString
    // bitmap bytes per descriptor uniqueId, fetched once per range
    // (inline decode or .bin seek — CRC-verified by the kernel)
    val dvByteCache =
      scala.collection.mutable.Map[String, Array[Byte]]()
    def dvWin(d: DeletionVectors.DvDescriptor): (Array[Byte], String) =
      (dvByteCache.getOrElseUpdate(d.uniqueId,
        DeletionVectors.readBitmapBytes(fs, rootQ, d)), d.uniqueId)
    def pvOf(a: JValue): Seq[(String, Option[String])] =
      a \ "partitionValues" match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> (v match { case JString(s) => Some(s); case _ => None }) }
        case _ => Seq.empty
      }
    // per-version commit timestamp — ICT when present, else the
    // commitInfo wall clock, else the file mtime (the
    // readDeltaTimestamp resolution order); CDF consumers use it as
    // `_commit_timestamp`
    val tsByVersion = scala.collection.mutable.Map[Long, Long]()
    (fromVersion to to).foreach { v =>
      val cp0 = new org.apache.hadoop.fs.Path(log, commitName(v))
      val acts = readCommit(fs, cp0)
      tsByVersion(v) = commitTsOf(fs, cp0, acts)
      val cdcs = acts.flatMap(j => str(j \ "cdc" \ "path")
        .map(p => (p, pvOf(j \ "cdc"))))
      if (cdcs.nonEmpty) {
        acts.foreach(j =>
          str(j \ "add" \ "path").foreach(addedInRange += _))
        cdcs.foreach { case (p, pv) =>
          slices += ((v, None, p, pv, None, None))
        }
      } else {
        def dc(a: JValue): Boolean =
          (a \ "dataChange") != JBool(false)
        // the removed INSTANCE of any path existed BEFORE this commit
        // — the pre-era check must see the range state as of the
        // commit START, not this commit's own (re-)adds
        val addedBefore = addedInRange.toSet
        acts.foreach(j =>
          str(j \ "add" \ "path").foreach(addedInRange += _))
        // group THIS commit's dataChange adds/removes by path: COW
        // never reuses a file name, so a path both removed and
        // re-added is a DELETION-VECTOR re-pairing — its net rows are
        // the bitmap diff (delete new\old, insert old\new), exactly
        // what a cdc file would have carried
        val adds = acts.flatMap { j =>
          str(j \ "add" \ "path").filter(_ => dc(j \ "add")).map(p =>
            p -> (pvOf(j \ "add"),
              parseDvDescriptor(j \ "add" \ "deletionVector")))
        }.toMap
        val removes = acts.flatMap { j =>
          str(j \ "remove" \ "path").filter(_ => dc(j \ "remove")).map(p =>
            p -> (pvOf(j \ "remove"),
              parseDvDescriptor(j \ "remove" \ "deletionVector")))
        }.toMap
        adds.toSeq.sortBy(_._1).foreach { case (p, (pv, dvN)) =>
          removes.get(p) match {
            case Some((_, dvO)) =>
              // the re-paired instance predates this commit: under a
              // range-start replacement its rows would read with a
              // state they were never written under — same hazard as
              // a plain pre-era remove
              if (!addedBefore.contains(p)) preEraDeletes += ((v, p))
              (dvN, dvO) match {
                case (Some(nw), _) =>
                  slices += ((v, Some("delete"), p, pv,
                    Some(dvWin(nw)), dvO.map(dvWin)))
                  dvO.foreach { o =>
                    slices += ((v, Some("insert"), p, pv,
                      Some(dvWin(o)), Some(dvWin(nw))))
                  }
                case (None, Some(o)) =>
                  // DV retired, file re-added bare (restore): the old
                  // bitmap's rows come back
                  slices += ((v, Some("insert"), p, pv,
                    Some(dvWin(o)), None))
                case (None, None) =>
                  // same-path identity rewrite: whole-file delete +
                  // insert, the same net a two-file rewrite reports
                  slices += ((v, Some("delete"), p, pv, None, None))
                  slices += ((v, Some("insert"), p, pv, None, None))
              }
            case None =>
              // plain add; a DV on a brand-new file narrows the insert
              slices += ((v, Some("insert"), p, pv, None, dvN.map(dvWin)))
          }
        }
        removes.toSeq.sortBy(_._1).foreach { case (p, (pv0, dvO)) =>
          if (!adds.contains(p)) {
            // the remove action may omit partitionValues; the file's
            // own add (still live in the pre-commit state) carries them
            val pv = pv0 match {
              case s if s.nonEmpty => s
              case _ => st.live.collectFirst {
                case ((lp, _), info) if lp == p => info.partitionValues
              }.getOrElse(Seq.empty)
            }
            if (!addedBefore.contains(p)) preEraDeletes += ((v, p))
            // a removed file's delete rows EXCLUDE its retired bitmap
            // (those rows were reported deleted when the DV appeared)
            slices += ((v, Some("delete"), p, pv, None, dvO.map(dvWin)))
          }
        }
      }
      acts.foreach(applyAction(st, _))
      baseline match {
        case None =>
          baseline = Some((st.schemaJson, st.partCols))
        case Some((bSchema, bParts)) =>
          require(st.schemaJson == bSchema,
            s"readChangeFeed at $dir: the schema changed at commit " +
              s"$v inside the requested range — a single-schema feed " +
              "would misread one side; split the range at the schema " +
              "change")
          // partitioning can change with an IDENTICAL schemaString
          // (REPLACE TABLE ... PARTITIONED BY): the final partCols
          // would misattach values for earlier slices — same refusal
          require(st.partCols == bParts,
            s"readChangeFeed at $dir: partitionColumns changed at " +
              s"commit $v inside the requested range (" +
              s"${bParts.mkString(",")} -> " +
              s"${st.partCols.mkString(",")}) — split the range at " +
              "the re-partitioning")
      }
      val cdfEnabled = st.metaData.exists(md =>
        str(md \ "configuration" \ "delta.enableChangeDataFeed")
          .contains("true"))
      require(cdfEnabled,
        s"readChangeFeed at $dir: delta.enableChangeDataFeed is not " +
          s"set in the metadata governing commit $v — the feed is " +
          "only complete from the version CDF was enabled; refusing")
    }
    // a range that STARTS with a schema/partitioning replacement can
    // faithfully synthesize deletes only for files the range itself
    // added (post-replacement era); a remove of an earlier file —
    // whether in the replacing commit or any later one — would be
    // read with a state it was never written under
    if (preRange.nonEmpty && preRange != baseline) {
      preEraDeletes.headOption.foreach { case (dv, _) =>
        sys.error(
          s"readChangeFeed at $dir: the range starts with a " +
            "schema/partitioning replacement and commit " +
            s"$dv removes files written under the previous " +
            "state — their delete rows cannot be synthesized " +
            "faithfully; start the range after the replacement, or " +
            "rely on its cdc files")
      }
    }
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(st.schemaJson.getOrElse(
        sys.error(s"no metaData action in $dir's _delta_log")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val physOf: Map[String, String] = schema.fields.map { f =>
      f.name ->
        (if (f.metadata.contains("delta.columnMapping.physicalName"))
          f.metadata.getString("delta.columnMapping.physicalName")
        else f.name)
    }.toMap
    val partSet = st.partCols.toSet
    val root = fs.makeQualified(
      new org.apache.hadoop.fs.Path(dir)).toString
    def absOf(p: String): String = {
      val d = percentDecode(p)
      if (isAbsolutePath(d)) d else s"$root/$d"
    }
    import org.apache.spark.sql.types.{StructType, StructField,
      StringType, LongType, BooleanType, Metadata}
    val outFields = schema.fields.toSeq :+
      StructField("_change_type", StringType, true) :+
      StructField("_commit_version", LongType, true) :+
      StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType, true)
    if (slices.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(outFields))
    val hconf = spark.sessionState.newHadoopConf()
    def fileKey(p: String): String = {
      val abs = new org.apache.hadoop.fs.Path(absOf(p))
      val q = abs.getFileSystem(hconf).makeQualified(abs).toUri
      new java.net.URI(q.getScheme, q.getAuthority,
        q.getPath, null, null).toString
    }
    // one scan per file KIND (cdc files carry `_change_type`, data
    // files do not); each scan joins a broadcast (file -> version,
    // type, partition values) table, and a file changed in several
    // range commits fans out into one row per commit — the join IS
    // the fan-out, no repeated scans
    def serve(part: Seq[(Long, Option[String], String,
        Seq[(String, Option[String])], Option[(Array[Byte], String)],
        Option[(Array[Byte], String)])], withCt: Boolean): DataFrame = {
      val readSchema = StructType(
        schema.fields.filterNot(f => partSet(f.name)).map(f =>
          f.copy(name = physOf(f.name), metadata = Metadata.empty)) ++
        (if (withCt)
          Seq(StructField("_change_type", StringType, true)) else Nil))
      val files = part.map(t => absOf(t._3)).distinct
      val anyDv = part.exists(t => t._5.nonEmpty || t._6.nonEmpty)
      val metaRows: Seq[Row] = part.map {
        case (v, ct, p, pv, inDv, exDv) =>
          val vals = st.partCols.map { c =>
            val pn = physOf.getOrElse(c, c)
            pv.collectFirst {
              case (k, ov) if k == pn || k == c => ov }.flatten.orNull
          }
          Row.fromSeq((fileKey(p) +: vals) ++
            Seq(ct.orNull, java.lang.Long.valueOf(v),
              java.lang.Long.valueOf(tsByVersion(v)),
              inDv.map(_._1).orNull, inDv.map(_._2).orNull,
              exDv.map(_._1).orNull, exDv.map(_._2).orNull,
              java.lang.Boolean.TRUE))
      }
      val metaSchema = StructType(
        (StructField("__graft_file", StringType, false) +:
          st.partCols.map(c =>
            StructField(s"__graft_pv_$c", StringType, true))) ++ Seq(
          StructField("__graft_ct", StringType, true),
          StructField("__graft_ver", LongType, false),
          StructField("__graft_ts", LongType, false),
          StructField("__graft_indv",
            org.apache.spark.sql.types.BinaryType, true),
          StructField("__graft_inkey", StringType, true),
          StructField("__graft_exdv",
            org.apache.spark.sql.types.BinaryType, true),
          StructField("__graft_exkey", StringType, true),
          StructField("__graft_matched", BooleanType, true)))
      import scala.jdk.CollectionConverters._
      val metaDf = spark.createDataFrame(metaRows.asJava, metaSchema)
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
      val base0 = spark.read.schema(readSchema).parquet(files: _*)
        .withColumn("__graft_file", col("_metadata.file_path"))
      (if (anyDv)
        base0.withColumn("__graft_ridx", col("_metadata.row_index"))
       else base0)
        .join(broadcast(metaDf), Seq("__graft_file"), "left")
        .where(when(col("__graft_matched").isNotNull, dvKeep)
          .otherwise(raise_error(concat(
            lit(s"readChangeFeed at $dir: file "), col("__graft_file"),
            lit(" failed to match its commit entry (path-encoding " +
              "regression)"))).cast("boolean")))
        .select(outFields.map { f =>
          if (f.name == "_commit_version") col("__graft_ver").as(f.name)
          else if (f.name == "_commit_timestamp")
            // exact: double division + cast truncates 1 us below the
            // millisecond for some values; timestamp_millis is integral
            org.apache.spark.sql.functions
              .timestamp_millis(col("__graft_ts")).as(f.name)
          else if (f.name == "_change_type")
            (if (withCt) coalesce(col("__graft_ct"), col("_change_type"))
             else col("__graft_ct")).as(f.name)
          else if (partSet(f.name))
            col(s"__graft_pv_${f.name}").cast(f.dataType).as(f.name)
          else col(physOf(f.name)).as(f.name)
        }.toIndexedSeq: _*)
    }
    val (cdcPart, synthPart) = slices.toSeq.partition(_._2.isEmpty)
    val parts =
      (if (cdcPart.nonEmpty) Seq(serve(cdcPart, withCt = true)) else Nil) ++
      (if (synthPart.nonEmpty) Seq(serve(synthPart, withCt = false))
       else Nil)
    parts.reduce(_ unionByName _)
  }

  // ------------------------------------------------------------------
  // streaming change-feed consumption
  // ------------------------------------------------------------------

  /** STREAMING consumption of the change feed — the production
    * incremental-consumer shape (the reference's speed layer:
    * airflow/dags/spark_code streams a CDF-enabled table): the
    * table's `_delta_log` IS the stream. Every committed delta
    * version is one durably-named JSON file that appears atomically
    * via the publish rename (in-flight tmps are dot-hidden, so the
    * Structured-Streaming file source only ever lists whole commits);
    * each micro-batch drains its pending versions OLDEST-FIRST, and
    * `apply(feed, v)` receives version `v`'s row-level changes
    * through [[readChangeFeed]]'s protocol resolution (cdc actions
    * authoritative, add/remove synthesis elsewhere). The stream
    * checkpoint is the cursor; replay safety is the CONSUMER's
    * contract — `apply` must be idempotent per version (stamp the
    * version like [[streamChangeFeedInto]], the
    * Materialized.applyDelta discipline).
    *
    * Runs with `Trigger.AvailableNow` and blocks until every version
    * committed so far is absorbed; re-invoke on a live checkpoint to
    * drain later commits. Cost per drain is bounded by the CHANGED
    * files of the pending versions plus one metadata replay of the
    * log head — never table size. */
  def streamChangeFeed(spark: SparkSession, dir: String,
                       checkpoint: String)
                      (apply: (DataFrame, Long) => Unit): Unit = {
    val log = logDir(dir)
    // heavy work runs on the OUTER session (the stream's cloned
    // session disables AQE); only the version-number collect below
    // touches the clone — the refreshAggStream discipline
    val commits = spark.readStream
      .option("pathGlobFilter", "*.json")
      // FileStreamSource silently ignores files older than
      // maxFileAge (default 7d) relative to the newest seen — a
      // pending commit older than that would be skipped FOREVER (the
      // txn stamp then masks the hole); age-based eviction is wrong
      // for a commit log, so effectively disable it
      .option("maxFileAge", "36500d")
      .text(log.toString)
      // the file-metadata column resolves only on the streaming scan
      // itself — inside foreachBatch the batch is already materialized
      .select(col("_metadata.file_path").as("p"))
    val vRe = """(\d{20})\.json$""".r
    val q = commits.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val versions = batch.distinct()
          .collect().map(_.getString(0))
          .flatMap(p => vRe.findFirstMatchIn(p).map(_.group(1).toLong))
          .sorted
        versions.foreach { v =>
          apply(readChangeFeed(spark, dir, v, Some(v)), v)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private val CdfStreamTxnApp = "graft.cdf.stream"

  /** [[streamChangeFeed]] with the exactly-once consumer built in:
    * append each version's feed rows (table columns +
    * `_change_type`, `_commit_version`) to graft snapshot table
    * `out`, stamping the source delta version as an application
    * transaction ATOMICALLY with the append — a crash or a fresh
    * stream checkpoint replays versions, and every already-absorbed
    * version SKIPS on its stamp instead of double-appending. Rows
    * land without `_commit_timestamp` (wall-clock, not replayable).
    * Returns the highest absorbed delta version (-1 = nothing yet). */
  def streamChangeFeedInto(spark: SparkSession, dir: String,
                           out: String, checkpoint: String): Long = {
    streamChangeFeed(spark, dir, checkpoint) { (feed, v) =>
      val absorbed = LakeWriter.lastTxnVersion(spark, out,
        CdfStreamTxnApp).getOrElse(-1L)
      if (v > absorbed) {
        val rows = feed.drop("_commit_timestamp")
        // an all-rewrite version (compaction) feeds zero rows; the
        // stamp still advances so a replay never re-reads its files
        LakeWriter.commitSnapshot(rows, out,
          mode = if (LakeWriter.snapshotVersions(spark, out).isEmpty)
            "overwrite" else "append",
          txn = Some(CdfStreamTxnApp -> v)): Unit
      }
    }
    LakeWriter.lastTxnVersion(spark, out, CdfStreamTxnApp)
      .getOrElse(-1L)
  }

  // ------------------------------------------------------------------
  // log retention
  // ------------------------------------------------------------------

  /** LOG RETENTION, owning the invariant checkpoints create: delete
    * JSON commits (and superseded older checkpoints) that are
    * strictly covered by a checkpoint AND below the retention floor,
    * never anything a kept version still needs.
    *
    * `retainVersions` = how many of the newest delta versions must
    * stay time-travelable after the call. The floor is
    * `b = tip - retainVersions + 1`; the deletion boundary is the
    * newest complete checkpoint at or below `b` (versions >= b keep
    * resolving through it plus the surviving JSON tail — [[replay]]
    * discovers on-disk checkpoints below `_last_checkpoint` exactly
    * for this). Everything at or below that boundary deletes; the
    * boundary version itself stays resolvable through its checkpoint.
    * Versions below the floor become non-travelable — that is what
    * log retention MEANS — but never silently partial: replay's
    * contiguity check still refuses them loudly.
    *
    * When old JSONs exist below the floor but NO checkpoint sits at
    * or below it (checkpoint cadence coarser than the retention
    * window), a `strict` call REFUSES with the fix spelled out —
    * deleting would strand versions the caller asked to keep, and
    * silently keeping everything would let a streaming log grow
    * unbounded while looking maintained. `strict = false` (the
    * per-micro-batch maintenance path, where a between-checkpoints
    * call is routine) quietly deletes nothing that round.
    *
    * Returns the number of JSON commits deleted. O(log listing) —
    * metadata-only, no data IO, no replay. */
  def cleanupLog(spark: SparkSession, table: String,
                 retainVersions: Int, strict: Boolean = true): Int = {
    require(retainVersions >= 1,
      s"cleanupLog of $table: retainVersions must be >= 1")
    val log = logDir(table)
    val fs = LakeWriter.fsOf(spark, log)
    val jsons = deltaVersions(spark, table)
    val cps = checkpointsOnDisk(fs, log)
    val tip = (jsons ++ cps.keys).maxOption.getOrElse(
      sys.error(s"cleanupLog: empty or missing _delta_log at $table"))
    val b = math.max(0L, tip - retainVersions + 1)
    val boundary = cps.keys.filter(_ <= b).maxOption
    boundary match {
      case None =>
        val stranded = jsons.filter(_ < b)
        if (stranded.nonEmpty && strict) sys.error(
          s"cleanupLog of $table: ${stranded.size} JSON commit(s) sit " +
            s"below the retention floor (version $b) but no checkpoint " +
            "covers them — deleting would strand versions the " +
            s"retainVersions=$retainVersions window keeps. Checkpoint " +
            "at or below the floor first (tighten checkpointEvery, or " +
            "call checkpoint()), or retain fewer versions")
        0
      case Some(cs) =>
        val deletable = jsons.filter(_ <= cs)
        val root = fs.makeQualified(
          new org.apache.hadoop.fs.Path(table)).toString
        deletable.foreach { dv =>
          val cp = new org.apache.hadoop.fs.Path(log, commitName(dv))
          // change-data files ride ONLY this commit's cdc actions —
          // once the JSON goes they are unreachable by any reader, so
          // reclaim them with it (the feed outside the retention
          // window is gone either way; leaving the parquet would just
          // leak delta-sized files forever under a streaming cadence)
          readCommit(fs, cp).foreach { j =>
            str(j \ "cdc" \ "path").foreach { p =>
              if (isAbsolutePath(p))
                fs.delete(new org.apache.hadoop.fs.Path(
                  java.net.URI.create(p.replace(" ", "%20"))),
                  false): Unit
              else {
                // relative cdc files live under the mirror's own
                // per-commit `_change_data/v<dv>-<attempt>/` dir —
                // reclaim the WHOLE dir (hive subdirs included), not
                // just the parquet leaves, or a streaming cadence
                // leaks one empty dir tree per cleaned mixed commit.
                // The dir-wide reclaim applies ONLY to the mirror's
                // own per-commit naming: a FOREIGN CDF table nests
                // cdc files under hive partition dirs shared across
                // commits (_change_data/lang=en/cdc-x.parquet) and
                // recursively deleting that partition dir would
                // destroy cdc files still referenced by SURVIVING
                // commits — those reclaim file-by-file
                val segs = percentDecode(p).split('/')
                val ownCommitDir = """^v\d+-[0-9a-f]{8}$""".r
                val target =
                  if (segs.length >= 2 && segs(0) == "_change_data" &&
                      ownCommitDir.findFirstIn(segs(1)).isDefined)
                    segs.take(2).mkString("/")
                  else percentDecode(p)
                fs.delete(new org.apache.hadoop.fs.Path(
                  s"$root/$target"), true): Unit
              }
            }
          }
          fs.delete(cp, false): Unit
        }
        // checkpoints older than the boundary are superseded artifacts
        // (v2 SIDECARS stay — they may be shared across checkpoints;
        // reclaiming them needs reference counting, i.e. VACUUM's job)
        cps.keys.filter(_ < cs).foreach { cv =>
          val files = cps(cv) match {
            case ClassicCp(parts) if parts <= 1 => Seq(checkpointName(cv))
            case ClassicCp(parts) => (1 to parts).map(i =>
              f"$cv%020d.checkpoint.$i%010d.$parts%010d.parquet")
            case V2Cp(name) => Seq(name)
          }
          files.foreach(n => fs.delete(
            new org.apache.hadoop.fs.Path(log, n), false): Unit)
        }
        deletable.size
    }
  }

  // ------------------------------------------------------------------
  // readDelta (import direction)
  // ------------------------------------------------------------------

  /** Minimal Delta Lake READER — resolve `dir`'s `_delta_log`
    * (checkpoint base + JSON tail, or pure JSON commits) at `version`
    * (default: latest) and read the live files through the log's own
    * schema. Action order within and across commits is honored, so
    * re-added files resolve correctly; an unresolvable history
    * (cleaned-up early commits with no covering checkpoint) refuses
    * loudly instead of returning a partial table. Partition columns
    * materialize from each add action's `partitionValues` — the
    * protocol's authoritative source — so non-hive file layouts
    * (delta-rs, compacted tables) read correctly; the values attach
    * via one broadcast map-side join on `_metadata.file_path`, never
    * a shuffle. Works on any classic- or multi-part-checkpoint/JSON
    * Delta table, not just mirrored ones — the IMPORT direction of
    * the bridge (graft reads a Delta table some other engine wrote,
    * no jars). DELETION VECTORS (default-on in modern Delta writers)
    * resolve natively: each DV-carrying add's roaring bitmap is read
    * and CRC-verified driver-side ([[DeletionVectors]]), rides the
    * same broadcast, and logically-deleted rows filter out by
    * `_metadata.row_index` through a cached-parse native kernel
    * ([[graft.plans.DvContains]]). V2 CHECKPOINTS (UUID-named top
    * file + `_sidecars/` action files, parquet or json top) resolve
    * through the same fold as classic ones. Honors the spec's reader
    * contract: a table requiring reader features beyond
    * columnMapping / timestampNtz / deletionVectors / v2Checkpoint,
    * or id-mode column mapping, REFUSES loudly — serving it anyway
    * would be silently wrong, not merely incomplete. */
  def readDelta(spark: SparkSession, dir: String,
                version: Option[Long] = None): DataFrame =
    readDeltaImpl(spark, dir, version, None)

  /** [[readDelta]] with FILE PRUNING: of the resolved live set, scan
    * only files whose log evidence cannot DISPROVE `predicate` —
    * add.partitionValues are exact per-file stats, add.stats'
    * minValues/maxValues carry range proofs (decoded type-directed:
    * ISO dates/timestamps to the epoch stat space, with a +999 µs
    * guard on timestamp maxima since Delta writers may truncate to
    * milliseconds) and nullCount unlocks IS NULL pruning. The
    * predicate re-applies to surviving rows, so results stay exact
    * whatever the stats coverage (truncated foreign bounds are still
    * valid bounds). The import-direction twin of readSnapshotWhere —
    * a predicate on a foreign Delta table scans a partition, not the
    * lake. */
  def readDeltaWhere(spark: SparkSession, dir: String,
                     predicate: org.apache.spark.sql.Column,
                     version: Option[Long] = None): DataFrame =
    readDeltaImpl(spark, dir, version, Some(predicate)).where(predicate)

  /** Delta stats-JSON value -> the stat-string space GraftDataSkipping
    * evaluates; `maxSide` applies the millisecond-truncation guard on
    * timestamp upper bounds. None = no proof. */
  private def deltaStatString(dt: org.apache.spark.sql.types.DataType,
                              j: JValue,
                              maxSide: Boolean): Option[String] = {
    import org.apache.spark.sql.types._
    def num: Option[String] = j match {
      case JInt(n) => Some(n.toString)
      case JDecimal(d) => Some(d.toString)
      case JDouble(d) if java.lang.Double.isFinite(d) => Some(d.toString)
      case JLong(n) => Some(n.toString)
      case _ => None
    }
    try dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => num
      case StringType => str(j)
      case DateType => str(j).map(s =>
        java.time.LocalDate.parse(s).toEpochDay.toString)
      case TimestampType => str(j).map { s =>
        val us = java.time.OffsetDateTime.parse(s).toInstant match {
          case i => i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        (if (maxSide) us + 999L else us).toString
      }
      case TimestampNTZType => str(j).map { s =>
        val t = java.time.LocalDateTime.parse(s)
        val us = t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000L
        (if (maxSide) us + 999L else us).toString
      }
      case _ => None
    } catch { case _: java.time.format.DateTimeParseException => None }
  }

  private def readDeltaImpl(spark: SparkSession, dir: String,
                            version: Option[Long],
                            pruneWith: Option[org.apache.spark.sql.Column])
      : DataFrame = {
    val (st, _) = replay(spark, dir, version)
    // PROTOCOL CONFORMANCE GATE (the spec's reader contract: a reader
    // that does not implement minReaderVersion / every readerFeature
    // MUST refuse the table). Serving anyway would not be incomplete
    // — it would be silently WRONG: deletion vectors mean live adds
    // carry logically-deleted rows; id-mode column mapping resolves
    // columns by parquet field id, not the physical names this reader
    // matches on.
    val supportedFeatures =
      Set("columnMapping", "timestampNtz", "deletionVectors",
        "v2Checkpoint")
    if (st.protocol._1 >= 3) {
      val unsupported = st.readerFeatures -- supportedFeatures
      require(unsupported.isEmpty,
        s"delta table at $dir requires reader features " +
          s"${unsupported.toSeq.sorted.mkString(", ")} this reader " +
          "does not implement — refusing (serving without them would " +
          "be silently wrong)")
    } else require(st.protocol._1 <= 2,
      s"delta table at $dir requires minReaderVersion " +
        s"${st.protocol._1} — refusing")
    st.metaData.foreach { md =>
      val mode = md \ "configuration" \ "delta.columnMapping.mode"
      str(mode).foreach(m => require(m == "name" || m == "none",
        s"delta table at $dir uses columnMapping.mode=$m — this " +
          "reader resolves mode=name (physical names); id-mode " +
          "tables match by parquet field id and would misresolve"))
    }
    // one PATH must resolve to one live logical file: the spec keys
    // live files on (path, DV uniqueId), so a log can in principle
    // hold two DV generations of one file live at once — scanning
    // that file twice would double its rows; refuse the ambiguity
    st.live.keys.groupBy(_._1).find(_._2.size > 1).foreach { case (p, _) =>
      sys.error(s"delta table at $dir: file $p is live under more than " +
        "one deletion-vector generation — the log never retired the " +
        "older pairing; refusing to double-serve its rows")
    }
    val log = logDir(dir)
    val fs = LakeWriter.fsOf(spark, log)
    val root = fs.makeQualified(
      new org.apache.hadoop.fs.Path(dir)).toString
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(st.schemaJson.getOrElse(
        sys.error(s"no metaData action in $dir's _delta_log")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // COLUMN MAPPING (mode=name): files store PHYSICAL names — read
    // under them, then rename to the logical schema. Identity when no
    // field carries the physicalName key (plain tables).
    val physOf: Map[String, String] = schema.fields.map { f =>
      f.name -> (if (f.metadata.contains("delta.columnMapping.physicalName"))
        f.metadata.getString("delta.columnMapping.physicalName")
      else f.name)
    }.toMap
    val partSet = st.partCols.toSet
    // data files do NOT store partition columns — those materialize
    // from the log's partitionValues below
    val readSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(f => partSet(f.name)).map(f =>
        f.copy(name = physOf(f.name),
          metadata = org.apache.spark.sql.types.Metadata.empty)))
    def absOf(p: String): String = {
      val d = percentDecode(p)
      if (isAbsolutePath(d)) d else s"$root/$d"
    }
    // FILE PRUNING (readDeltaWhere): keep only files whose log
    // evidence cannot disprove the predicate — the shared
    // GraftDataSkipping evaluator over add.partitionValues (exact
    // stats), add.stats min/max (type-decoded) and nullCount. Stats
    // and partitionValues key by PHYSICAL name under column mapping;
    // the predicate speaks logical names — translate first.
    val logicalOf: Map[String, String] = physOf.map(_.swap)
    val keepFile: ((String, String)) => Boolean = pruneWith match {
      case None => _ => true
      case Some(pred) =>
        val typesByName = schema.fields.map(f => f.name -> f.dataType).toMap
        key => {
          val info = st.live(key)
          val statsJ = info.stats.map(JsonMethods.parse(_))
          def statMap(field: String, maxSide: Boolean)
              : Map[String, String] =
            statsJ.map(_ \ field match {
              case JObject(fields) => fields.flatMap { case (pc, v) =>
                val c = logicalOf.getOrElse(pc, pc)
                typesByName.get(c)
                  .flatMap(deltaStatString(_, v, maxSide)).map(c -> _)
              }.toMap
              case _ => Map.empty[String, String]
            }).getOrElse(Map.empty)
          val mins = statMap("minValues", maxSide = false)
          val maxs = statMap("maxValues", maxSide = true)
          val minmax = (mins.keySet & maxs.keySet)
            .map(c => c -> (mins(c), maxs(c))).toMap
          val rows = statsJ.flatMap(s => s \ "numRecords" match {
            case JInt(n) => Some(n.toLong)
            case JLong(n) => Some(n)
            case _ => None
          })
          val statNulls: Map[String, Long] =
            statsJ.map(_ \ "nullCount" match {
              case JObject(fields) => fields.flatMap { case (pc, v) =>
                val c = logicalOf.getOrElse(pc, pc)
                v match {
                  case JInt(n) if typesByName.contains(c) =>
                    Some(c -> n.toLong)
                  case _ => None
                }
              }.toMap
              case _ => Map.empty[String, Long]
            }).getOrElse(Map.empty)
          // a partition value is an exact stat: min == max == value
          // (converted to the epoch stat space for temporal types);
          // a null value proves the column all-NULL for the file
          import org.apache.spark.sql.types._
          val pstats = info.partitionValues.flatMap { case (pc, ov) =>
            val c = logicalOf.getOrElse(pc, pc)
            (ov, typesByName.get(c)) match {
              case (Some(v), Some(dt)) =>
                val s = dt match {
                  case ByteType | ShortType | IntegerType | LongType |
                       StringType => Some(v)
                  case DateType => scala.util.Try(
                    java.time.LocalDate.parse(v).toEpochDay.toString)
                    .toOption
                  case _ => None
                }
                s.map(x => c -> (x, x))
              case _ => None
            }
          }.toMap
          val pnulls = info.partitionValues.flatMap { case (pc, ov) =>
            val c = logicalOf.getOrElse(pc, pc)
            if (ov.isEmpty) rows.map(c -> _) else Some(c -> 0L)
          }.toMap
          org.apache.spark.sql.GraftDataSkipping.mayMatchColumn(
            pred, minmax ++ pstats, typesByName,
            statNulls ++ pnulls, rows)
        }
    }
    val liveKeys = st.live.keys.filter(keepFile).toSeq
    if (liveKeys.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val liveSeq: Seq[(String, String, AddInfo)] =
      liveKeys.map(k => (k._1, k._2, st.live(k)))
    val files = liveSeq.map(t => absOf(t._1))
    // DELETION VECTORS: resolve every live file's bitmap DRIVER-SIDE
    // (metadata-plane — each is O(deleted rows) compressed, read once
    // per resolution, CRC-verified; a corrupt or miscounted DV refuses
    // HERE, before any scan starts). The bytes ride to executors on
    // the same broadcast join that attaches partition values; the
    // scan-side membership test is the cached-parse DvContains kernel
    // over `_metadata.row_index`.
    val anyDv = liveSeq.exists(_._3.dv.nonEmpty)
    val dvBytes: Map[String, Array[Byte]] =
      if (!anyDv) Map.empty
      else liveSeq.flatMap { case (p, _, info) =>
        info.dv.map { d =>
          val bytes = DeletionVectors.readBitmapBytes(fs, root, d)
          val parsed = DeletionVectors.RoaringArray.deserialize(bytes)
          require(parsed.cardinality == d.cardinality,
            s"delta table at $dir: deletion vector of $p holds " +
              s"${parsed.cardinality} rows but its descriptor declares " +
              s"cardinality ${d.cardinality} — corrupt metadata, refusing")
          p -> bytes
        }
      }.toMap
    val base = spark.read.schema(readSchema).parquet(files: _*)
    if (st.partCols.isEmpty && !anyDv)
      base.select(schema.fields.map(f =>
        col(physOf(f.name)).as(f.name)).toIndexedSeq: _*)
    else {
      // one row per live file: (url-encoded URI key, partition
      // values). The key must be BIT-IDENTICAL to Spark's
      // `_metadata.file_path`, which carries the url-ENCODED
      // single-slash URI form ("file:/dir/a%20b.parquet" for a file
      // named "a b.parquet") — NOT Path.toString (raw space) and NOT
      // Path.toUri.toString (triple-slash). Rebuilding it through
      // java.net.URI's quoting from the raw qualified path matches
      // byte-for-byte (probe-pinned: space -> %20, '+' stays '+').
      // A raw-string key silently dropped every row of a
      // space-carrying file via the inner join; the join is now LEFT
      // with a per-row raise on unmatched files, so an encoding
      // regression is loud, never a partial table. Under
      // columnMapping the log keys partitionValues by PHYSICAL name;
      // plain tables by the column name — both resolve.
      val hconf = spark.sessionState.newHadoopConf()
      val pvRows: Seq[Row] = liveSeq.map { case (p, uid, info) =>
        val abs = new org.apache.hadoop.fs.Path(absOf(p))
        val q = abs.getFileSystem(hconf).makeQualified(abs).toUri
        val key = new java.net.URI(q.getScheme, q.getAuthority,
          q.getPath, null, null).toString
        val vals = st.partCols.map { c =>
          val pn = physOf.getOrElse(c, c)
          info.partitionValues.collectFirst {
            case (k, ov) if k == pn || k == c => ov }.flatten.orNull
        }
        // the DvContains cache key carries the DV GENERATION (the
        // spec's uniqueId), not just the file: an executor thread's
        // interpreted-mode cache outlives a query, and the same file
        // read at another version carries another bitmap — a
        // file-only key would silently serve the first parse
        val dvKey = info.dv.map(_ => key + "\u0000" + uid).orNull
        Row.fromSeq((key +: vals) ++
          Seq(dvBytes.get(p).orNull, dvKey, java.lang.Boolean.TRUE))
      }
      import scala.jdk.CollectionConverters._
      val pvSchema = org.apache.spark.sql.types.StructType(
        (org.apache.spark.sql.types.StructField("__graft_file",
          org.apache.spark.sql.types.StringType, false) +:
          st.partCols.map(c => org.apache.spark.sql.types.StructField(
            s"__graft_pv_$c", org.apache.spark.sql.types.StringType,
            true))) ++ Seq(
          org.apache.spark.sql.types.StructField("__graft_dv",
            org.apache.spark.sql.types.BinaryType, true),
          org.apache.spark.sql.types.StructField("__graft_dvkey",
            org.apache.spark.sql.types.StringType, true),
          org.apache.spark.sql.types.StructField("__graft_matched",
            org.apache.spark.sql.types.BooleanType, true)))
      val pvDf = spark.createDataFrame(pvRows.asJava, pvSchema)
      val guard = col("__graft_matched").isNotNull
      // keep-predicate runs as a FILTER below the projection: an
      // unmatched file raises (an encoding regression must be loud —
      // with DVs it would otherwise silently serve deleted rows);
      // a matched file keeps the row unless its DV marks the row index
      val keep =
        if (!anyDv) lit(true)
        else col("__graft_dv").isNull ||
          !org.apache.spark.sql.GraftColumnBridge.column(
            graft.plans.DvContains(
              org.apache.spark.sql.GraftColumnBridge.expression(
                col("__graft_dvkey")),
              org.apache.spark.sql.GraftColumnBridge.expression(
                col("__graft_dv")),
              org.apache.spark.sql.GraftColumnBridge.expression(
                col("__graft_ridx"))))
      val keyed = base.withColumn("__graft_file", col("_metadata.file_path"))
      val withIdx =
        if (anyDv) keyed.withColumn("__graft_ridx",
          col("_metadata.row_index"))
        else keyed
      withIdx
        .join(broadcast(pvDf), Seq("__graft_file"), "left")
        .where(when(guard, keep).otherwise(raise_error(concat(
          lit(s"readDelta at $dir: data file "), col("__graft_file"),
          lit(" failed to match its log entry (path-encoding " +
            "regression)"))).cast("boolean")))
        .select(schema.fields.map { f =>
          if (partSet(f.name))
            col(s"__graft_pv_${f.name}").cast(f.dataType).as(f.name)
          else col(physOf(f.name)).as(f.name)
        }.toIndexedSeq: _*)
    }
  }
}
