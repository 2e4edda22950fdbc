package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta-Lake-format LIVE MIRROR of a snapshot table — the
  * zero-export-step interop bridge (the reference's lake is Iceberg
  * precisely so external engines read it natively:
  * /root/reference/airflow/dags/spark_code/write_iceberg_sample.py —
  * this is that property rebuilt on Delta's open `_delta_log`
  * protocol, which is plain JSON and needs no jars to write).
  *
  * [[mirror]] writes a spec-conformant `_delta_log/` INSIDE the
  * table directory, one Delta commit per graft snapshot version,
  * each `add`/`remove` referencing the table's OWN parquet files by
  * relative path — zero bytes of data are copied, and after the call
  * the graft table root IS a Delta table: Spark-with-Delta, Trino,
  * DuckDB's delta reader, delta-rs/pandas all read it natively, at
  * whatever version history graft has committed. Incremental by
  * construction: a re-invocation resolves the log's current file
  * set and mirrors only versions committed since (cost is O(delta
  * manifests), never a table scan), so a scheduler can call it after
  * every load. Idempotent: no new graft versions ⇒ no new log
  * entries, byte-identical log.
  *
  * Fidelity contract (spec'd in DeltaMirrorSpec): resolving the
  * mirrored log at Delta version i yields exactly
  * `readSnapshot(table, graft version i+1)` — adds/removes are the
  * manifest file-set diff, `metaData` re-emits on schema or
  * partition-spec change, `partitionValues` derive from the same
  * hive paths graft prunes by.
  *
  * Renamed/dropped columns mirror NATIVELY: graft's column mapping is
  * the same logical->physical indirection as Delta's
  * `columnMapping.mode=name`, so the mirror emits physicalName/id
  * field metadata (+ the protocol upgrade to reader 2 / writer 5 in
  * the commit that first needs it) and conforming readers resolve
  * old and new files alike.
  *
  * Not mirrored (refused loudly, not silently wrong):
  *  - renamed PARTITION columns (graft itself refuses those, so only
  *    a hand-built manifest could hit this);
  *  - mixed partition layouts mid-evolution (a pre-spec file has no
  *    path-derived partition values — run `migratePartitionSpec`
  *    first);
  *  - partition values containing characters hive escapes as %XX
  *    (a Delta reader URL-decodes `add.path`, diverging from the
  *    on-disk name).
  *
  * Scale shape at 100 TB: mirroring is pure METADATA — per new
  * version, one manifest parse, one file-status sweep over the
  * version's NEW files on a bounded pool (sizes/mtimes; row counts
  * ride the manifest's existing footer stats), one small JSON write.
  * The data plane is untouched.
  */
object DeltaMirror {

  private def logDir(table: String) =
    new org.apache.hadoop.fs.Path(table, "_delta_log")

  private def commitName(v: Long): String = f"$v%020d.json"

  /** Delta versions already present in the log, ascending. */
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
    *        (the log's own cursor governs). */
  def mirror(spark: SparkSession, table: String,
             fromVersion: Option[Long] = None): Long = {
    val versions = LakeWriter.snapshotVersions(spark, table)
    require(versions.nonEmpty, s"no snapshot history at $table")
    val dir = logDir(table)
    val fs = LakeWriter.fsOf(spark, dir)
    val root = fs.makeQualified(
      new org.apache.hadoop.fs.Path(table)).toString
    val existing = deltaVersions(spark, table)
    require(existing == existing.indices.map(_.toLong),
      s"delta mirror of $table: log has gaps (${existing.mkString(",")})")

    def relOf(f: String): String = {
      require(f.startsWith(root + "/"),
        s"delta mirror of $table: file outside the table root ($f) — " +
          "clone-/convert-referenced foreign files need absolute-path " +
          "adds (not emitted; compact the table first to localize files)")
      f.stripPrefix(root + "/")
    }

    // current live set + cursor + governing metaData per the LOG
    // (self-contained resume: correct even if previously-mirrored
    // graft versions were since vacuumed)
    val live = scala.collection.mutable.LinkedHashSet[String]()
    var prevSchemaJson: Option[String] = None
    var prevPartCols: Option[Seq[String]] = None
    var lastMirrored: Option[Long] = None
    existing.foreach { dv =>
      readCommit(fs, new org.apache.hadoop.fs.Path(dir, commitName(dv)))
        .foreach { j =>
          str(j \ "add" \ "path").foreach(live += _)
          str(j \ "remove" \ "path").foreach(live -= _)
          str(j \ "metaData" \ "schemaString").foreach { s =>
            prevSchemaJson = Some(s)
            prevPartCols = Some((j \ "metaData" \ "partitionColumns") match {
              case JArray(xs) => xs.flatMap(str)
              case _ => List.empty[String]
            })
          }
          (j \ "commitInfo" \ "graftVersion") match {
            case JInt(g) => lastMirrored = Some(g.toLong)
            case _ =>
          }
        }
    }
    require(existing.isEmpty || lastMirrored.nonEmpty,
      s"delta mirror of $table: existing _delta_log carries no " +
        "graftVersion cursor — not a graft mirror; refusing to extend")
    // COLUMN MAPPING state (Delta columnMapping.mode=name — the same
    // logical->physical indirection as graft's colmap, so renames and
    // drops mirror natively): stable per-PHYSICAL-name column ids,
    // seeded from the last mirrored metaData so resume keeps them
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
    var cmOn = colIds.nonEmpty
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
    // wedge the resume cursor behind a partially-mirrored prefix
    val planned = scala.collection.mutable.ListBuffer[(Int, String)]()
    todo.zipWithIndex.foreach { case (gv, i) =>
      val dv = existing.size + i
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
          val id = colIds.getOrElseUpdate(phys,
            colIds.values.maxOption.getOrElse(0) + 1)
          f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong("delta.columnMapping.id", id.toLong)
              .putString("delta.columnMapping.physicalName", phys)
              .build())
        }).json
      val ts = tsByVersion.getOrElse(gv, System.currentTimeMillis())
      val rels = files.map(relOf)
      val adds = rels.filterNot(live.contains)
      val removes = live.toSeq.filterNot(rels.toSet.contains)
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
      // sizes/mtimes: bounded-parallel metadata fetches, new files only
      val meta: Map[String, (Long, Long)] =
        if (adds.isEmpty) Map.empty
        else {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(16, adds.size))
          try adds.map { r =>
            r -> pool.submit(
              new java.util.concurrent.Callable[(Long, Long)] {
                def call(): (Long, Long) = {
                  val st = fs.getFileStatus(
                    new org.apache.hadoop.fs.Path(s"$root/$r"))
                  (st.getLen, st.getModificationTime)
                }
              })
          }.map { case (r, fut) => r -> fut.get() }.toMap
          finally pool.shutdown()
        }
      def partValuesJson(rel: String): JObject = {
        if (partCols.isEmpty) JObject(List.empty)
        else partValuesOf(partCols, rel) match {
          case None => sys.error(
            s"delta mirror of $table: $rel predates the " +
              s"${partCols.mkString(",")} partition spec — run " +
              "migratePartitionSpec before mirroring")
          case Some(raw) =>
            JObject(partCols.zip(raw).map { case (c, v) =>
              require(!v.contains("%"),
                s"delta mirror of $table: partition value '$v' " +
                  "carries hive %XX escapes — a Delta reader " +
                  "URL-decodes add.path and would resolve a " +
                  "different file name")
              val dec = percentDecode(v)
              c -> (if (dec == "__HIVE_DEFAULT_PARTITION__") JNull
                    else JString(dec): JValue)
            }.toList)
        }
      }
      val actions = scala.collection.mutable.ListBuffer[JValue]()
      actions += JObject(List("commitInfo" -> JObject(List(
        "timestamp" -> JInt(BigInt(ts)),
        "operation" -> JString(if (dv == 0) "WRITE" else "MERGE"),
        "operationParameters" -> JObject(List.empty),
        "engineInfo" -> JString("graft-snapshot-mirror"),
        "graftVersion" -> JInt(BigInt(gv))))))
      // protocol: (1,2) plain; (2,5) when column mapping is on — and
      // a mid-history rename/drop emits the protocol UPGRADE action
      // in its own commit, as a Delta writer enabling a feature does
      if (dv == 0)
        actions += JObject(List("protocol" -> JObject(List(
          "minReaderVersion" -> JInt(if (needCm) 2 else 1),
          "minWriterVersion" -> JInt(if (needCm) 5 else 2)))))
      else if (needCm && !cmOn)
        actions += JObject(List("protocol" -> JObject(List(
          "minReaderVersion" -> JInt(2), "minWriterVersion" -> JInt(5)))))
      cmOn = cmOn || needCm
      if (!prevSchemaJson.contains(schemaJson) ||
          !prevPartCols.contains(partCols)) {
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
          "configuration" -> (if (needCm) JObject(List(
            "delta.columnMapping.mode" -> JString("name"),
            "delta.columnMapping.maxColumnId" -> JString(
              colIds.values.maxOption.getOrElse(0).toString)))
          else JObject(List.empty)),
          "createdTime" -> JInt(BigInt(ts))))))
        prevSchemaJson = Some(schemaJson); prevPartCols = Some(partCols)
      }
      removes.foreach { r =>
        actions += JObject(List("remove" -> JObject(List(
          "path" -> JString(r),
          "deletionTimestamp" -> JInt(BigInt(ts)),
          "dataChange" -> JBool(true)))))
      }
      adds.foreach { r =>
        val (len, mtime) = meta(r)
        val nRecords = stats.get(r.split('/').last).flatMap(_.rows)
        actions += JObject(List("add" -> JObject(List(
          "path" -> JString(r),
          "partitionValues" -> partValuesJson(r),
          "size" -> JInt(BigInt(len)),
          "modificationTime" -> JInt(BigInt(mtime)),
          "dataChange" -> JBool(true)) ++
          nRecords.map(n => "stats" -> (JString(
            s"""{"numRecords":$n}"""): JValue)).toList)))
      }
      val body = actions
        .map(j => JsonMethods.compact(JsonMethods.render(j)))
        .mkString("", "\n", "\n")
      planned += (dv -> body)
      rels.foreach(live += _)
      live.filterInPlace(rels.toSet.contains)
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
    todo.size.toLong
  }

  /** Minimal Delta Lake READER — resolve `dir`'s `_delta_log` (JSON
    * commits; checkpoints not needed for graft-mirrored logs) at
    * `version` (default: latest) and read the live files through the
    * log's own schema. Action order within and across commits is
    * honored, so re-added files resolve correctly. Works on any
    * JSON-commit Delta table, not just mirrored ones — the IMPORT
    * direction of the bridge (graft reads a Delta table some other
    * engine wrote, no jars). */
  def readDelta(spark: SparkSession, dir: String,
                version: Option[Long] = None): DataFrame = {
    val log = logDir(dir)
    val fs = LakeWriter.fsOf(spark, log)
    require(fs.exists(log), s"no _delta_log at $dir")
    val all = deltaVersions(spark, dir)
    require(all.nonEmpty, s"empty _delta_log at $dir")
    val v = version.getOrElse(all.last)
    require(all.contains(v), s"no delta version $v at $dir (have $all)")
    val root = fs.makeQualified(
      new org.apache.hadoop.fs.Path(dir)).toString
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Seq.empty
    val live = scala.collection.mutable.LinkedHashSet[String]()
    all.filter(_ <= v).foreach { dv =>
      readCommit(fs, new org.apache.hadoop.fs.Path(log, commitName(dv)))
        .foreach { j =>
          str(j \ "metaData" \ "schemaString").foreach { s =>
            schemaJson = Some(s)
            partCols = (j \ "metaData" \ "partitionColumns") match {
              case JArray(xs) => xs.flatMap(str)
              case _ => Seq.empty
            }
          }
          str(j \ "add" \ "path").foreach(live += _)
          str(j \ "remove" \ "path").foreach(live -= _)
        }
    }
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(schemaJson.getOrElse(
        sys.error(s"no metaData action in $dir's _delta_log")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // COLUMN MAPPING (mode=name): files store PHYSICAL names — read
    // under them, then rename to the logical schema. Identity when no
    // field carries the physicalName key (plain tables).
    val physNames = schema.fields.map { f =>
      if (f.metadata.contains("delta.columnMapping.physicalName"))
        f.metadata.getString("delta.columnMapping.physicalName")
      else f.name
    }.toSeq
    val readSchema = org.apache.spark.sql.types.StructType(
      schema.fields.zip(physNames).map { case (f, p) =>
        f.copy(name = p,
          metadata = org.apache.spark.sql.types.Metadata.empty) })
    val toLogical = physNames.zip(schema.fieldNames).map { case (p, l) =>
      org.apache.spark.sql.functions.col(p).as(l) }.toIndexedSeq
    val files = live.toSeq.map { p =>
      val d = percentDecode(p)
      if (d.contains("://") || d.startsWith("/")) d else s"$root/$d"
    }
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (partCols.isEmpty)
      spark.read.schema(readSchema).parquet(files: _*).select(toLogical: _*)
    else {
      // user schema + basePath per HIVE BASE (the directory above the
      // first `col=` segment): partition columns recover from the
      // dirs and cast to the schema's types, and grouping avoids
      // Spark's conflicting-directory refusal when live files span
      // several version directories (the readSnapshot discipline).
      // Partition columns are identity-mapped (the mirror refuses
      // renamed partition columns), so dir names match readSchema.
      val groups = files.groupBy { f =>
        val i = f.indexOf("/" + partCols.head + "=")
        if (i >= 0) f.substring(0, i)
        else new org.apache.hadoop.fs.Path(f).getParent.toString
      }
      groups.map { case (base, fs0) =>
        spark.read.option("basePath", base)
          .schema(readSchema).parquet(fs0: _*).select(toLogical: _*)
      }.reduce(_.unionByName(_))
    }
  }
}
