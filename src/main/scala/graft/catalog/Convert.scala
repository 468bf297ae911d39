package graft.catalog

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** In-place Delta→Iceberg METADATA conversion (the "UniForm" idea): write
  * Iceberg `metadata/` next to an existing `_delta_log/`, referencing the
  * SAME parquet data files — zero data movement, O(live files) driver
  * work. Afterwards the one table root attaches as EITHER format; re-run
  * after further Delta commits and a new Iceberg snapshot re-syncs the
  * live-file set (idempotent per Delta version via a snapshot-summary
  * marker). At 100 TB this is the difference between an engine-migration
  * rewrite of the whole corpus and a driver-side metadata emit.
  *
  * Reference surface: the reference reads Delta and Iceberg through
  * separate DuckDB extensions with no conversion path
  * (/root/reference/src/duckdb/delta.rs, iceberg.rs) — this exceeds it.
  *
  * Correctness gates (reject loudly, never misconvert):
  *   - deletion vectors: their dead rows are invisible to an Iceberg
  *     reader (compact first / delete-free tables only);
  *   - column mapping: parquet physical names differ from logical ones,
  *     and id-less files can only resolve by name;
  *   - partition columns must be identity-servable types (int/long/
  *     string/boolean/date) — hive-layout Delta files do NOT contain the
  *     partition columns, so the Iceberg side serves them from the
  *     manifest partition tuple (the spec's identity-transform rule,
  *     which IcebergNative implements for migrated tables);
  *   - an existing `metadata/` not produced by this converter.
  *
  * Each manifest entry carries record_count + Appendix-D bounds read from
  * the data file footers (one driver footer read per live file — the same
  * O(files) cost the original write paid), so plan-time skipping AND
  * metadata-only aggregates work on the converted table immediately. */
object Convert {
  import graft.sources.IcebergNative.IcebergReadException

  private val mapper = new ObjectMapper()

  /** Marker key in the Iceberg snapshot summary recording which Delta
    * version a conversion snapshot mirrors. */
  private[graft] val DeltaVersionKey = "graft-converted-delta-version"

  private def iceType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw IcebergReadException(
      s"convert_to_iceberg: type ${other.simpleString} has no iceberg mapping")
  }

  /** Convert (or re-sync) the Delta table at `path` to Iceberg metadata in
    * the same root. Returns the number of live data files referenced by
    * the new snapshot; -1 if the current Delta version is already
    * converted (no-op). */
  def deltaToIceberg(spark: SparkSession, path: String): Long = {
    val rootPath = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = rootPath.getFileSystem(conf)

    val st = DeltaSink.replayState(spark, rootPath, forbidDv = "convert_to_iceberg")
    if (!st.exists) throw IcebergReadException(
      s"convert_to_iceberg: `$path` has no _delta_log — not a Delta table")
    val schemaJson = st.schemaJson.getOrElse(throw IcebergReadException(
      s"convert_to_iceberg: `$path` log declares no schema"))
    val mapping = st.conf.getOrElse("delta.columnMapping.mode", "none")
    if (mapping != "none") throw IcebergReadException(
      s"convert_to_iceberg: `$path` uses columnMapping mode=$mapping — parquet " +
        "physical names differ from logical names, which an id-less Iceberg " +
        "read cannot resolve; only mode=none tables convert")
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    schema.fields.foreach { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => throw IcebergReadException(
          s"convert_to_iceberg: column `${f.name}` is nested — out of this " +
            "converter's scope (same flat-schema gate as the native writer)")
        case _ => ()
      }
    }
    st.partCols.foreach { c =>
      schema.find(_.name == c).map(_.dataType) match {
        case Some(IntegerType | LongType | StringType | BooleanType | DateType |
                  ShortType | ByteType) => ()
        case Some(other) => throw IcebergReadException(
          s"convert_to_iceberg: partition column `$c` has type ${other.simpleString} — " +
            "identity partition tuples of int/long/string/boolean/date only")
        case None => throw IcebergReadException(
          s"convert_to_iceberg: partition column `$c` is not in the schema")
      }
    }

    // ---- existing iceberg metadata: only our own conversions may re-sync ----
    val metaDir = new Path(rootPath, "metadata")
    val resolved = IcebergSink.resolveCurrent(fs, metaDir)
    var prevVersion = 0L
    var lastSnapshotId = 0L
    var lastSeq = 0L
    var prevSnapshotsJson: Seq[String] = Nil
    var prevSnapshotLog: Seq[(Long, Long)] = Nil
    resolved.foreach { case (v, metaFile) =>
      val meta = {
        val in = fs.open(metaFile)
        try mapper.readTree(in) finally in.close()
      }
      val snaps = meta.path("snapshots").elements().asScala.toSeq
      val converted = snaps.flatMap(s0 =>
        Option(s0.path("summary").path(DeltaVersionKey)).filter(!_.isMissingNode)
          .map(_.asText("-1").toLong))
      if (converted.isEmpty) throw IcebergReadException(
        s"convert_to_iceberg: `$path` already has Iceberg metadata (v$v) that " +
          "this converter did not produce — refusing to overwrite a live table's " +
          "metadata; remove metadata/ or convert into a fresh root")
      if (converted.max >= st.version) return -1L // this Delta version is synced
      prevVersion = v
      lastSnapshotId = snaps.map(_.path("snapshot-id").asLong()).maxOption.getOrElse(0L)
      lastSeq = snaps.map(_.path("sequence-number").asLong(0L)).maxOption.getOrElse(0L)
      prevSnapshotsJson = snaps.map(mapper.writeValueAsString)
      prevSnapshotLog = meta.path("snapshot-log").elements().asScala
        .map(e => (e.path("timestamp-ms").asLong(), e.path("snapshot-id").asLong())).toSeq
    }

    val fieldIds: Seq[(StructField, Int)] =
      schema.fields.toSeq.zipWithIndex.map { case (f, i) => (f, i + 1) }
    val idOf: Map[String, Int] = fieldIds.map { case (f, id) => f.name -> id }.toMap

    // ---- one manifest entry per live Delta file, stats from the footer ----
    def decodePath(p: String): String = {
      // Delta add.path is percent-encoded (the protocol's RFC 2396 note)
      try java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")
      catch { case _: Exception => p }
    }
    final case class Entry(rel: String, size: Long, records: Long,
        tuple: Seq[Any],
        lower: java.util.Map[String, java.nio.ByteBuffer],
        upper: java.util.Map[String, java.nio.ByteBuffer],
        nulls: java.util.Map[String, java.lang.Long])
    def typedTuple(pv: Map[String, String]): Seq[Any] = st.partCols.map { c =>
      pv.get(c).flatMap(Option(_)) match {
        case None => null
        case Some(raw) => schema(c).dataType match {
          case IntegerType | ShortType | ByteType => Int.box(raw.toInt)
          case LongType => Long.box(raw.toLong)
          case BooleanType => Boolean.box(raw.toBoolean)
          case DateType => Int.box(java.time.LocalDate.parse(raw).toEpochDay.toInt)
          case _ => raw
        }
      }
    }
    val entries: Seq[Entry] = st.live.toSeq.map { case (rawPath, e) =>
      val rel = decodePath(rawPath)
      val abs = {
        val p = new Path(rel)
        if (p.isAbsolute) p else new Path(rootPath, p)
      }
      val (records, lb, ub, nvc) = IcebergSink.footerInfo(abs, conf, fieldIds)
      val size = if (e.size >= 12) e.size else fs.getFileStatus(abs).getLen
      Entry(rel, size, records, typedTuple(e.partitionValues), lb, ub, nvc)
    }

    // ---- manifest avro schema (dynamic r102 partition record) ----
    def avroTypeFor(dt: DataType): String = dt match {
      case IntegerType | ShortType | ByteType | DateType => "\"int\""
      case LongType => "\"long\""
      case BooleanType => "\"boolean\""
      case _ => "\"string\""
    }
    val partFieldsJson = st.partCols.map { c =>
      s"""{"name":${mapper.writeValueAsString(c)},"type":["null",${
        avroTypeFor(schema(c).dataType)}],"default":null}"""
    }.mkString(",")
    val partRecJson =
      if (st.partCols.isEmpty) ""
      else s"""{"name":"partition","type":["null",{"type":"record","name":"r102","fields":[$partFieldsJson]}],"default":null},"""
    val dfSch = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"r2","fields":[
        {"name":"content","type":["null","int"],"default":null},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        $partRecJson
        {"name":"record_count","type":"long"},
        {"name":"file_size_in_bytes","type":["null","long"],"default":null},
        {"name":"lower_bounds","type":["null",{"type":"map","values":"bytes"}],"default":null},
        {"name":"upper_bounds","type":["null",{"type":"map","values":"bytes"}],"default":null},
        {"name":"null_value_counts","type":["null",{"type":"map","values":"long"}],"default":null}]}""")
    val eSch = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"sequence_number","type":["null","long"],"default":null},
        {"name":"data_file","type":${dfSch.toString}}]}""")
    val listSch = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"content","type":["null","int"],"default":null},
        {"name":"sequence_number","type":["null","long"],"default":null}]}""")
    val partRecordSchema: Option[org.apache.avro.Schema] =
      if (st.partCols.isEmpty) None
      else Some(dfSch.getField("partition").schema().getTypes.get(1))

    // ---- write manifest + manifest list + metadata.json + hint ----
    val version = prevVersion + 1
    val snapshotId = lastSnapshotId + 1
    val seq = lastSeq + 1
    val nowMs = System.currentTimeMillis()
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    fs.mkdirs(metaDir)
    def writeAvro(rel: String, sch: org.apache.avro.Schema, rows: Seq[GenericRecord]): Unit = {
      val out = fs.create(new Path(rootPath, rel), false)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, out)
      try rows.foreach(w.append) finally w.close()
    }
    val manifestRel = s"metadata/m-$snapshotId-$stamp.avro"
    writeAvro(manifestRel, eSch, entries.map { f =>
      val d = new GenericData.Record(dfSch)
      d.put("content", null)
      d.put("file_path", f.rel)
      d.put("file_format", "PARQUET")
      partRecordSchema.foreach { prs =>
        val pr = new GenericData.Record(prs)
        st.partCols.zip(f.tuple).foreach { case (c, v) => pr.put(c, v) }
        d.put("partition", pr)
      }
      d.put("record_count", f.records)
      d.put("file_size_in_bytes", Long.box(f.size))
      if (!f.lower.isEmpty) d.put("lower_bounds", f.lower)
      if (!f.upper.isEmpty) d.put("upper_bounds", f.upper)
      if (!f.nulls.isEmpty) d.put("null_value_counts", f.nulls)
      val e = new GenericData.Record(eSch)
      e.put("status", 1) // ADDED
      e.put("sequence_number", Long.box(seq))
      e.put("data_file", d)
      e
    })
    // a re-sync snapshot REPLACES the file set: only the new manifest rides
    val mlRel = s"metadata/ml-$snapshotId-$stamp.avro"
    writeAvro(mlRel, listSch, {
      val r = new GenericData.Record(listSch)
      r.put("manifest_path", manifestRel)
      r.put("content", null)
      r.put("sequence_number", Long.box(seq))
      Seq(r)
    })
    val schemaJsonIce: String = {
      val sch = mapper.createObjectNode()
      sch.put("type", "struct"); sch.put("schema-id", 0)
      val arr = sch.putArray("fields")
      fieldIds.foreach { case (f, id) =>
        val fn = arr.addObject()
        fn.put("id", id); fn.put("name", f.name)
        fn.put("required", !f.nullable); fn.put("type", iceType(f.dataType))
      }
      mapper.writeValueAsString(sch)
    }
    val snapshotJson = {
      val sn = mapper.createObjectNode()
      sn.put("snapshot-id", snapshotId)
      if (lastSnapshotId > 0) sn.put("parent-snapshot-id", lastSnapshotId)
      sn.put("sequence-number", seq)
      sn.put("timestamp-ms", nowMs)
      val summary = sn.putObject("summary")
      summary.put("operation", if (prevVersion == 0) "append" else "overwrite")
      summary.put(DeltaVersionKey, st.version.toString)
      sn.put("manifest-list", mlRel)
      mapper.writeValueAsString(sn)
    }
    val logJson = (prevSnapshotLog :+ ((nowMs, snapshotId))).map { case (ts, id) =>
      s"""{"timestamp-ms": $ts, "snapshot-id": $id}"""
    }.mkString("[", ", ", "]")
    val specJson = st.partCols.zipWithIndex.map { case (c, i) =>
      s"""{"name": ${mapper.writeValueAsString(c)}, "transform": "identity", """ +
        s""""source-id": ${idOf(c)}, "field-id": ${1000 + i}}"""
    }.mkString(", ")
    val metaJson =
      s"""{"format-version": 2,
         |"table-uuid": "${java.util.UUID.randomUUID()}",
         |"location": ${mapper.writeValueAsString(path)},
         |"last-updated-ms": $nowMs,
         |"last-column-id": ${fieldIds.map(_._2).maxOption.getOrElse(0)},
         |"last-sequence-number": $seq,
         |"current-schema-id": 0,
         |"schemas": [$schemaJsonIce],
         |"default-spec-id": 0,
         |"partition-specs": [{"spec-id": 0, "fields": [$specJson]}],
         |"current-snapshot-id": $snapshotId,
         |"snapshot-log": $logJson,
         |"snapshots": ${(prevSnapshotsJson :+ snapshotJson).mkString("[", ", ", "]")}}""".stripMargin
    val metaTarget = new Path(metaDir, s"v$version.metadata.json")
    if (fs.exists(metaTarget)) throw IcebergReadException(
      s"convert_to_iceberg: `$path` metadata version $version already exists — " +
        "another writer got there first")
    val out = fs.create(metaTarget, false)
    try out.write(metaJson.getBytes("UTF-8")) finally out.close()
    val hint = new Path(metaDir, "version-hint.text")
    val hintOut = fs.create(hint, true)
    try hintOut.write(version.toString.getBytes("UTF-8")) finally hintOut.close()
    entries.size.toLong
  }
}
