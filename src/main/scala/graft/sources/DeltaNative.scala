package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, element_at, regexp_replace}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType, StructField, StructType, TimestampType}

/** Minimal native Delta Lake reader — no connector jar required.
  *
  * The reference reads Delta through DuckDB's delta extension
  * (src/fdw/delta.rs:1-149, src/duckdb/delta.rs:41-61: `delta_scan(path)` of
  * the table root, latest snapshot, no options). The equivalent here is
  * built from the PUBLIC Delta transaction-log protocol
  * (delta.io PROTOCOL.md): a Delta table is parquet data files plus a
  * `_delta_log/` of ordered JSON commits (one action per line: `protocol`,
  * `metaData`, `add`, `remove`) with periodic parquet checkpoints named by
  * `_last_checkpoint`. Snapshot = checkpoint's live `add` set, then replay
  * of later commits (add inserts by path, remove tombstones by path).
  *
  * Spark-first split of labor: log resolution is bounded METADATA work
  * (exactly what delta-kernel does on the driver — checkpoints keep the
  * replayed tail short at any table size), while all DATA stays in a
  * distributed `spark.read.parquet` over the resolved live files.
  * Driver-side state is one (path, partitionValues) entry per live file,
  * read from checkpoints as TYPED Rows (no JSON text round-trip) — the
  * same O(live files) footprint delta-kernel carries.
  * `schemaString` is Spark schema JSON verbatim (Delta's own format), so
  * types round-trip exactly.
  *
  * Supported: reader protocol v1 (plain parquet files), v2 column mapping
  * (mode = name/id: physical-name indirection from the same PROTOCOL.md —
  * data files carry physical names, the reader maps them back to logical),
  * v3 when its readerFeatures need nothing beyond columnMapping/
  * timestampNtz/deletionVectors/v2Checkpoint, DELETION VECTORS (inline,
  * relative-uuid and absolute-path storage — decoded in executors and
  * anti-joined away on `(_metadata.file_path, _metadata.row_index)`, see
  * DeletionVectors), multi-commit replay, single + multi-part + V2
  * (UUID-named manifest + `_sidecars/` files, json or parquet) checkpoints,
  * partitioned tables (hive-style layouts read with basePath + explicit
  * schema; non-hive layouts attach partition values from the log through a
  * broadcast file-path lookup — ONE scan, plan size O(1) in partition
  * count). NOT supported — rejected loudly, never silently misread: any
  * other reader feature outside that set.
  */
object DeltaNative {

  final case class DeltaReadException(msg: String) extends IllegalArgumentException(msg)

  private val mapper = new ObjectMapper()

  private[sources] val PhysNameKey = "delta.columnMapping.physicalName"
  private val SupportedReaderFeatures =
    Set("columnMapping", "timestampNtz", "deletionVectors", "v2Checkpoint")

  /** Live-file entry after log reconciliation. `size`/`modificationTime`
    * come from the add action (the protocol requires them accurate — split
    * planning trusts them, exactly as delta-kernel does); `stats` is the
    * writer's per-file statistics JSON, fuel for planning-time skipping. */
  private final case class AddEntry(partitionValues: Map[String, String],
      dv: Option[DeletionVectors.Descriptor], size: Long = 0L,
      modificationTime: Long = 0L, stats: Option[String] = None,
      addVersion: Long = 0L,
      // PROTOCOL.md Row Tracking: default row ids are baseRowId + row
      // position, defaulting commit version to the add's commit — fuel for
      // the `row_tracking=true` read option
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  /** Table-history introspection (`delta_history('<root>')`): one row per
    * commit JSON in the log — version, resolved timestamp (the time-travel
    * order: inCommitTimestamp > commitInfo.timestamp > file mtime),
    * operation + parameters from commitInfo, and action counts. Bounded
    * driver metadata work, O(commits); the frame is history-sized. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.Row
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(rootPath, "_delta_log")
    if (!fs.exists(logDir))
      throw DeltaReadException(s"`$root` is not a Delta table: no _delta_log directory")
    val commitRe = """(\d{20})\.json""".r
    val commits = fs.listStatus(logDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case commitRe(v) => Some((v.toLong, st))
        case _ => None
      })
      .sortBy(_._1)
    if (commits.isEmpty) throw DeltaReadException(
      s"`$root`: _delta_log holds no commit JSON files (checkpoint-only logs " +
        "carry no per-commit history)")
    val rows = commits.map { case (v, st) =>
      val in = fs.open(st.getPath)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
      val nodes = lines.filter(_.nonEmpty).map(mapper.readTree)
      val ci = nodes.collectFirst { case n if n.has("commitInfo") => n.path("commitInfo") }
      val ts = ci.map { c =>
        if (c.has("inCommitTimestamp")) c.path("inCommitTimestamp").asLong()
        else if (c.has("timestamp")) c.path("timestamp").asLong()
        else st.getModificationTime
      }.getOrElse(st.getModificationTime)
      Row(v,
        new java.sql.Timestamp(ts),
        ci.filter(_.has("operation")).map(_.path("operation").asText()).orNull,
        ci.filter(_.has("operationParameters"))
          .map(_.path("operationParameters").toString).orNull,
        nodes.count(_.has("add")).toLong,
        nodes.count(_.has("remove")).toLong,
        nodes.count(_.has("cdc")).toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("operation", StringType),
      StructField("operation_parameters", StringType),
      StructField("num_added_files", LongType, nullable = false),
      StructField("num_removed_files", LongType, nullable = false),
      StructField("num_cdc_files", LongType, nullable = false))))
  }

  def read(spark: SparkSession, root: String, options: Map[String, String]): DataFrame = {
    // CHANGE DATA FEED dispatch: `read_change_feed=true` switches from
    // snapshot semantics to the row-level change history (DeltaChanges)
    if (options.get("read_change_feed").exists(_.toBoolean))
      return DeltaChanges.read(spark, root, options)
    Seq("starting_version", "ending_version").foreach { o =>
      if (options.contains(o)) throw DeltaReadException(
        s"$o applies to change-feed reads only; pass read_change_feed=true")
    }
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(rootPath, "_delta_log")
    if (!fs.exists(logDir))
      throw DeltaReadException(s"`$root` is not a Delta table: no _delta_log directory")

    // --- resolve the snapshot from the log (driver-side metadata work) ---
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Nil
    var tableConf: Map[String, String] = Map.empty
    // protocol demands are VALIDATED AFTER replay: whether reader v2/v3 is
    // satisfiable depends on metaData.configuration (column mapping mode),
    // and the actions may arrive in either order within the log
    var readerVersion = 1
    var readerFeatures: Set[String] = Set.empty
    // reconciliation key per PROTOCOL.md: (path, deletion-vector unique id)
    // — a DV update commits remove(path, oldDv) + add(path, newDv), so path
    // alone would let the remove kill the fresh add
    val adds = scala.collection.mutable.LinkedHashMap[(String, String), AddEntry]()
    def dvKey(dv: Option[DeletionVectors.Descriptor]): String =
      dv.map(_.uniqueKey).getOrElse("")

    def applyProtocolJson(p: JsonNode): Unit = {
      readerVersion = math.max(readerVersion, p.path("minReaderVersion").asInt(1))
      if (p.has("readerFeatures"))
        readerFeatures ++= p.path("readerFeatures").elements().asScala.map(_.asText())
    }
    def applyMetaJson(m: JsonNode): Unit = {
      schemaJson = Some(m.path("schemaString").asText())
      partCols = m.path("partitionColumns").elements().asScala.map(_.asText()).toSeq
      if (m.has("configuration"))
        tableConf = m.path("configuration").fields().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
    }
    def partValuesJson(a: JsonNode): Map[String, String] =
      a.path("partitionValues").fields().asScala
        .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap
    def addEntryJson(a: JsonNode, dv: Option[DeletionVectors.Descriptor],
        version: Long): AddEntry = {
      def optLong(k: String): Option[Long] = {
        val n = a.path(k)
        if (n.isNumber) Some(n.asLong()) else None
      }
      AddEntry(partValuesJson(a), dv,
        a.path("size").asLong(0L),
        a.path("modificationTime").asLong(0L),
        Option(a.path("stats")).filter(n => n.isTextual && n.asText().nonEmpty)
          .map(_.asText()),
        addVersion = version,
        baseRowId = optLong("baseRowId"),
        defaultRowCommitVersion = optLong("defaultRowCommitVersion"))
    }
    def dvJson(a: JsonNode): Option[DeletionVectors.Descriptor] = {
      val d = a.path("deletionVector")
      if (d.isMissingNode || d.isNull) None
      else Some(DeletionVectors.Descriptor(
        d.path("storageType").asText(),
        d.path("pathOrInlineDv").asText(),
        Option(d.path("offset")).filter(n => !n.isMissingNode && !n.isNull).map(_.asInt()),
        d.path("sizeInBytes").asInt(),
        d.path("cardinality").asLong()))
    }

    // all commit JSON files present in the log, version-ordered (statuses
    // kept: modification time is the timestamp fallback for time travel)
    val commitRe = """(\d{20})\.json""".r
    val allCommitStatuses = fs.listStatus(logDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case commitRe(v) => Some((v.toLong, st))
        case _ => None
      })
      .sortBy(_._1)

    // TIME TRAVEL: `version_as_of` pins the replay at that commit version;
    // `timestamp_as_of` resolves an instant to the last commit at or before
    // it via commitInfo timestamps (protocol order: inCommitTimestamp >
    // commitInfo.timestamp > log-file modification time, monotonized per
    // the protocol's clock-skew note). A checkpoint NEWER than the pin
    // cannot be used (it already folded later commits), so the replay falls
    // back to commits from 0 — and errors loudly if those were vacuumed.
    val versionPin: Option[Long] = options.get("version_as_of").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException =>
          throw DeltaReadException(s"version_as_of `$v` is not a number")
      }
      if (n < 0) throw DeltaReadException(s"version_as_of $n is negative")
      n
    }
    val tsPin: Option[Long] = options.get("timestamp_as_of").map { v =>
      try TimeTravel.parseMillis("timestamp_as_of", v)
      catch { case e: IllegalArgumentException => throw DeltaReadException(e.getMessage) }
    }
    if (versionPin.isDefined && tsPin.isDefined) throw DeltaReadException(
      "version_as_of and timestamp_as_of are mutually exclusive; pass one")
    // INCREMENTAL READ: `changes_since = N` keeps only rows from files
    // committed AFTER version N that are still live at the read's end
    // version (current, or the time-travel pin) — the add-file diff an
    // incremental ingestion pipeline polls for. Granularity is the log's
    // own dataChange unit (whole files): an update/merge surfaces as its
    // rewritten files, not row-level CDC.
    val changesSince: Option[Long] = options.get("changes_since").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException =>
          throw DeltaReadException(s"changes_since `$v` is not a number")
      }
      if (n < 0) throw DeltaReadException(s"changes_since $n is negative")
      n
    }
    def commitTimestamp(st: org.apache.hadoop.fs.FileStatus): Long = {
      val in = fs.open(st.getPath)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
      lines.iterator.filter(_.nonEmpty).map(mapper.readTree)
        .collectFirst { case n if n.has("commitInfo") => n.path("commitInfo") }
        .map { ci =>
          if (ci.has("inCommitTimestamp")) ci.path("inCommitTimestamp").asLong()
          else if (ci.has("timestamp")) ci.path("timestamp").asLong()
          else st.getModificationTime
        }
        .getOrElse(st.getModificationTime)
    }
    val asOf: Option[Long] = versionPin.orElse(tsPin.map { target =>
      if (allCommitStatuses.isEmpty) throw DeltaReadException(
        s"`$root`: timestamp_as_of needs commit files in _delta_log, none found")
      val history = allCommitStatuses.map { case (v, st) => (v, commitTimestamp(st)) }
      try TimeTravel.resolve(history, target, "timestamp_as_of", "commit")
      catch {
        case e: IllegalArgumentException => throw DeltaReadException(s"`$root`: ${e.getMessage}")
      }
    })

    // checkpoint, if any (skipped when it post-dates the time-travel pin)
    val lastCp = Option(fs.exists(new Path(logDir, "_last_checkpoint")))
      .filter(identity)
      .map { _ =>
        val in = fs.open(new Path(logDir, "_last_checkpoint"))
        val node = try mapper.readTree(in) finally in.close()
        (node.path("version").asLong(), Option(node.path("parts")).filter(!_.isMissingNode).map(_.asInt()))
      }
      .filter { case (v, _) => asOf.forall(v <= _) }
    /** Ingest one checkpoint-shaped parquet frame (classic checkpoint,
      * multi-part part set, V2 manifest, or V2 sidecar): protocol/metaData
      * rows apply when present; the add column is the scale-bearing one —
      * typed Rows, no per-entry JSON text. A checkpoint's remove entries
      * are expired tombstones kept for vacuum, not live deletes. Returns
      * any `sidecar` action paths (V2 manifests only). */
    def ingestCheckpointFrame(cp: DataFrame, cpVersion: Long): Seq[String] = {
      val topFields = cp.schema.fieldNames.toSet
      def structFields(c: String): Set[String] =
        cp.schema(c).dataType.asInstanceOf[StructType].fieldNames.toSet
      def sub(c: String, f: String): Option[String] =
        if (topFields.contains(c) && structFields(c).contains(f)) Some(s"$c.$f") else None

      if (topFields.contains("protocol")) {
        val sel = Seq(Some("protocol.minReaderVersion"), sub("protocol", "readerFeatures")).flatten
        cp.filter(col("protocol").isNotNull).select(sel.map(col): _*).collect().foreach { r =>
          readerVersion = math.max(readerVersion, if (r.isNullAt(0)) 1 else r.getInt(0))
          if (r.length > 1 && !r.isNullAt(1)) readerFeatures ++= r.getSeq[String](1)
        }
      }
      if (topFields.contains("metaData")) {
        val sel = Seq(Some("metaData.schemaString"), Some("metaData.partitionColumns"),
          sub("metaData", "configuration")).flatten
        cp.filter(col("metaData").isNotNull).select(sel.map(col): _*).collect().foreach { r =>
          schemaJson = Some(r.getString(0))
          partCols = if (r.isNullAt(1)) Nil else r.getSeq[String](1)
          if (r.length > 2 && !r.isNullAt(2))
            tableConf = r.getMap[String, String](2).toMap
        }
      }
      if (topFields.contains("add")) {
        val sub = structFields("add")
        val sel = Seq("path" -> "p", "partitionValues" -> "pv",
          "deletionVector" -> "dvv", "size" -> "sz",
          "modificationTime" -> "mt", "stats" -> "st",
          "baseRowId" -> "bri", "defaultRowCommitVersion" -> "drcv")
          .collect { case (f, alias) if f == "path" || sub.contains(f) =>
            col(s"add.$f").as(alias)
          }
        cp.filter(col("add").isNotNull).select(sel: _*).collect().foreach { r =>
          def at(alias: String): Option[Int] = {
            val i = r.schema.fieldNames.indexOf(alias)
            if (i >= 0 && !r.isNullAt(i)) Some(i) else None
          }
          val pv = at("pv").map(i => r.getMap[String, String](i).toMap)
            .getOrElse(Map.empty[String, String])
          val dv = at("dvv").map { i =>
            val s = r.getStruct(i)
            def fld(n: String): Option[AnyRef] =
              if (s.schema.fieldNames.contains(n) && !s.isNullAt(s.fieldIndex(n)))
                Some(s.get(s.fieldIndex(n)).asInstanceOf[AnyRef])
              else None
            DeletionVectors.Descriptor(
              fld("storageType").map(_.toString).getOrElse(""),
              fld("pathOrInlineDv").map(_.toString).getOrElse(""),
              fld("offset").map(_.asInstanceOf[Number].intValue()),
              fld("sizeInBytes").map(_.asInstanceOf[Number].intValue()).getOrElse(0),
              fld("cardinality").map(_.asInstanceOf[Number].longValue()).getOrElse(0L))
          }
          adds((r.getString(0), dvKey(dv))) = AddEntry(pv, dv,
            at("sz").map(r.getLong).getOrElse(0L),
            at("mt").map(r.getLong).getOrElse(0L),
            at("st").map(r.getString).filter(_.nonEmpty),
            addVersion = cpVersion,
            baseRowId = at("bri").map(r.getLong),
            defaultRowCommitVersion = at("drcv").map(r.getLong))
        }
      }
      if (topFields.contains("sidecar"))
        cp.filter(col("sidecar").isNotNull).select(col("sidecar.path"))
          .collect().map(_.getString(0)).toSeq
      else Nil
    }

    // sidecar paths resolve against _delta_log/_sidecars/ unless absolute
    // (PROTOCOL.md "V2 Checkpoint Table Feature")
    def resolveSidecar(p: String): String = {
      val raw = new Path(java.net.URLDecoder.decode(p, "UTF-8"))
      (if (raw.isAbsolute) raw else new Path(new Path(logDir, "_sidecars"), raw)).toString
    }

    lastCp.foreach { case (version, parts) =>
      val files: Seq[Path] = parts match {
        case Some(n) =>
          (1 to n).map(i => new Path(logDir, f"$version%020d.checkpoint.$i%010d.$n%010d.parquet"))
        case None =>
          val classic = new Path(logDir, f"$version%020d.checkpoint.parquet")
          if (fs.exists(classic)) Seq(classic)
          else {
            // V2 checkpoints are UUID-named (`v.checkpoint.<unique>.parquet`
            // or `.json`) and found by LISTING, not name construction. Each
            // V2 manifest is complete on its own — pick one deterministically.
            val prefix = f"$version%020d.checkpoint."
            val cands = fs.listStatus(logDir).map(_.getPath).filter { p =>
              val n = p.getName
              n.startsWith(prefix) && (n.endsWith(".parquet") || n.endsWith(".json"))
            }
            if (cands.isEmpty) throw DeltaReadException(
              s"`$root`: _last_checkpoint names version $version but no matching " +
                "checkpoint file exists in _delta_log")
            Seq(cands.maxBy(_.getName))
          }
      }
      val sidecars: Seq[String] =
        if (files.length == 1 && files.head.getName.endsWith(".json")) {
          // V2 JSON manifest: one action per line, like a commit, plus
          // sidecar actions; checkpoint add/remove semantics (removes are
          // expired tombstones — ignored)
          val in = fs.open(files.head)
          val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
          lines.filter(_.nonEmpty).flatMap { line =>
            val node = mapper.readTree(line)
            if (node.has("protocol")) applyProtocolJson(node.path("protocol"))
            if (node.has("metaData")) applyMetaJson(node.path("metaData"))
            if (node.has("add")) {
              val a = node.path("add")
              val dv = dvJson(a)
              adds((a.path("path").asText(), dvKey(dv))) = addEntryJson(a, dv, version)
            }
            if (node.has("sidecar")) Some(node.path("sidecar").path("path").asText()) else None
          }
        } else
          // mergeSchema: multi-part checkpoints may split action kinds
          // across parts; the union of part schemas is the action schema
          ingestCheckpointFrame(spark.read.option("mergeSchema", "true")
            .parquet(files.map(_.toString): _*), version)
      if (sidecars.nonEmpty) {
        val more = ingestCheckpointFrame(spark.read.option("mergeSchema", "true")
          .parquet(sidecars.map(resolveSidecar): _*), version)
        if (more.nonEmpty) throw DeltaReadException(
          s"`$root`: V2 checkpoint sidecar files must not reference further " +
            "sidecars — malformed checkpoint")
      }
    }

    // JSON commits after the checkpoint (and up to the time-travel pin),
    // in version order
    val allCommitVersions = allCommitStatuses.map { case (v, st) => (v, st.getPath) }
    val commits = allCommitVersions.filter { case (v, _) =>
      lastCp.forall(_._1 < v) && asOf.forall(v <= _)
    }
    asOf.foreach { pin =>
      val maxAvail = (lastCp.map(_._1).toSeq ++ allCommitVersions.map(_._1)).maxOption
      if (maxAvail.forall(_ < pin))
        throw DeltaReadException(
          s"`$root`: version_as_of $pin does not exist" +
            maxAvail.map(m => s" (latest available: $m)").getOrElse(""))
      // contiguity: the replay must cover [base, pin] with no vacuumed gap
      val base = lastCp.map(_._1 + 1).getOrElse(0L)
      val have = commits.map(_._1).toSet
      (base to pin).find(!have.contains(_)).foreach { missing =>
        throw DeltaReadException(
          s"`$root`: version_as_of $pin needs commit $missing, which is not in " +
            "_delta_log (vacuumed?) — this version is no longer reconstructible")
      }
    }
    if (lastCp.isEmpty && commits.isEmpty)
      throw DeltaReadException(s"`$root`: _delta_log holds no checkpoint and no commits")
    changesSince.foreach { since =>
      // a checkpoint folds per-file add versions away: every folded file
      // reports the checkpoint version. A `since` BELOW the checkpoint
      // would silently misreport folded files as fresh changes — reject.
      lastCp.foreach { case (cpV, _) =>
        if (since < cpV) throw DeltaReadException(
          s"`$root`: changes_since $since predates checkpoint $cpV, which no " +
            "longer records per-file add versions; pass changes_since >= " +
            s"$cpV or keep the commit JSON history")
      }
      val end = asOf.orElse(
        (lastCp.map(_._1).toSeq ++ commits.map(_._1)).maxOption).getOrElse(0L)
      if (since > end) throw DeltaReadException(
        s"`$root`: changes_since $since is beyond the read's end version $end " +
          "(nothing has been committed after it)")
    }
    commits.foreach { case (v, path) =>
      val in = fs.open(path)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) applyProtocolJson(node.path("protocol"))
        if (node.has("metaData")) applyMetaJson(node.path("metaData"))
        if (node.has("add")) {
          val a = node.path("add")
          val dv = dvJson(a)
          adds((a.path("path").asText(), dvKey(dv))) = addEntryJson(a, dv, v)
        }
        if (node.has("remove")) {
          val rm = node.path("remove")
          adds.remove((rm.path("path").asText(), dvKey(dvJson(rm))))
        }
      }
    }

    val schema = DataType.fromJson(schemaJson.getOrElse(
      throw DeltaReadException(s"`$root`: no metaData action found in the Delta log")))
      .asInstanceOf[StructType]

    // --- protocol gate (now that configuration + features are known) ---
    val cmMode = tableConf.getOrElse("delta.columnMapping.mode", "none")
    if (readerVersion == 2 && cmMode != "none" && cmMode != "name" && cmMode != "id")
      throw DeltaReadException(
        s"`$root`: unknown column mapping mode `$cmMode`; this native reader " +
          "implements modes name/id from the public protocol")
    if (readerVersion > 3) throw DeltaReadException(
      s"`$root`: Delta reader protocol version $readerVersion is newer than this " +
        "native reader understands; install a delta connector jar for this table")
    if (readerVersion == 3) {
      if (readerFeatures.isEmpty) throw DeltaReadException(
        s"`$root`: Delta reader protocol version 3 lists no readerFeatures — " +
          "malformed log; refusing to guess what the table needs")
      val unsupported = readerFeatures -- SupportedReaderFeatures
      if (unsupported.nonEmpty) throw DeltaReadException(
        s"`$root`: Delta reader protocol version 3 features " +
          unsupported.toSeq.sorted.mkString(", ") +
          " are not implemented by this native reader; " +
          "install a delta connector jar for this table")
    }

    // --- flatten reconciliation keys back to one live entry per file ---
    val liveAll: Seq[(String, AddEntry)] = adds.toSeq.map { case ((p, _), e) => p -> e }
    val live: Seq[(String, AddEntry)] = changesSince match {
      case Some(since) => liveAll.filter(_._2.addVersion > since)
      case None => liveAll
    }
    val dupPaths = liveAll.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
    if (dupPaths.nonEmpty) throw DeltaReadException(
      s"`$root`: log reconciliation left ${dupPaths.size} file path(s) live more " +
        s"than once (first: ${dupPaths.head}) — a remove action is missing its " +
        "deletionVector id; refusing to double-read")

    // --- column mapping (PROTOCOL.md Column Mapping): data files carry
    // PHYSICAL column names; the logical schema's field metadata holds the
    // mapping. Read with the physical schema, then rename back — top level
    // by alias, nested levels by position-cast (Cast on structs matches by
    // position and rewrites names). Pure metadata, zero data movement.
    val mappingActive = cmMode != "none" &&
      schema.fields.exists(_.metadata.contains(PhysNameKey))
    def physName(f: StructField): String =
      if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey) else f.name
    def toPhysical(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(name = physName(f), dataType = toPhysical(f.dataType))))
      case a: ArrayType => a.copy(elementType = toPhysical(a.elementType))
      case m: MapType => m.copy(keyType = toPhysical(m.keyType), valueType = toPhysical(m.valueType))
      case other => other
    }
    val physSchema = if (mappingActive) toPhysical(schema).asInstanceOf[StructType] else schema
    val physByLogical: Map[String, String] =
      schema.fields.map(f => f.name -> physName(f)).toMap
    // partitionColumns are logical names; add.partitionValues (and hive dir
    // names) are keyed by PHYSICAL names when mapping is active
    val physPartCols = partCols.map(c => physByLogical.getOrElse(c, c))
    def unmapped(df: DataFrame): DataFrame =
      if (!mappingActive) df
      else df.select(schema.fields.map { f =>
        col(physName(f)).cast(f.dataType).as(f.name)
      }.toSeq: _*)

    def resolve(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      val dp = new Path(decoded)
      (if (dp.isAbsolute) dp else new Path(rootPath, dp)).toString
    }

    // deletion vectors on live files: decoded in executors, removed via a
    // positional anti-join on the direct scan (before any rename/join makes
    // `_metadata` unaddressable)
    val dvs: Seq[(String, DeletionVectors.Descriptor)] =
      live.collect { case (p, e) if e.dv.isDefined => (resolve(p), e.dv.get) }
    def withoutDeleted(df: DataFrame): DataFrame =
      DeletionVectors.applyTo(spark, df, dvs, rootPath)

    // ROW TRACKING read (`row_tracking=true`): append `_row_id` and
    // `_row_commit_version` columns per PROTOCOL.md Row Tracking — each
    // row's id is its file's materialized value when present (rows that
    // have moved through a rewrite) else baseRowId + row position; the
    // commit version defaults to the add's defaultRowCommitVersion. The
    // per-file (base, default) pairs broadcast-join against the scan, so
    // the cost is one codegen'd projection + a tiny hash join — no extra
    // pass, no driver data.
    val withRowIds = options.get("row_tracking").exists(_.toBoolean)
    val matIdName = tableConf.get("delta.rowTracking.materializedRowIdColumnName")
    val matVerName = tableConf.get("delta.rowTracking.materializedRowCommitVersionColumnName")
    if (withRowIds) {
      if (!tableConf.get("delta.enableRowTracking").exists(_.toBoolean))
        throw DeltaReadException(
          s"`$root`: row_tracking=true but the table does not set " +
            "delta.enableRowTracking — row ids are not stable (or present) " +
            "on this table")
      live.collectFirst { case (p, e) if e.baseRowId.isEmpty => p }.foreach { p =>
        throw DeltaReadException(
          s"`$root`: row_tracking=true but live file `$p` carries no " +
            "baseRowId — a non-row-tracking writer touched this table; " +
            "row ids cannot be served")
      }
    }
    def rowIdSchema(base: StructType): StructType = StructType(base.fields ++ Seq(
      StructField("_row_id", LongType, nullable = true),
      StructField("_row_commit_version", LongType, nullable = true)))

    // --- distributed data read over the resolved live files ---
    // The scan goes through a log-backed FileIndex (LogFileIndex): partition
    // values come FROM THE LOG as typed partition columns (hive and non-hive
    // layouts identically — Catalyst partition-prunes both), per-file
    // `add.stats` min/max/nullCount prune files at PLAN time against the
    // pushed data filters (the delta-kernel skipping design), and
    // sizeInBytes is the log's true byte count (honest broadcast decisions).
    if (live.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        if (withRowIds) rowIdSchema(schema) else schema)
    else {
      val physDataSchema0 =
        StructType(physSchema.fields.filterNot(f => physPartCols.contains(f.name)))
      // the materialized row-id columns are physical-only (never in the
      // table schema); files that predate any rewrite simply lack them and
      // read as null — exactly the rows whose default arithmetic applies
      val physDataSchema =
        if (!withRowIds) physDataSchema0
        else StructType(physDataSchema0.fields ++
          (matIdName.toSeq ++ matVerName.toSeq).distinct
            .map(n => StructField(n, LongType, nullable = true)))
      val partSchemaPhys = StructType(physPartCols.map { c =>
        physSchema(physSchema.fieldIndex(c)).copy(nullable = true)
      })
      val entries = live.map { case (p, e) =>
        val resolved = resolve(p)
        new LogFileIndex.IndexedFile(
          resolved,
          // the protocol requires add.size accurate and split planning
          // trusts it (as delta-kernel does); a size no parquet file can
          // have (< the 12-byte magic+footer minimum) marks a malformed
          // log entry and falls back to one driver stat for that file
          if (e.size >= 12) e.size
          else new Path(resolved).getFileSystem(spark.sessionState.newHadoopConf())
            .getFileStatus(new Path(resolved)).getLen,
          e.modificationTime,
          e.partitionValues,
          () => e.stats.flatMap(LogFileIndex.parseDeltaStats(_, physDataSchema, mapper)))
      }
      // rowsExact: with no deletion vectors, the scan returns exactly the
      // rows the log's add.stats describe → metadata-only aggregates apply
      val index = new LogFileIndex(spark, rootPath, entries, partSchemaPhys,
        rowsExact = dvs.isEmpty)
      val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        index, partSchemaPhys, physDataSchema, None,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        Map.empty[String, String])(spark)
      val scan = spark.baseRelationToDataFrame(relation)
      // DV anti-join FIRST (it addresses _metadata, gone after any select),
      // then restore the declared column order (the relation appends
      // partition columns last), then the logical rename
      if (!withRowIds)
        unmapped(withoutDeleted(scan).select(physSchema.fieldNames.map(col).toSeq: _*))
      else {
        val infoSchema = StructType(Seq(
          StructField("__rt_key", StringType, nullable = false),
          StructField("__rt_base", LongType, nullable = true),
          StructField("__rt_def", LongType, nullable = true)))
        val infoRows = live.map { case (p, e) =>
          org.apache.spark.sql.Row(PathKeys.key(resolve(p)),
            e.baseRowId.map(Long.box).orNull,
            e.defaultRowCommitVersion.map(Long.box).orNull)
        }
        val infoDf = spark.createDataFrame(
          spark.sparkContext.parallelize(infoRows, 1), infoSchema)
        // _metadata must be addressed BEFORE any join makes it unreachable;
        // row_index is the PHYSICAL position, so DV-surviving rows keep
        // their original ids (positions never renumber under a DV)
        val base = scan
          .withColumn("__rt_key", PathKeys.keyCol(col("_metadata.file_path")))
          .withColumn("__rt_idx", col("_metadata.row_index"))
        val joined = withoutDeleted(base)
          .join(broadcast(infoDf), Seq("__rt_key"), "left")
          .withColumn("_row_id",
            coalesce(matIdName.map(col).toSeq :+ (col("__rt_base") + col("__rt_idx")): _*))
          .withColumn("_row_commit_version",
            coalesce(matVerName.map(col).toSeq :+ col("__rt_def"): _*))
        val rtCols = Seq(col("_row_id"), col("_row_commit_version"))
        val sel = joined.select(physSchema.fieldNames.map(col).toSeq ++ rtCols: _*)
        if (!mappingActive) sel
        else sel.select(schema.fields.map { f =>
          col(physName(f)).cast(f.dataType).as(f.name)
        }.toSeq ++ rtCols: _*)
      }
    }
  }
}
