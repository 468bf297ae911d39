package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.secrets.Secrets
import graft.types.TypeMap

/** Lakehouse table registration — the Spark analogue of the reference's
  * `CREATE FOREIGN TABLE ... SERVER fmt OPTIONS (...)` → engine view pipeline
  * (reference: src/fdw/base.rs:216-260 register_duckdb_view, and
  * src/fdw/trigger.rs:55-192 auto schema creation).
  *
  * `attach` is idempotent by table name (re-attach replaces the view, like
  * the reference's drop-stale-view, trigger.rs:139-143). Schema inference is
  * Spark-native: attaching with no declared schema uses the source schema —
  * the reference's `DESCRIBE`+ALTER dance collapses to `.schema`.
  */
object Catalog {

  final case class InvalidOptionException(msg: String) extends IllegalArgumentException(msg)
  final case class ReservedTableNameException(name: String) extends IllegalArgumentException(
    s"table name `$name` is reserved for engine metadata views")

  /** Engine meta-view names rejected as user table names (behavior pinned by
    * the reference's reserved list, src/fdw/trigger.rs:55-72). */
  val reservedNames: Set[String] = Set(
    "duckdb_columns", "duckdb_constraints", "duckdb_databases", "duckdb_dependencies",
    "duckdb_extensions", "duckdb_functions", "duckdb_indexes", "duckdb_keywords",
    "duckdb_optimizers", "duckdb_schemas", "duckdb_secrets", "duckdb_sequences",
    "duckdb_settings", "duckdb_tables", "duckdb_types", "duckdb_views",
    "duckdb_temporary_files")

  /** Register `table` over files of `format`. Returns the attached frame
    * (also visible to SQL as a temp view named `table`).
    *
    * @param userMapping credential options (≙ user mapping → CREATE SECRET)
    * @param schema optional declared schema (≙ typed CREATE FOREIGN TABLE);
    *               column types are validated through TypeMap semantics
    */
  def attach(
      spark: SparkSession,
      table: String,
      format: String,
      options: Map[String, String],
      userMapping: Map[String, String] = Map.empty,
      schema: Option[StructType] = None): DataFrame = {
    if (reservedNames.contains(table.toLowerCase)) throw ReservedTableNameException(table)
    val spec = Formats(format)
    if (!spec.available) throw Formats.UnsupportedFormatException(spec.name)
    validateOptions(spec, options)
    if (userMapping.nonEmpty) Secrets(spark, userMapping)

    val files0 = split_files(options("files"))
    val files =
      if (spec.name == "spatial") resolveSpatialLayers(spark, files0, options)
      else files0
    if (spec.name == "csv" || spec.name == "json") enforceCompression(files, options)
    var df = withPartitionAutocast(spark, options) {
      spec.name match {
        case "parquet" =>
          attachBucketed(spark, table, files).getOrElse(
            readParquet(spark, files, options, schema))
        case "csv" => readCsv(spark, files, options, schema)
        case "json" => readJson(spark, files, options, schema)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".xlsx")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".xlsx")))
            throw InvalidOptionException(
              "spatial attach mixes workbooks with other formats; attach them separately")
          Seq("keep_wkb", "spatial_filter", "spatial_filter_box").foreach { o =>
            if (options.contains(o)) throw InvalidOptionException(
              s"`$o` needs a geometry layer; an .xlsx worksheet is attribute-" +
                "only (the XLSX driver carries no geometry column)")
          }
          graft.sources.Xlsx.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.stripSuffix("/").endsWith(".gdb")) =>
          if (!files.forall(f => f.toLowerCase.stripSuffix("/").endsWith(".gdb")))
            throw InvalidOptionException(
              "spatial attach mixes geodatabases with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a geodatabase's geometry is delivered as WKB")
          graft.sources.FileGdb.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".gpkg")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".gpkg")))
            throw InvalidOptionException(
              "spatial attach mixes geopackages with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a geopackage's geometry is delivered as WKB")
          graft.sources.GeoPackage.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".kml")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".kml")))
            throw InvalidOptionException(
              "spatial attach mixes KML with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a KML placemark's geometry is delivered as WKB")
          graft.sources.Kml.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".fgb")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".fgb")))
            throw InvalidOptionException(
              "spatial attach mixes FlatGeobuf with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a FlatGeobuf feature's geometry is delivered as WKB")
          graft.sources.FlatGeobuf.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".dxf")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".dxf")))
            throw InvalidOptionException(
              "spatial attach mixes DXF with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a DXF entity's geometry is delivered as WKB")
          graft.sources.Dxf.read(spark, files, options)
        case "spatial" if files.exists(f =>
            f.toLowerCase.endsWith(".mif") || f.toLowerCase.endsWith(".tab")) =>
          if (!files.forall(f =>
              f.toLowerCase.endsWith(".mif") || f.toLowerCase.endsWith(".tab")))
            throw InvalidOptionException(
              "spatial attach mixes MapInfo files with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a MapInfo feature's geometry is delivered as WKB")
          graft.sources.Mif.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".gpx")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".gpx")))
            throw InvalidOptionException(
              "spatial attach mixes GPX with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a GPX feature's geometry is delivered as WKB")
          graft.sources.Gpx.read(spark, files, options)
        case "spatial" if files.exists(f => f.toLowerCase.endsWith(".gml")) =>
          if (!files.forall(f => f.toLowerCase.endsWith(".gml")))
            throw InvalidOptionException(
              "spatial attach mixes GML with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a GML feature's geometry is delivered as WKB")
          graft.sources.Gml.read(spark, files, options)
        case "spatial" if files.exists(f => f.endsWith(".shp") || f.endsWith(".SHP")) =>
          if (!files.forall(f => f.endsWith(".shp") || f.endsWith(".SHP")))
            throw InvalidOptionException(
              "spatial attach mixes shapefiles with other formats; attach them separately")
          if (options.get("keep_wkb").exists(_.toBoolean == false))
            throw InvalidOptionException(
              "keep_wkb=false is GeoJSON-only (its native representation is json " +
                "text); a shapefile's geometry is delivered as WKB")
          graft.sources.Shapefile.read(spark, files, options)
        case "spatial" => graft.sources.GeoJson.read(spark, files, options)
        case "delta" if !Formats.deltaConnectorPresent =>
          if (files.length != 1) throw InvalidOptionException(
            s"delta attaches a single table root path; got ${files.length} paths")
          graft.sources.DeltaNative.read(spark, files.head, options)
        case "iceberg" if !Formats.icebergConnectorPresent =>
          if (files.length != 1) throw InvalidOptionException(
            s"iceberg attaches a single table root path; got ${files.length} paths")
          graft.sources.IcebergNative.read(spark, files.head, options)
        case "delta" | "iceberg" => readConnector(spark, spec, files, options, schema)
        case "warc" => graft.sources.Warc.read(spark, files, options)
        case "orc" => readOrc(spark, files, options, schema)
        case "avro" => graft.sources.AvroFile.read(spark, files, options)
        case other => throw Formats.UnsupportedFormatException(other)
      }
    }
    // Declared columns (a typed CREATE FOREIGN TABLE) over readers that take
    // no read schema — the native lakehouse log readers and the spatial
    // parsers: project+cast to the declared shape. PG FDW semantics: the
    // declared column list IS the table's shape (reference
    // src/fdw/base.rs:60-92); columns the source lacks fail loudly here.
    schema.foreach { s =>
      val castOnly = spec.name == "spatial" ||
        (spec.name == "delta" && !Formats.deltaConnectorPresent) ||
        (spec.name == "iceberg" && !Formats.icebergConnectorPresent)
      if (castOnly)
        df = df.select(s.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    }
    // spatial predicate pushdown (≙ st_read's spatial_filter_box,
    // src/duckdb/spatial.rs:29-82): envelope-intersect test per row via the
    // native wkb_env_intersects expression, applied directly above the scan
    // so rows drop before any downstream operator. keep_wkb=false delivers
    // GeoJSON text — encode to WKB just for the test, the column unchanged.
    val spatialGeomExpr =
      if (options.get("keep_wkb").exists(_.toBoolean == false)) "geojson_to_wkb(geom)"
      else "geom"
    options.get("spatial_filter_box").foreach { boxStr =>
      if (spec.name != "spatial") throw InvalidOptionException(
        "spatial_filter_box applies to spatial attaches only")
      val (minX, minY, maxX, maxY) =
        try graft.functions.WkbEnvelope.parseBox(boxStr)
        catch { case e: IllegalArgumentException => throw InvalidOptionException(e.getMessage) }
      df = df.filter(org.apache.spark.sql.functions.expr(
        s"wkb_env_intersects($spatialGeomExpr, ${minX}D, ${minY}D, ${maxX}D, ${maxY}D)"))
    }
    // exact WKT polygon filter (st_read's spatial_filter) — point, line,
    // polygon and Multi* layers, exact intersects per row; the WKT parses
    // here so malformed filters fail at ATTACH, loudly
    options.get("spatial_filter").foreach { wkt =>
      if (spec.name != "spatial") throw InvalidOptionException(
        "spatial_filter applies to spatial attaches only")
      try graft.functions.WktFilter.parseWktPolygon(wkt)
      catch { case e: IllegalArgumentException => throw InvalidOptionException(e.getMessage) }
      df = df.filter(org.apache.spark.sql.functions.expr(
        s"wkb_intersects_wkt($spatialGeomExpr, '${wkt.replace("'", "''")}')"))
    }
    df = withMetadataColumns(df, options)
    df = withHiveTypes(df, options)
    df = withCasing(df, options)
    options.get("select").foreach { sel => df = df.selectExpr(sel.split(",").map(_.trim): _*) }
    df.createOrReplaceTempView(table)
    attachMeta.put(table.toLowerCase, (spec.name, options))
    df
  }

  // Attach metadata (format + options as last attached, by lowercase view
  // name) — lets the SQL layer re-attach with a time-travel pin for
  // `FROM t FOR TIMESTAMP|VERSION AS OF ...`. Driver-side metadata only.
  private val attachMeta =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Map[String, String])]()
  def attachedMeta(table: String): Option[(String, Map[String, String])] =
    Option(attachMeta.get(table.toLowerCase))

  /** All attach registrations: (view name, format, files root). */
  def attachedTables: Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    attachMeta.asScala.toSeq.map { case (n, (fmt, opts)) =>
      (n, fmt, opts.getOrElse("files", ""))
    }.sortBy(_._1)
  }

  /** hive_types 'col:TYPE,...' declares partition-column types explicitly
    * (≙ read_parquet's hive_types struct, src/duckdb/parquet.rs:82-92):
    * cast the named columns to the declared engine types after discovery. */
  private def withHiveTypes(df: DataFrame, options: Map[String, String]): DataFrame =
    options.get("hive_types").map { spec =>
      parseColumns(spec).fields.foldLeft(df) { (d, f) =>
        d.withColumn(f.name, col(f.name).cast(f.dataType))
      }
    }.getOrElse(df)

  /** hive_types_autocast '0'/'false' disables partition-value type inference
    * (discovered partition columns stay strings), matching DuckDB's flag
    * (src/duckdb/parquet.rs:86-91). Spark's knob is a session conf, so wrap
    * the read and restore — attach is driver-side and synchronous. */
  private def withPartitionAutocast[A](spark: SparkSession, options: Map[String, String])(read: => A): A = {
    val confKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val disable = options.get("hive_types_autocast").exists(v => v == "0" || v.toLowerCase == "false")
    if (!disable) read
    else {
      val prev = spark.conf.get(confKey)
      spark.conf.set(confKey, "false")
      try read finally spark.conf.set(confKey, prev)
    }
  }

  /** Drop an attached view (≙ DROP FOREIGN TABLE). */
  def detach(spark: SparkSession, table: String): Boolean =
    spark.catalog.dropTempView(table)

  /** files option: comma-separated path list; each entry may be a glob. */
  def split_files(files: String): Seq[String] =
    files.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** st_read's LAYER model over the native spatial drivers
    * (src/duckdb/spatial.rs:29-82 options `layer`, `sequential_layer_scan`,
    * `allowed_drivers`, `open_options`, `sibling_files`): a directory is a
    * multi-layer dataset — one layer per .shp / .geojson file, layer name =
    * basename sans extension. `layer=<name>` selects one; a multi-layer
    * directory without `layer` rejects LOUDLY listing the names (GDAL's
    * silent open-first-layer would drop data). `allowed_drivers` restricts
    * which native driver may serve the attach ("GeoJSON", "ESRI Shapefile").
    * `sequential_layer_scan` is a GDAL probing-strategy hint — the native
    * reader always scans layer files sequentially, so both values are
    * already the behavior (validated, no-op). `open_options` are GDAL
    * driver switches with no native equivalent — non-empty rejects loudly.
    * `sibling_files` bounds which auxiliary files GDAL may probe; the
    * native shapefile reader auto-probes only `.dbf`, so entries are
    * validated to exist and otherwise irrelevant. */
  private def resolveSpatialLayers(spark: SparkSession, files: Seq[String],
      options: Map[String, String]): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    // open_options are honored only where a native equivalent exists: the
    // XLSX driver's HEADERS/FIELD_TYPES (validated in sources/Xlsx). For
    // every other driver they are GDAL switches with no equivalent — reject.
    options.get("open_options").filter(_.trim.nonEmpty).foreach { oo =>
      if (!files.forall(_.toLowerCase.endsWith(".xlsx")))
        throw InvalidOptionException(
          s"spatial open_options `$oo` are GDAL driver switches this native " +
            "reader has no equivalent for outside the XLSX driver " +
            "(HEADERS=, FIELD_TYPES=); drop the option or use a GDAL deployment")
    }
    options.get("sequential_layer_scan").foreach { v =>
      if (!Set("true", "false").contains(v.toLowerCase))
        throw InvalidOptionException(
          s"sequential_layer_scan must be true or false, got `$v`")
    }
    options.get("sibling_files").foreach { list =>
      split_files(list).foreach { s =>
        val p = new Path(s)
        if (!p.getFileSystem(conf).exists(p)) throw InvalidOptionException(
          s"sibling_files entry `$s` does not exist")
      }
    }
    def isLayerFile(n: String): Boolean = {
      val l = n.toLowerCase
      l.endsWith(".shp") || l.endsWith(".geojson") || l.endsWith(".json") ||
        l.endsWith(".gpkg") || l.endsWith(".xlsx") || l.endsWith(".kml") ||
        l.endsWith(".gml") || l.endsWith(".gpx") || l.endsWith(".fgb") ||
        l.endsWith(".dxf") || l.endsWith(".mif")
    }
    def base(n: String): String = {
      val i = n.lastIndexOf('.'); if (i > 0) n.take(i) else n
    }
    // a directory expands to its layer files; explicit paths pass through
    val expanded: Seq[(String, Boolean)] = files.flatMap { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p) && fs.getFileStatus(p).isDirectory &&
          p.getName.toLowerCase.endsWith(".gdb")) {
        // a .gdb DIRECTORY is one OpenFileGDB dataset (its layers are
        // tables INSIDE it), not a directory of layer files
        Seq((f, false))
      } else if (fs.exists(p) && fs.getFileStatus(p).isDirectory) {
        val layers = fs.listStatus(p).toSeq
          .filter(s => s.isFile && isLayerFile(s.getPath.getName))
          .map(_.getPath.toString).sorted
        if (layers.isEmpty) throw InvalidOptionException(
          s"spatial attach: directory `$f` holds no .shp/.geojson layer files")
        layers.map((_, true))
      } else Seq((f, false))
    }
    def driverOf(p: String): String = {
      val l = p.toLowerCase
      if (l.stripSuffix("/").endsWith(".gdb")) "OpenFileGDB"
      else if (l.endsWith(".shp")) "ESRI Shapefile"
      else if (l.endsWith(".gpkg")) "GPKG"
      else if (l.endsWith(".xlsx")) "XLSX"
      else if (l.endsWith(".kml")) "KML"
      else if (l.endsWith(".gml")) "GML"
      else if (l.endsWith(".gpx")) "GPX"
      else if (l.endsWith(".fgb")) "FlatGeobuf"
      else if (l.endsWith(".dxf")) "DXF"
      else if (l.endsWith(".mif") || l.endsWith(".tab")) "MapInfo File"
      else "GeoJSON"
    }
    options.get("allowed_drivers").foreach { ad =>
      val allowed = split_files(ad).toSet
      expanded.map(_._1).find(p => !allowed.contains(driverOf(p))).foreach { p =>
        throw InvalidOptionException(
          s"spatial attach: `$p` needs driver `${driverOf(p)}`, which is not " +
            s"in allowed_drivers ($ad)")
      }
    }
    // GeoPackage/XLSX/GPX layers live INSIDE the file (gpkg_contents feature
    // tables / worksheets / the five fixed GPX layers), so the file-basename
    // layer model below does not apply: the `layer` option passes through to
    // the container reader, which selects the table/sheet/layer (or rejects
    // loudly listing candidates).
    def containerExt(p: String): Option[String] = {
      val l = p.toLowerCase.stripSuffix("/")
      Seq(".gpkg", ".xlsx", ".gpx", ".gdb").find(l.endsWith)
    }
    if (expanded.nonEmpty && expanded.forall(p => containerExt(p._1).isDefined)) {
      val exts = expanded.flatMap(p => containerExt(p._1)).distinct
      if (exts.size > 1)
        throw InvalidOptionException(
          s"spatial attach mixes container formats (${exts.sorted.mkString(", ")}); " +
            "attach them separately")
      return expanded.map(_._1)
    }
    // A MIXED set (.gpkg/.xlsx/.gpx alongside .shp/.geojson) would conflate
    // the two layer namespaces: layer=<name> matching a container file's
    // BASENAME would pass that file through with the same option, which its
    // reader reinterprets as a table/sheet/layer name INSIDE the file.
    // Reject up front instead of attaching the wrong thing.
    if (expanded.exists(p => containerExt(p._1).isDefined))
      throw InvalidOptionException(
        "spatial attach mixes container formats (.gpkg/.xlsx/.gpx/.gdb) with file-" +
          "layer formats; a container's layers are tables/sheets inside the " +
          "file (layer= selects one), while .shp/.geojson layers are file " +
          "basenames — attach them separately")
    options.get("layer") match {
      case Some(l) =>
        val hit = expanded.map(_._1).filter(p => base(new Path(p).getName) == l)
        if (hit.isEmpty) throw InvalidOptionException(
          s"spatial attach: no layer named `$l`; available: " +
            expanded.map(p => base(new Path(p._1).getName)).distinct.sorted
              .mkString(", "))
        hit
      case None =>
        val dirLayerNames = expanded.collect { case (p, true) => base(new Path(p).getName) }.distinct
        if (dirLayerNames.size > 1) throw InvalidOptionException(
          s"spatial attach: the directory holds ${dirLayerNames.size} layers " +
            s"(${dirLayerNames.sorted.mkString(", ")}); select one with layer=<name>")
        expanded.map(_._1)
    }
  }

  /** `compression` semantics: Spark's text readers select the decompression
    * codec from the file EXTENSION — there is no read-side codec override
    * (the reference forces the codec for extension-less files, csv.rs:164).
    * Honored by VERIFICATION instead of silent acceptance: the option is
    * accepted exactly when extension detection will already do what was
    * asked for every file, and errors loudly otherwise — a gzipped file
    * without `.gz` can never silently parse as garbage. */
  private def enforceCompression(files: Seq[String], options: Map[String, String]): Unit =
    options.get("compression").map(_.toLowerCase).foreach { c =>
      def extCodec(f: String): Option[String] = {
        val n = f.toLowerCase
        if (n.endsWith(".gz") || n.endsWith(".gzip")) Some("gzip")
        else if (n.endsWith(".bz2")) Some("bzip2")
        else if (n.endsWith(".zst")) Some("zstd")
        else if (n.endsWith(".lz4")) Some("lz4")
        else if (n.endsWith(".snappy")) Some("snappy")
        else if (n.endsWith(".deflate")) Some("deflate")
        else None
      }
      c match {
        case "auto" | "detect" => () // extension detection IS the native behavior
        case "none" | "uncompressed" =>
          files.find(f => extCodec(f).isDefined).foreach { f =>
            throw InvalidOptionException(
              s"compression 'none' requested but `$f` carries a compressed extension; " +
                "the engine selects the codec by extension and would decompress it")
          }
        case codec =>
          files.find(f => !extCodec(f).contains(codec)).foreach { f =>
            throw InvalidOptionException(
              s"compression '$codec' requested but `$f` does not carry a matching " +
                "file extension; the engine selects the codec by extension — rename " +
                "the file (e.g. `.gz` for gzip) or use compression 'auto'")
          }
      }
    }

  private def validateOptions(spec: Formats.FormatSpec, options: Map[String, String]): Unit = {
    options.keys.find(k => !spec.validOptions.contains(k.toLowerCase)).foreach { k =>
      throw InvalidOptionException(
        s"invalid option `$k` for format `${spec.name}`; valid options: " +
          spec.validOptions.toSeq.sorted.mkString(", "))
    }
    spec.requiredOptions.find(r => !options.contains(r)).foreach { r =>
      throw InvalidOptionException(s"required option `$r` missing for format `${spec.name}`")
    }
  }

  /** Bucketed-layout round-trip: if the single attach path carries the
    * bucket-spec sidecar a bucketed COPY sink wrote (Sinks.BucketSidecar),
    * re-register the layout as a catalog table (`CREATE TABLE ... CLUSTERED
    * BY ... LOCATION`) and read THROUGH the catalog — the only channel Spark
    * carries bucket metadata on. Without this, re-attaching a bucketed path
    * in a fresh session silently reads plain parquet and every co-located
    * join pays its Exchanges back. */
  private def attachBucketed(spark: SparkSession, table: String,
      files: Seq[String]): Option[DataFrame] = {
    if (files.length != 1 || files.head.exists("*?[{".contains(_))) return None
    val sp = new org.apache.hadoop.fs.Path(files.head, Sinks.BucketSidecar)
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(sp)) return None
    val in = fs.open(sp)
    val node = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    finally in.close()
    val bucketCol = node.path("bucket_by").asText()
    val buckets = node.path("buckets").asInt()
    import scala.jdk.CollectionConverters._
    val sortCols = node.path("sort_by").elements().asScala.map(_.asText()).toSeq
    val partCols = node.path("partition_by").elements().asScala.map(_.asText()).toSeq
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(node.path("schema").toString).asInstanceOf[StructType]
    // the sidecar is a FILE FOUND AT THE DATA PATH — untrusted input. Its
    // column names must exist in its own declared schema (no smuggling DDL
    // through bucket_by), and every identifier/literal is escaped.
    def qid(c: String): String = "`" + c.replace("`", "``") + "`"
    val known = schema.fieldNames.toSet
    (Seq(bucketCol) ++ sortCols ++ partCols).find(!known.contains(_)).foreach { c =>
      throw InvalidOptionException(
        s"bucket-spec sidecar at `${files.head}` names column `$c` not present in " +
          "its own schema — corrupt or tampered sidecar; refusing to attach")
    }
    if (buckets <= 0) throw InvalidOptionException(
      s"bucket-spec sidecar at `${files.head}` declares $buckets buckets — corrupt sidecar")
    val sorted =
      if (sortCols.isEmpty) ""
      else s"SORTED BY (${sortCols.map(qid).mkString(", ")}) "
    val partitioned =
      if (partCols.isEmpty) ""
      else s"\nPARTITIONED BY (${partCols.map(qid).mkString(", ")})"
    // idempotent re-attach: the temp view from a previous attach shadows the
    // catalog table for DROP TABLE resolution — drop it explicitly first,
    // else DROP TABLE eats the view, CREATE TABLE hits the survivor and throws
    spark.catalog.dropTempView(table)
    // never clobber a PRE-EXISTING catalog table this attach flow did not
    // create: only drop when the existing table already points at the path
    // being attached (same layout, safe to re-register)
    if (spark.catalog.tableExists(table)) {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      // PathKeys: catalog URIs carry a scheme (`file:/...`), the attach
      // path usually does not — compare the scheme-free form of both
      val samePath = Option(meta.storage.locationUri).flatten.exists { uri =>
        graft.sources.PathKeys.key(uri.toString) ==
          graft.sources.PathKeys.key(files.head)
      }
      if (!samePath) throw InvalidOptionException(
        s"catalog already holds a table `$table` at a different location; " +
          "refusing to drop it to attach a bucketed layout — pick another name")
      spark.sql(s"DROP TABLE IF EXISTS ${qid(table)}")
    }
    spark.sql(
      s"""CREATE TABLE ${qid(table)} (${schema.toDDL})
         |USING PARQUET$partitioned
         |CLUSTERED BY (${qid(bucketCol)}) ${sorted}INTO $buckets BUCKETS
         |LOCATION '${files.head.replace("'", "''")}'""".stripMargin)
    // hive-partitioned layouts need partition discovery before any read
    if (partCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE ${qid(table)}")
    Some(spark.table(table))
  }

  private def readParquet(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    var r = spark.read.format("parquet")
    if (options.get("union_by_name").exists(_.toBoolean)) r = r.option("mergeSchema", "true")
    if (options.contains("binary_as_string"))
      r = r.option("binaryAsString", options("binary_as_string"))
    // hive_partitioning: Spark discovers hive-style partitions natively when
    // scanning a directory tree; `basePath` pins the partition root.
    options.get("hive_partitioning").foreach { on =>
      if (on.toBoolean && files.nonEmpty) r = r.option("basePath", partitionBase(files.head))
    }
    schema.foreach(s => r = r.schema(s))
    r.load(files: _*)
  }

  private def readOrc(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    var r = spark.read.format("orc")
    if (options.get("union_by_name").exists(_.toBoolean)) r = r.option("mergeSchema", "true")
    options.get("hive_partitioning").foreach { on =>
      if (on.toBoolean && files.nonEmpty) r = r.option("basePath", partitionBase(files.head))
    }
    schema.foreach(s => r = r.schema(s))
    r.load(files: _*)
  }

  /** Delta/Iceberg dispatch for jar-present deployments: a table ROOT path
    * handed to the connector's DataSource (reference reads one location,
    * src/fdw/delta.rs:41-61, src/duckdb/iceberg.rs:48-89). Format-specific
    * option keys are forwarded verbatim — the connector owns their
    * semantics. Reached only when the capability probe found the jars
    * (Formats.delta/iceberg `available`). */
  private def readConnector(spark: SparkSession, spec: Formats.FormatSpec,
      files: Seq[String], options: Map[String, String],
      schema: Option[StructType]): DataFrame = {
    if (files.length != 1) throw InvalidOptionException(
      s"${spec.name} attaches a single table root path; got ${files.length} paths")
    var r = spark.read.format(spec.name)
    schema.foreach(s => r = r.schema(s))
    (options -- Formats.commonOptions).foreach { case (k, v) => r = r.option(k, v) }
    r.load(files.head)
  }

  private def readCsv(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    import org.apache.spark.sql.types._
    var r = spark.read.format("csv")
    // hive_partitioning: same basePath pin as the parquet path, so globbed
    // CSV trees surface their partition columns (csv.rs hive_partitioning)
    options.get("hive_partitioning").foreach { on =>
      if (on.toBoolean && files.nonEmpty) r = r.option("basePath", partitionBase(files.head))
    }
    val direct = Seq(
      "delim" -> "sep", "quote" -> "quote", "escape" -> "escape", "header" -> "header",
      "nullstr" -> "nullValue", "dateformat" -> "dateFormat",
      "timestampformat" -> "timestampFormat",
      "new_line" -> "lineSep", "max_line_size" -> "maxCharsPerColumn")
    direct.foreach { case (from, to) => options.get(from).foreach(v => r = r.option(to, v)) }
    // null_padding=true (DuckDB default) pads short rows with NULLs — Spark's
    // PERMISSIVE mode. false makes short/long rows errors (FAILFAST), unless
    // ignore_errors drops them (csv.rs:129-203).
    val padding = options.get("null_padding").forall(_.toBoolean)
    if (options.get("ignore_errors").exists(_.toBoolean)) r = r.option("mode", "DROPMALFORMED")
    else if (!padding) r = r.option("mode", "FAILFAST")
    // allow_quoted_nulls=false: quoted empties must stay literal ''. Spark
    // nulls any token equal to nullValue after unquoting, so route unquoted
    // empties through a sentinel nullValue instead; quoted '' then survives
    // as the emptyValue. (With a custom non-empty nullstr the quoted/unquoted
    // distinction is lost post-parse — documented limitation.)
    if (options.get("allow_quoted_nulls").exists(v => !v.toBoolean) && !options.contains("nullstr"))
      r = r.option("nullValue", "\u0000").option("emptyValue", "")

    val allVarchar = options.get("all_varchar").exists(_.toBoolean)
    val autoDetect = options.get("auto_detect").forall(_.toBoolean) && !allVarchar
    // columns option: "name1:TYPE1,name2:TYPE2" declared types (DuckDB names)
    val declared = schema.orElse(options.get("columns").map(parseColumns))

    // decimal_separator ',' : Spark's parser only understands '.' — read the
    // declared decimal-ish columns as strings and re-cast after separator
    // translation (csv.rs:159-163). Needs declared types to know which.
    val decSep = options.get("decimal_separator").filter(_ != ".")
    if (decSep.isDefined && declared.isEmpty)
      throw InvalidOptionException("decimal_separator requires declared `columns` types")
    def isDecimalIsh(dt: DataType) = dt match {
      case DoubleType | FloatType | _: DecimalType => true; case _ => false
    }
    val readSchema = declared.map { s =>
      if (decSep.isEmpty) s
      else StructType(s.fields.map(f => if (isDecimalIsh(f.dataType)) f.copy(dataType = StringType) else f))
    }

    val skip = options.get("skip").map(_.toInt).getOrElse(0)
    // pre-sliced text has no file _metadata struct to index rows against
    if (skip > 0 && options.get("file_row_number").exists(_.toBoolean))
      throw InvalidOptionException("file_row_number is not supported together with skip > 0")
    // sample_size: rows used for schema inference (-1 = all, DuckDB default
    // 20480 rows; csv.rs:164-168). Bounded inference reads only a prefix —
    // at 100 TB inference must never scan the corpus.
    val sampleSize = options.get("sample_size").map(_.toInt).filter(_ > 0)
    val candidates = options.get("auto_type_candidates")
      .map(_.split(",").map(s => TypeMap.toSpark(s.trim)).toSet)

    val inferredSchema: Option[StructType] =
      if (readSchema.nonEmpty || !autoDetect) None
      else if (sampleSize.isEmpty && candidates.isEmpty) None // native full inference below
      else {
        import spark.implicits._
        val lines = spark.read.textFile(files: _*).limit(sampleSize.getOrElse(20480) + skip)
        val sliced = if (skip > 0) lines.as[String].rdd.zipWithIndex()
          .filter(_._2 >= skip).map(_._1) else lines.as[String].rdd
        val inferred = cloneCsvReader(spark, options).option("inferSchema", "true")
          .csv(spark.createDataset(sliced)).schema
        // auto_type_candidates: inference may only pick from the given types;
        // anything else falls back to VARCHAR (csv.rs:139-143).
        Some(candidates.map(cs => StructType(inferred.fields.map(f =>
          if (f.dataType == StringType || cs.contains(f.dataType)) f
          else f.copy(dataType = StringType)))).getOrElse(inferred))
      }

    val effective = readSchema.orElse(inferredSchema)
    r = r.option("inferSchema", (effective.isEmpty && autoDetect).toString)
    effective.foreach(s => r = r.option("inferSchema", "false").schema(s))

    var df =
      if (skip > 0 && !options.get("filename").exists(_.toBoolean)) {
        // DuckDB skips `skip` lines PER FILE (csv.rs:185-187); Spark has no
        // native skip-N. ONE distributed read covers every file (the old
        // per-file pre-slice issued 2 Spark jobs per file — a 10k-file attach
        // was 20k jobs): `_metadata.file_block_start == 0` marks rows from
        // each file's FIRST split, and rows within a partition arrive in file
        // order, so dropping the leading `skip` (+ header) rows of each
        // file-head run slices all files in a single pass. Bound: the skipped
        // prelude must fit in one file split (files.maxPartitionBytes) —
        // DuckDB's skip is a small prelude count, never data-scale.
        import spark.implicits._
        val hasHeader = options.get("header").exists(_.toBoolean)
        val target = skip + (if (hasHeader) 1 else 0)
        val sliced = spark.read.text(files: _*)
          .select(col("value"), col("_metadata.file_path").as("__fp"),
            col("_metadata.file_block_start").as("__bs"))
          .as[(String, String, Long)]
          .mapPartitions { it =>
            var cur: String = null
            var dropped = 0
            it.flatMap { case (v, fp, bs) =>
              if (fp != cur) { cur = fp; dropped = if (bs == 0L) 0 else target }
              if (dropped < target) { dropped += 1; Iterator.empty }
              else Iterator.single(v)
            }
          }
        val parsed = r.option("header", "false").csv(sliced) // headers pre-dropped
        if (hasHeader && effective.isEmpty) {
          // Column names come from the first file's header line — one bounded
          // look at one file, not a job per file.
          val headerLine = spark.read.textFile(files.head).limit(skip + 1).collect().last
          val names = cloneCsvReader(spark, options).option("header", "true")
            .csv(spark.createDataset(Seq(headerLine))).schema.fieldNames
          val use = (names ++ parsed.columns.drop(names.length)).take(parsed.columns.length)
          parsed.toDF(use: _*)
        } else parsed
      } else if (skip > 0 && !options.get("ignore_errors").exists(_.toBoolean)) {
        // filename=true rides the SAME one-pass run-slicing as above: the
        // file path travels next to each line and the parse happens per-row
        // via from_csv, so a 10k-file attach stays a bounded job count
        // (previously this combo regressed to 2 jobs per file).
        import spark.implicits._
        val hasHeader = options.get("header").exists(_.toBoolean)
        val target = skip + (if (hasHeader) 1 else 0)
        val sliced = spark.read.text(files: _*)
          .select(col("value"), col("_metadata.file_path").as("__fp"),
            col("_metadata.file_block_start").as("__bs"))
          .as[(String, String, Long)]
          .mapPartitions { it =>
            var cur: String = null
            var dropped = 0
            it.flatMap { case (v, fp, bs) =>
              if (fp != cur) { cur = fp; dropped = if (bs == 0L) 0 else target }
              if (dropped < target) { dropped += 1; Iterator.empty }
              else Iterator.single((v, fp))
            }
          }
          .toDF("value", "__file_path")
          // local URIs back to the bare attach path ("file:///x" → "/x"),
          // matching what the per-file path reported
          .withColumn("__file_path", regexp_replace(col("__file_path"), "^file:/+", "/"))
        // schema: declared, else ONE bounded inference over the sliced lines
        val parseSchema = effective.getOrElse {
          cloneCsvReader(spark, options).option("header", "false")
            .option("inferSchema", "true")
            .csv(sliced.select("value").as[String].limit(sampleSize.getOrElse(20480)))
            .schema
        }
        // from_csv mirrors the reader's parse-shape options; headers are
        // pre-dropped by the slicer. DROPMALFORMED has no from_csv
        // equivalent — that combo keeps the legacy per-file path below.
        val fcOpts = scala.collection.mutable.LinkedHashMap("header" -> "false")
        Seq("delim" -> "sep", "quote" -> "quote", "escape" -> "escape",
          "nullstr" -> "nullValue", "dateformat" -> "dateFormat",
          "timestampformat" -> "timestampFormat", "new_line" -> "lineSep",
          "max_line_size" -> "maxCharsPerColumn")
          .foreach { case (from, to) => options.get(from).foreach(v => fcOpts(to) = v) }
        if (!options.get("null_padding").forall(_.toBoolean)) fcOpts("mode") = "FAILFAST"
        if (options.get("allow_quoted_nulls").exists(v => !v.toBoolean) &&
          !options.contains("nullstr")) {
          fcOpts("nullValue") = "\u0000"; fcOpts("emptyValue") = ""
        }
        val flat = sliced
          .select(from_csv(col("value"), parseSchema, fcOpts.toMap).as("__row"),
            col("__file_path"))
          .select(parseSchema.fieldNames.map(n => col(s"__row.`$n`")).toSeq
            :+ col("__file_path"): _*)
        if (hasHeader && effective.isEmpty) {
          val headerLine = spark.read.textFile(files.head).limit(skip + 1).collect().last
          val names = cloneCsvReader(spark, options).option("header", "true")
            .csv(spark.createDataset(Seq(headerLine))).schema.fieldNames
          val dataCols = flat.columns.dropRight(1)
          val use = (names ++ dataCols.drop(names.length)).take(dataCols.length) :+ "__file_path"
          flat.toDF(use: _*)
        } else flat
      } else if (skip > 0) {
        // skip + filename + ignore_errors: DROPMALFORMED cannot be expressed
        // through from_csv — keep the per-file slice for this triple combo
        // only (attach-time cost O(files), documented).
        import spark.implicits._
        def sliced(f: String) = spark.createDataset(
          spark.read.textFile(f).rdd.zipWithIndex().filter(_._2 >= skip).map(_._1))
        val first = r.csv(sliced(files.head)).withColumn("__file_path", lit(files.head))
        val rest = files.tail.map { f =>
          // pin the remaining files to the first file's inferred schema so
          // the union never sees per-file inference drift
          r.schema(first.schema.fields.filter(_.name != "__file_path")
            .foldLeft(new StructType)((s, fld) => s.add(fld)))
            .option("inferSchema", "false")
            .csv(sliced(f)).withColumn("__file_path", lit(f))
        }
        (first +: rest).reduce(_ unionByName _)
      } else if (options.get("union_by_name").exists(_.toBoolean)) {
        // CSV is positional: multi-file reads align columns by POSITION
        // unless union_by_name asks for name alignment across differing
        // schemas (csv.rs union_by_name) — read per file, union by name.
        val parts = files.map(f => r.load(f))
        parts.reduce(_ unionByName (_, allowMissingColumns = true))
      } else r.load(files: _*)

    // Post-read option semantics, in reference order:
    decSep.foreach { sep =>
      declared.get.fields.filter(f => isDecimalIsh(f.dataType)).foreach { f =>
        df = df.withColumn(f.name,
          regexp_replace(col(f.name), java.util.regex.Pattern.quote(sep), ".").cast(f.dataType))
      }
    }
    // allow_quoted_nulls (csv.rs:129-133): DuckDB's default TRUE — a quoted
    // null-string reads as NULL — is also Spark's behavior (nullValue matches
    // after unquoting). FALSE must keep quoted empties literal: see the
    // sentinel nullValue set before the read above.
    // force_not_null: listed columns never convert nullstr → NULL; a parsed
    // NULL reverts to the literal null-string (csv.rs:147-151).
    options.get("force_not_null").foreach { cols =>
      val nullstr = options.getOrElse("nullstr", "")
      cols.split(",").map(_.trim).filter(_.nonEmpty).foreach { c =>
        df = df.withColumn(c, coalesce(col(c), lit(nullstr)))
      }
    }
    if (options.get("normalize_names").exists(_.toBoolean))
      df = df.toDF(df.columns.map(c => if (c == "__file_path") c else normalizeName(c)): _*)
    options.get("names").foreach { names =>
      val ns = names.split(",").map(_.trim)
      df = df.toDF(df.columns.zipWithIndex.map { case (c, i) =>
        if (i < ns.length) ns(i) else c }: _*)
    }
    // types: per-column type OVERRIDES on top of inference ("name:TYPE,...",
    // csv.rs:152-158) — cast after read, names resolved post-rename.
    options.get("types").foreach { spec =>
      parseColumns(spec).fields.foreach { f =>
        df = df.withColumn(f.name, col(f.name).cast(f.dataType))
      }
    }
    // parallel=false: single-stream read (DuckDB's single-threaded CSV mode).
    if (options.get("parallel").exists(v => !v.toBoolean)) df = df.coalesce(1)
    df
  }

  /** A fresh CSV reader carrying only the parse-shape options — used for
    * bounded sample inference so the sample parses exactly like the real read. */
  private def cloneCsvReader(spark: SparkSession, options: Map[String, String]) = {
    var r = spark.read.format("csv")
    Seq("delim" -> "sep", "quote" -> "quote", "escape" -> "escape", "header" -> "header",
      "nullstr" -> "nullValue", "dateformat" -> "dateFormat",
      "timestampformat" -> "timestampFormat")
      .foreach { case (from, to) => options.get(from).foreach(v => r = r.option(to, v)) }
    r
  }

  private def readJson(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    import org.apache.spark.sql.types._
    // records=false: values are NOT unpacked into columns — each top-level
    // value lands in a single column named `json` (json.rs:43-49).
    if (options.get("records").exists(v => v.toLowerCase == "false")) {
      return spark.read.textFile(files: _*).toDF("json")
    }
    var r = spark.read.format("json")
    // hive_partitioning: same basePath pin as the parquet path
    options.get("hive_partitioning").foreach { on =>
      if (on.toBoolean && files.nonEmpty) r = r.option("basePath", partitionBase(files.head))
    }
    // format: newline_delimited (default) | array | auto | unstructured —
    // everything except NDJSON may span lines, so those parse per-file
    val fmt = options.getOrElse("format", "newline_delimited")
    if (fmt == "array" || fmt == "auto" || fmt == "unstructured")
      r = r.option("multiLine", "true")
    val direct = Seq("dateformat" -> "dateFormat", "timestampformat" -> "timestampFormat")
    direct.foreach { case (from, to) => options.get(from).foreach(v => r = r.option(to, v)) }
    if (options.get("ignore_errors").exists(_.toBoolean)) r = r.option("mode", "DROPMALFORMED")

    val declared = schema.orElse(options.get("columns").map(parseColumns))
    // auto_detect=false turns schema detection OFF — the columns must be
    // declared (json.rs: read_json without detection needs explicit columns).
    if (options.get("auto_detect").exists(v => !v.toBoolean) && declared.isEmpty)
      throw InvalidOptionException(
        "auto_detect 'false' requires declared `columns` types for format `json`")
    // sample_size: rows used for schema inference (json.rs:50-59 bounded
    // sample). At 100 TB inference must never scan the corpus — infer from a
    // line-prefix sample. Only NDJSON can be prefix-sampled by line; for
    // multi-line formats the option errors rather than silently scanning all.
    val sampleSize = options.get("sample_size").map(_.toInt).filter(_ > 0)
    if (sampleSize.isDefined && declared.isEmpty && fmt != "newline_delimited")
      throw InvalidOptionException(
        s"sample_size inference requires format 'newline_delimited', got '$fmt'")
    val sampled: Option[StructType] = if (declared.isDefined) None else sampleSize.map { n =>
      var sr = spark.read
      direct.foreach { case (from, to) => options.get(from).foreach(v => sr = sr.option(to, v)) }
      sr.json(spark.read.textFile(files: _*).limit(n))
        .schema
    }
    // maximum_depth: nesting levels the schema detector descends; deeper
    // subtrees stay raw JSON text (json.rs:60-64). Spark's Jackson parser
    // reads an object/array into a StringType field as its raw JSON, so this
    // is pure schema surgery on the inferred schema.
    val maxDepth = options.get("maximum_depth").map(_.toInt).filter(_ >= 0)
    val effective: Option[StructType] = declared.orElse {
      (sampled, maxDepth) match {
        case (Some(s), Some(d)) => Some(truncateDepth(s, d))
        case (Some(s), None) => Some(s)
        case (None, Some(d)) => Some(truncateDepth(r.load(files: _*).schema, d))
        case (None, None) => None
      }
    }
    effective.foreach(s => r = r.schema(s))
    var df = r.load(files: _*)
    // convert_strings_to_integers=true: quoted "123" reads as BIGINT
    // (json.rs:55-59). Jackson won't coerce a JSON string into a long field,
    // so detect integral string columns on a bounded sample and cast after.
    if (options.get("convert_strings_to_integers").exists(_.toBoolean))
      df = integerizeStrings(df)
    df
  }

  /** Cut a schema at `depth` nesting levels: structs/arrays deeper than the
    * limit read as raw JSON strings. depth=0 → everything is one string. */
  private[catalog] def truncateDepth(s: StructType, depth: Int): StructType = {
    import org.apache.spark.sql.types._
    def cut(dt: DataType, remaining: Int): DataType = dt match {
      case st: StructType =>
        if (remaining <= 0) StringType
        else StructType(st.fields.map(f => f.copy(dataType = cut(f.dataType, remaining - 1))))
      case ArrayType(et, n) =>
        if (remaining <= 0) StringType else ArrayType(cut(et, remaining), n)
      case other => other
    }
    cut(s, depth) match {
      case st: StructType => st
      case _ => StructType(Seq(org.apache.spark.sql.types.StructField("json", org.apache.spark.sql.types.StringType)))
    }
  }

  /** Top-level string columns whose values look integral are cast to BIGINT.
    * The DECISION comes from a bounded sample (first `sampleRows` rows) so
    * attach never scans the corpus — at the 100 TB design point an attach
    * option must not trigger a full-column aggregate. EXACTNESS is kept by
    * the cast expression itself: a later value that is not a bounded integer
    * literal raises a loud error at scan time instead of silently casting to
    * NULL (the corruption a bare sample-then-cast would cause). Digits are
    * bounded to 18 so values beyond Long range keep the column a string
    * (sample) or error loudly (post-sample) rather than overflow to NULL.
    * The reference leaves non-conforming columns as strings; so does this
    * whenever the sample shows the mix. */
  private[graft] def integerizeStrings(df: DataFrame, sampleRows: Int = 20480): DataFrame = {
    import org.apache.spark.sql.types._
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.isEmpty) return df
    val intRe = "^[+-]?\\d{1,18}$"
    val checks = strCols.map(c =>
      min(when(col(c).isNull || col(c).rlike(intRe), 1).otherwise(0)).as(c))
    val row = df.select(strCols.map(col): _*).limit(sampleRows)
      .agg(checks.head, checks.tail: _*).collect()(0)
    val integral = strCols.zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) && row.getInt(i) == 1 => c
    }
    integral.foldLeft(df)((d, c) => d.withColumn(c,
      when(col(c).isNull, lit(null).cast(LongType))
        .when(col(c).rlike(intRe), col(c).cast(LongType))
        .otherwise(raise_error(concat(
          lit(s"convert_strings_to_integers: non-integral value in column `$c`: "),
          col(c))).cast(LongType))))
  }

  /** "name1:TYPE1,name2:TYPE2" (DuckDB type names) → StructType. */
  def parseColumns(spec: String): StructType = {
    val fields = spec.split(",").map(_.trim).filter(_.nonEmpty).map { entry =>
      val Array(n, t) = entry.split(":", 2).map(_.trim)
      org.apache.spark.sql.types.StructField(n, TypeMap.toSpark(t))
    }
    StructType(fields)
  }

  private def withMetadataColumns(df: DataFrame, options: Map[String, String]): DataFrame = {
    var out = df
    val preSliced = df.columns.contains("__file_path") // csv skip>0 path
    if (options.get("filename").exists(_.toBoolean))
      out = out.withColumn("filename",
        if (preSliced) col("__file_path") else col("_metadata.file_path"))
    if (options.get("file_row_number").exists(_.toBoolean)) {
      if (preSliced) throw InvalidOptionException(
        "file_row_number is not supported together with skip > 0")
      out = out.withColumn("file_row_number", col("_metadata.row_index"))
    }
    if (preSliced) out = out.drop("__file_path")
    out
  }

  /** Column names fold to lowercase unless preserve_casing
    * (reference: src/fdw/trigger.rs:184-189). */
  private def withCasing(df: DataFrame, options: Map[String, String]): DataFrame =
    if (options.get("preserve_casing").exists(_.toBoolean)) df
    else df.toDF(df.columns.map(_.toLowerCase): _*)

  private def normalizeName(n: String): String =
    n.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_+|_+$", "")

  private def partitionBase(path: String): String = {
    // strip trailing glob/partition components to find the scan root
    val noGlob = path.takeWhile(c => c != '*' && c != '?')
    val idx = noGlob.lastIndexOf('/')
    if (idx > 0) noGlob.substring(0, idx) else noGlob
  }
}
