package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native GeoPackage driver — `.gpkg` feature tables → DataFrame with the
  * attributes as columns and the geometry as a WKB `geom` binary column,
  * the same output contract as the GeoJSON and Shapefile sources. Built
  * from the PUBLIC OGC GeoPackage Encoding Standard (geometry blob §2.1.3,
  * required tables §1.1.2-3) over [[SqliteFile]]'s container parse; the
  * reference reaches `.gpkg` through GDAL's driver surface
  * (src/duckdb/spatial.rs:29-82, driver "GPKG").
  *
  * Unlike .shp/.geojson, layers live INSIDE the file: `gpkg_contents` rows
  * with `data_type='features'`. `layer=<table>` selects one; a
  * multi-feature-table package without `layer` rejects loudly listing the
  * names (opening the first table silently would drop data).
  *
  * Scale shape: one file = one task (SQLite has no record-level split
  * point), many files parallelize — the Shapefile contract. The driver
  * reads only the FIRST file (schema); row parsing runs in executors.
  */
object GeoPackage {

  final case class GeoPackageException(msg: String) extends IllegalArgumentException(msg)

  /** GPKG pins the SQLite application_id to "GPKG". */
  val AppId: Int = 0x47504b47
  /** user_version 10300 = GeoPackage 1.3.0. */
  val UserVersion: Int = 10300

  // ------------------------------------------------------------------ read

  def read(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw GeoPackageException("geopackage attach needs at least one .gpkg path")
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[String] = paths.flatMap { p =>
      if (p.exists("*?[{".contains(_))) {
        val hp = new Path(p)
        val matched = Option(hp.getFileSystem(conf).globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw GeoPackageException(s"glob `$p` matches no geopackages")
        matched.map(_.getPath.toString)
      } else Seq(p)
    }
    // schema from the FIRST file (bounded driver read); every other file is
    // checked against it in its executor task — union-by-position over
    // diverging layers would silently misalign columns
    val db0 = openFile(conf, files.head)
    val layer = resolveLayer(db0, options.get("layer"), files.head)
    val schema = layerSchema(db0, layer, files.head)

    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val layerName = layer
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        val db = openFile(c, f)
        val sch = layerSchema(db, layerName, f)
        if (sch != schema) throw GeoPackageException(
          s"geopackage `$f` layer `$layerName` has a different schema; attach it separately")
        parseLayer(db, layerName, schema, f)
      }
    spark.createDataFrame(rows, schema)
  }

  private def openFile(conf: Configuration, path: String): SqliteFile.Db = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw GeoPackageException(s"geopackage `$path` does not exist")
    // WAL mode is already rejected by the header check; a straggler -wal
    // file next to a checkpointed db is harmless, but a -journal file means
    // a torn transaction whose rollback we cannot apply
    val journal = new Path(path + "-journal")
    if (fs.exists(journal) && fs.getFileStatus(journal).getLen > 0)
      throw GeoPackageException(
        s"`$path` has a non-empty rollback journal (a torn write); recover it first")
    val len = fs.getFileStatus(p).getLen
    if (len > Int.MaxValue.toLong) throw GeoPackageException(
      s"`$path` exceeds 2 GiB; split the dataset into multiple packages " +
        "(one file is one task — larger monoliths would not parallelize anyway)")
    val in = fs.open(p)
    val bytes = new Array[Byte](len.toInt)
    try in.readFully(bytes) finally in.close()
    try SqliteFile.open(bytes)
    catch { case e: SqliteFile.SqliteException =>
      throw GeoPackageException(s"`$path`: ${e.msg}")
    }
  }

  /** Feature tables = gpkg_contents rows with data_type='features'. */
  def featureTables(db: SqliteFile.Db): Seq[String] = {
    val contents = db.master.find(m => m.typ == "table" && m.name == "gpkg_contents")
      .getOrElse(throw GeoPackageException(
        "no gpkg_contents table — a SQLite database, but not a GeoPackage"))
    val cols = parseCreate(contents.sql).map(_.name)
    val iName = cols.indexOf("table_name")
    val iType = cols.indexOf("data_type")
    if (iName < 0 || iType < 0) throw GeoPackageException(
      "gpkg_contents lacks table_name/data_type columns")
    SqliteFile.tableRows(db, contents.rootPage)
      .map { case (_, vals) => padTo(vals, cols.length) }
      .collect { case vals if vals(iType) == "features" => vals(iName).toString }
  }

  private def resolveLayer(db: SqliteFile.Db, layerOpt: Option[String], path: String): String = {
    val feats = featureTables(db)
    layerOpt match {
      case Some(l) =>
        if (!feats.contains(l)) throw GeoPackageException(
          s"`$path` has no feature table `$l`; available: ${feats.sorted.mkString(", ")}")
        l
      case None =>
        if (feats.isEmpty) throw GeoPackageException(s"`$path` declares no feature tables")
        if (feats.size > 1) throw GeoPackageException(
          s"`$path` holds ${feats.size} feature tables " +
            s"(${feats.sorted.mkString(", ")}); select one with layer=<name>")
        feats.head
    }
  }

  /** The geometry column of `table` per gpkg_geometry_columns. */
  private def geometryColumn(db: SqliteFile.Db, table: String): String = {
    val gc = db.master.find(m => m.typ == "table" && m.name == "gpkg_geometry_columns")
      .getOrElse(throw GeoPackageException(
        "no gpkg_geometry_columns table — a SQLite database, but not a GeoPackage"))
    val cols = parseCreate(gc.sql).map(_.name)
    val iTab = cols.indexOf("table_name")
    val iCol = cols.indexOf("column_name")
    SqliteFile.tableRows(db, gc.rootPage)
      .map { case (_, vals) => padTo(vals, cols.length) }
      .collectFirst { case vals if vals(iTab) == table => vals(iCol).toString }
      .getOrElse(throw GeoPackageException(
        s"feature table `$table` has no gpkg_geometry_columns row"))
  }

  /** Schema format 4 trims trailing NULL columns from records. */
  private def padTo(vals: Array[Any], n: Int): Array[Any] =
    if (vals.length >= n) vals else vals ++ Array.fill[Any](n - vals.length)(null)

  /** One parsed column of a CREATE TABLE statement. */
  final case class ColDef(name: String, declType: String, pkAlias: Boolean)

  /** Parse the column list out of a CREATE TABLE statement — names,
    * declared types, and the INTEGER-PRIMARY-KEY rowid alias. Table-level
    * constraints are skipped; generated/virtual columns reject loudly
    * (their values are not in the record). */
  def parseCreate(sql: String): Seq[ColDef] = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    if (open < 0 || close <= open)
      throw GeoPackageException(s"cannot parse CREATE TABLE: $sql")
    val body = sql.substring(open + 1, close)
    // split on top-level commas (quotes + nested parens respected)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var q: Char = 0
    body.foreach { ch =>
      if (q != 0) { if (ch == q) q = 0; cur += ch }
      else ch match {
        case '\'' | '"' | '`' => q = ch; cur += ch
        case '[' => q = ']'; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) parts += cur.toString
    val tableConstraint = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    parts.toSeq.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val (name, rest) =
        if ("\"`'".contains(p.head)) {
          val end = p.indexOf(p.head, 1)
          (p.substring(1, end), p.substring(end + 1))
        } else if (p.head == '[') {
          val end = p.indexOf(']')
          (p.substring(1, end), p.substring(end + 1))
        } else {
          val end = p.indexWhere(c => c.isWhitespace)
          if (end < 0) (p, "") else (p.take(end), p.drop(end))
        }
      if (tableConstraint.contains(name.toUpperCase)) None
      else {
        val restU = rest.trim.toUpperCase
        if (restU.contains("GENERATED ") || restU.contains(" AS ("))
          throw GeoPackageException(
            s"column `$name` is generated; the native reader decodes stored records only")
        val stop = Seq(" NOT NULL", " PRIMARY KEY", " DEFAULT ", " UNIQUE", " REFERENCES ",
          " CHECK", " COLLATE ", " AUTOINCREMENT")
        val typEnd = stop.map(restU.indexOf).filter(_ >= 0).sorted.headOption.getOrElse(restU.length)
        val declType = restU.take(typEnd).trim
        val pkAlias = declType == "INTEGER" && restU.contains("PRIMARY KEY")
        Some(ColDef(name, declType, pkAlias))
      }
    }
  }

  /** GPKG declared type → Spark type (Encoding Standard table 1 + the
    * geometry type names; affinity fallbacks cover GDAL's occasional
    * parameterized TEXT(n)/BLOB(n)). */
  def sparkType(decl: String, col: String): DataType = {
    val d = decl.takeWhile(_ != '(').trim
    d match {
      case "BOOLEAN" => BooleanType
      case "TINYINT" | "SMALLINT" | "MEDIUMINT" | "INT" | "INTEGER" | "BIGINT" |
           "INT2" | "INT4" | "INT8" => LongType
      case "FLOAT" | "DOUBLE" | "REAL" => DoubleType
      case "TEXT" | "VARCHAR" | "CHAR" | "CLOB" => StringType
      case "BLOB" | "" => BinaryType
      case "DATE" => DateType
      case "DATETIME" => TimestampType
      case "GEOMETRY" | "POINT" | "LINESTRING" | "POLYGON" | "MULTIPOINT" |
           "MULTILINESTRING" | "MULTIPOLYGON" | "GEOMETRYCOLLECTION" |
           "CIRCULARSTRING" | "COMPOUNDCURVE" | "CURVEPOLYGON" | "MULTICURVE" |
           "MULTISURFACE" | "CURVE" | "SURFACE" => BinaryType
      case other => throw GeoPackageException(
        s"column `$col` has declared type `$other` the GPKG profile does not define")
    }
  }

  /** The attach schema of a layer: attribute columns in declared order with
    * the geometry column delivered as WKB under the contract name `geom`. */
  private def layerSchema(db: SqliteFile.Db, table: String, path: String): StructType = {
    val m = db.master.find(m => m.typ == "table" && m.name == table)
      .getOrElse(throw GeoPackageException(s"`$path` has no table `$table`"))
    val gcol = geometryColumn(db, table)
    val cols = parseCreate(m.sql)
    if (!cols.exists(_.name == gcol)) throw GeoPackageException(
      s"geometry column `$gcol` not found in table `$table`")
    if (gcol != "geom" && cols.exists(_.name == "geom")) throw GeoPackageException(
      s"table `$table` has both a geometry column `$gcol` and an attribute named " +
        "`geom`; the attach contract reserves `geom` for the WKB geometry")
    StructType(cols.map { c =>
      if (c.name == gcol) StructField("geom", BinaryType)
      else StructField(c.name, sparkType(c.declType, c.name))
    })
  }

  private def parseLayer(db: SqliteFile.Db, table: String, schema: StructType,
      path: String): Seq[Row] = {
    val m = db.master.find(m => m.typ == "table" && m.name == table).get
    val cols = parseCreate(m.sql)
    val gcol = geometryColumn(db, table)
    val pkIdx = cols.indexWhere(_.pkAlias)
    SqliteFile.tableRows(db, m.rootPage).map { case (rowid, vals0) =>
      val vals = padTo(vals0, cols.length)
      val out = new Array[Any](cols.length)
      var i = 0
      while (i < cols.length) {
        val c = cols(i)
        val raw = if (i == pkIdx) java.lang.Long.valueOf(rowid) else vals(i)
        out(i) =
          if (raw == null) null
          else if (c.name == gcol) gpbToWkb(raw match {
            case b: Array[Byte] => b
            case other => throw GeoPackageException(
              s"$path: geometry column `$gcol` holds ${other.getClass.getSimpleName}, not a blob")
          })
          else coerce(raw, schema(i).dataType, c.name, path)
        i += 1
      }
      Row.fromSeq(out.toIndexedSeq)
    }
  }

  private def coerce(raw: Any, t: DataType, col: String, path: String): Any = (t, raw) match {
    case (LongType, l: java.lang.Long) => l
    case (BooleanType, l: java.lang.Long) => java.lang.Boolean.valueOf(l.longValue != 0L)
    case (DoubleType, d: java.lang.Double) => d
    // integral REALs may be stored with an integer serial type
    case (DoubleType, l: java.lang.Long) => java.lang.Double.valueOf(l.longValue.toDouble)
    case (StringType, s: String) => s
    case (BinaryType, b: Array[Byte]) => b
    case (DateType, s: String) =>
      try java.sql.Date.valueOf(s)
      catch { case _: IllegalArgumentException =>
        throw GeoPackageException(s"$path: column `$col`: `$s` is not an ISO-8601 DATE")
      }
    case (TimestampType, s: String) => java.sql.Timestamp.from(parseInstant(s, col, path))
    case (_, other) => throw GeoPackageException(
      s"$path: column `$col` declared ${t.simpleString} holds " +
        s"${other.getClass.getSimpleName} `$other` — a misdeclared layer")
  }

  /** GPKG DATETIME text: ISO-8601 UTC, `T` or space separator, optional
    * fraction, optional trailing Z. */
  private def parseInstant(s: String, col: String, path: String): java.time.Instant = {
    val norm0 = s.trim.replace(' ', 'T').stripSuffix("Z")
    val norm = if (norm0.length == 16) norm0 + ":00" else norm0 // minute precision
    try java.time.LocalDateTime.parse(norm).toInstant(java.time.ZoneOffset.UTC)
    catch { case _: java.time.format.DateTimeParseException =>
      throw GeoPackageException(s"$path: column `$col`: `$s` is not an ISO-8601 DATETIME")
    }
  }

  // ------------------------------------------------- GPB geometry blobs

  /** GeoPackage geometry blob → the WKB it wraps (standard §2.1.3: magic
    * `GP`, version, flags, srs_id, optional envelope, then ISO WKB). */
  def gpbToWkb(blob: Array[Byte]): Array[Byte] = {
    if (blob.length < 8 || blob(0) != 'G' || blob(1) != 'P')
      throw GeoPackageException("geometry blob does not start with the GP magic")
    if ((blob(2) & 0xff) > 0)
      throw GeoPackageException(s"geometry blob version ${blob(2) & 0xff} > 0 unsupported")
    val flags = blob(3) & 0xff
    if ((flags & 0x20) != 0)
      throw GeoPackageException("ExtendedGeoPackageBinary geometries are vendor-defined; " +
        "the native reader decodes the standard encoding only")
    val envBytes = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case n => throw GeoPackageException(s"invalid envelope contents indicator $n")
    }
    val hdr = 8 + envBytes
    if (blob.length < hdr) throw GeoPackageException("geometry blob shorter than its header")
    java.util.Arrays.copyOfRange(blob, hdr, blob.length)
  }

  /** WKB → GeoPackage geometry blob (little-endian header, no envelope —
    * indicator 0 is spec-valid and keeps the write bit-deterministic). */
  def wkbToGpb(wkb: Array[Byte], srsId: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0x01.toByte)
    out.putInt(srsId)
    out.put(wkb)
    out.array()
  }

  // ----------------------------------------------------------------- write

  /** `COPY ... TO 'file.gpkg' (FORMAT gpkg)` — serialize a DataFrame as a
    * single-layer GeoPackage. A `.gpkg` is ONE SQLite file, so this is a
    * driver-side single-file sink (the same shape as the reference's COPY
    * into one file); the row guard keeps it honest — beyond it, write
    * parquet/delta instead and let the lakehouse do scale.
    *
    * Options: `layer` (table name, default file basename), `geom_column`
    * (default `geom`; must be BINARY WKB), `geometry_type` (declared OGC
    * name, default GEOMETRY), `srs_id` (default 4326), `max_rows` (guard,
    * default 1,000,000). */
  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    val known = Set("layer", "geom_column", "geometry_type", "srs_id", "max_rows", "overwrite")
    options.keys.find(k => !known.contains(k.toLowerCase)).foreach { k =>
      throw GeoPackageException(
        s"invalid gpkg COPY option `$k`; valid options: ${known.toSeq.sorted.mkString(", ")}")
    }
    val fileName = new Path(path).getName
    val layer = options.getOrElse("layer",
      fileName.stripSuffix(".gpkg").stripSuffix(".GPKG"))
    val geomCol = options.getOrElse("geom_column", "geom")
    val geomType = options.getOrElse("geometry_type", "GEOMETRY").toUpperCase
    val srsId = options.getOrElse("srs_id", "4326").toInt
    val maxRows = options.getOrElse("max_rows", "1000000").toLong
    val schema = df.schema
    if (!schema.fieldNames.contains(geomCol)) throw GeoPackageException(
      s"gpkg COPY: no geometry column `$geomCol` in the result " +
        s"(columns: ${schema.fieldNames.mkString(", ")}); set geom_column=<name>")
    if (schema(geomCol).dataType != BinaryType) throw GeoPackageException(
      s"gpkg COPY: geometry column `$geomCol` must be BINARY wkb, " +
        s"got ${schema(geomCol).dataType.simpleString}")
    if (schema.fieldNames.contains("fid")) throw GeoPackageException(
      "gpkg COPY: the result already has an `fid` column; the writer emits " +
        "fid as the rowid primary key — rename or drop it")
    val n = df.count()
    if (n > maxRows) throw GeoPackageException(
      s"gpkg COPY: $n rows exceed max_rows=$maxRows — a .gpkg is one SQLite " +
        "file written on the driver; use parquet/delta/iceberg for results this size")

    def declOf(f: StructField): String = f.dataType match {
      case LongType | IntegerType | ShortType | ByteType => "INTEGER"
      case DoubleType | FloatType => "DOUBLE"
      case StringType => "TEXT"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BLOB"
      case DateType => "DATE"
      case TimestampType => "DATETIME"
      case other => throw GeoPackageException(
        s"gpkg COPY: column `${f.name}` has type ${other.simpleString} the GPKG " +
          "profile does not define; cast it first")
    }
    val attrs = schema.fields.toSeq.filter(_.name != geomCol)
    val createSql =
      s"""CREATE TABLE "$layer" ("fid" INTEGER PRIMARY KEY, """ +
        attrs.map(f => s""""${f.name}" ${declOf(f)}""").mkString(", ") +
        s""", "$geomCol" $geomType)"""
    val tsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(java.time.ZoneOffset.UTC)
    val collected = df.collect()
    val featureRows: Seq[Seq[Any]] = collected.toSeq.zipWithIndex.map { case (r, i) =>
      val fid = java.lang.Long.valueOf(i + 1L)
      val attrVals = attrs.map { f =>
        val v = r.get(r.fieldIndex(f.name))
        if (v == null) null
        else f.dataType match {
          case IntegerType => v.asInstanceOf[Int].toLong
          case ShortType => v.asInstanceOf[Short].toLong
          case ByteType => v.asInstanceOf[Byte].toLong
          case FloatType => v.asInstanceOf[Float].toDouble
          case DateType => v.toString // yyyy-MM-dd
          case TimestampType => tsFmt.format(v.asInstanceOf[java.sql.Timestamp].toInstant)
          case _ => v
        }
      }
      val wkb = r.get(r.fieldIndex(geomCol))
      val geom = if (wkb == null) null else wkbToGpb(wkb.asInstanceOf[Array[Byte]], srsId)
      (fid +: attrVals) :+ geom
    }

    val fixedTs = "2026-01-01T00:00:00.000Z" // deterministic: re-COPY is bit-identical
    val srsRows: Seq[Seq[Any]] = Seq(
      Seq("WGS 84 geodetic", 4326L, "EPSG", 4326L,
        "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]]]",
        "longitude/latitude in decimal degrees"),
      Seq("Undefined cartesian SRS", -1L, "NONE", -1L, "undefined", "undefined cartesian"),
      Seq("Undefined geographic SRS", 0L, "NONE", 0L, "undefined", "undefined geographic"))
    val tables = Seq(
      SqliteFile.WriteTable("gpkg_spatial_ref_sys",
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER " +
          "NOT NULL PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id " +
          "INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)",
        6, None, srsRows),
      SqliteFile.WriteTable("gpkg_contents",
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type " +
          "TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', " +
          "last_change DATETIME NOT NULL, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, " +
          "max_y DOUBLE, srs_id INTEGER)",
        10, None,
        Seq(Seq(layer, "features", layer, "", fixedTs, null, null, null, null, srsId.toLong))),
      SqliteFile.WriteTable("gpkg_geometry_columns",
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name " +
          "TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, " +
          "z TINYINT NOT NULL, m TINYINT NOT NULL, PRIMARY KEY (table_name, column_name))",
        6, None, Seq(Seq(layer, geomCol, geomType, srsId.toLong, 0L, 0L))),
      SqliteFile.WriteTable(layer, createSql, 2 + attrs.length, Some(0), featureRows))
    val bytes = SqliteFile.write(tables, AppId, UserVersion)

    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(p) && !options.get("overwrite").forall(_.toBoolean))
      throw GeoPackageException(s"`$path` exists; pass overwrite=true to replace it")
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }
}
