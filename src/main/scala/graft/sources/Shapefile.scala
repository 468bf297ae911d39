package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native ESRI Shapefile source — `.shp` geometry + companion `.dbf`
  * attributes → DataFrame with the attributes as columns and the geometry
  * as a WKB `geom` binary column, the same output contract as the GeoJSON
  * source. Built from the PUBLIC ESRI Shapefile Technical Description and
  * the dBASE III/IV header layout; the reference reaches shapefiles through
  * GDAL's driver surface (src/duckdb/spatial.rs:29-82) — this covers the
  * overwhelmingly-common subset natively: Point, MultiPoint, PolyLine,
  * Polygon (with ring-orientation outer/hole grouping), attribute types
  * C/N/F/L/D. Z/M shape kinds reject loudly rather than silently dropping
  * coordinates.
  *
  * Scale shape: the format itself caps a .shp at 2 GiB (32-bit 16-bit-word
  * offsets), so per-FILE work is bounded by construction; parsing runs in
  * EXECUTORS (one task per shapefile, many files parallelize) with only
  * the .dbf schema header read on the driver.
  */
object Shapefile {

  final case class ShapefileException(msg: String) extends IllegalArgumentException(msg)

  /** dBASE field descriptor. */
  private final case class DbfField(name: String, typ: Char, length: Int, decimals: Int)

  def read(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw ShapefileException("shapefile attach needs at least one .shp path")
    val conf = spark.sessionState.newHadoopConf()
    // expand globs (dir/*.shp) the way the other attach formats do
    val files: Seq[String] = paths.flatMap { p =>
      if (p.exists("*?[{".contains(_))) {
        val hp = new Path(p)
        val matched = Option(hp.getFileSystem(conf).globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw ShapefileException(s"glob `$p` matches no shapefiles")
        matched.map(_.getPath.toString)
      } else Seq(p)
    }
    // schema comes from the FIRST file's .dbf header (bounded driver read);
    // every file must match it — union-by-position over differing layers
    // would silently misalign columns
    val firstFields = dbfFields(conf, dbfPath(conf, files.head))
    files.drop(1).foreach { f =>
      val flds = dbfFields(conf, dbfPath(conf, f))
      if (flds != firstFields) throw ShapefileException(
        s"shapefile `$f` has a different .dbf schema than `${files.head}`; attach them separately")
    }
    val attrSchema = StructType(firstFields.map(f => StructField(f.name, sparkType(f))))
    val schema = StructType(attrSchema.fields :+ StructField("geom", BinaryType))

    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        parseOne(c, f)
      }
    spark.createDataFrame(rows, schema)
  }

  private def dbfPath(conf: Configuration, shp: String): Path = {
    val base = shp.stripSuffix(".shp").stripSuffix(".SHP")
    val lower = new Path(base + ".dbf")
    // legacy tooling ships NATION.SHP + NATION.DBF; on case-sensitive
    // filesystems probe the uppercase companion before failing
    if (lower.getFileSystem(conf).exists(lower)) lower
    else {
      val upper = new Path(base + ".DBF")
      if (upper.getFileSystem(conf).exists(upper)) upper else lower
    }
  }

  private def sparkType(f: DbfField): DataType = f.typ match {
    case 'C' => StringType
    case 'N' => if (f.decimals > 0) DoubleType else LongType
    case 'F' => DoubleType
    case 'L' => BooleanType
    case 'D' => DateType
    case other => throw ShapefileException(
      s"dBASE field `${f.name}` has unsupported type `$other` (C/N/F/L/D supported)")
  }

  private def readFully(conf: Configuration, p: Path): Array[Byte] = {
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    if (len > (1L << 31) - 1) throw ShapefileException(
      s"`$p` exceeds the shapefile format's own 2 GiB bound — corrupt or not a shapefile")
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len.toInt)
      in.readFully(bytes)
      bytes
    } finally in.close()
  }

  /** .dbf header → field list (bounded read: header region only). */
  private def dbfFields(conf: Configuration, p: Path): Seq[DbfField] = {
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw ShapefileException(
      s"companion attribute file `$p` not found (a shapefile layer is .shp + .dbf)")
    val in = fs.open(p)
    try {
      val head = new Array[Byte](32)
      in.readFully(head)
      val headerSize = ((head(8) & 0xff) | ((head(9) & 0xff) << 8))
      val descBytes = new Array[Byte](math.max(0, headerSize - 32))
      in.readFully(descBytes)
      val out = Seq.newBuilder[DbfField]
      var i = 0
      while (i + 32 <= descBytes.length && descBytes(i) != 0x0d) {
        val name = new String(descBytes.slice(i, i + 11), "US-ASCII")
          .takeWhile(_ != '\u0000').trim
        out += DbfField(name, descBytes(i + 11).toChar,
          descBytes(i + 16) & 0xff, descBytes(i + 17) & 0xff)
        i += 32
      }
      out.result()
    } finally in.close()
  }

  /** Parse one .shp + .dbf pair into Rows. Runs in an executor. */
  private def parseOne(conf: Configuration, shp: String): Iterator[Row] = {
    val fields = dbfFields(conf, dbfPath(conf, shp))
    val attrs = dbfRecords(conf, dbfPath(conf, shp), fields)
    val geoms = shpGeometries(readFully(conf, new Path(shp)))
    if (attrs.length != geoms.length) throw ShapefileException(
      s"`$shp`: ${geoms.length} shapes but ${attrs.length} attribute records — corrupt pair")
    attrs.iterator.zip(geoms.iterator).map { case (a, g) => Row.fromSeq(a :+ g) }
  }

  // ------------------------------------------------------------------ dbf
  private def dbfRecords(conf: Configuration, p: Path,
      fields: Seq[DbfField]): Seq[Seq[Any]] = {
    val bytes = readFully(conf, p)
    val headerSize = ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8))
    val recordSize = ((bytes(10) & 0xff) | ((bytes(11) & 0xff) << 8))
    val out = Seq.newBuilder[Seq[Any]]
    var off = headerSize
    while (off + recordSize <= bytes.length && bytes(off) != 0x1a) {
      val deleted = bytes(off) == '*'
      if (!deleted) {
        var fo = off + 1
        val vals = fields.map { f =>
          val raw = new String(bytes.slice(fo, fo + f.length), "US-ASCII").trim
          fo += f.length
          if (raw.isEmpty) null
          else f.typ match {
            case 'C' => raw
            // explicit Any ascriptions: a bare if(..) Double else Long
            // weak-LUBs to Double and silently widens the integral branch
            case 'N' => if (f.decimals > 0) (raw.toDouble: Any) else (raw.toLong: Any)
            case 'F' => raw.toDouble
            case 'L' => raw.head match {
              case 'Y' | 'y' | 'T' | 't' => true
              case 'N' | 'n' | 'F' | 'f' => false
              case _ => null
            }
            case 'D' =>
              if (raw.length != 8) null
              else java.sql.Date.valueOf(
                s"${raw.substring(0, 4)}-${raw.substring(4, 6)}-${raw.substring(6, 8)}")
          }
        }
        out += vals
      }
      off += recordSize
    }
    out.result()
  }

  // ------------------------------------------------------------------ shp
  private def shpGeometries(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val head = ByteBuffer.wrap(bytes, 0, 100)
    head.order(ByteOrder.BIG_ENDIAN)
    if (head.getInt(0) != 9994)
      throw ShapefileException("not a shapefile: missing file code 9994")
    val out = Seq.newBuilder[Array[Byte]]
    var off = 100
    while (off + 8 <= bytes.length) {
      val rec = ByteBuffer.wrap(bytes, off, 8).order(ByteOrder.BIG_ENDIAN)
      rec.getInt // record number (1-based)
      val contentWords = rec.getInt
      val content = ByteBuffer.wrap(bytes, off + 8, contentWords * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += shape(content)
      off += 8 + contentWords * 2
    }
    out.result()
  }

  private def shape(b: ByteBuffer): Array[Byte] = b.getInt match {
    case 0 => null // null shape: geometry is SQL NULL
    case 1 => // Point
      wkbHeader(1) ++ le16(b.getDouble, b.getDouble)
    case 8 => // MultiPoint
      b.position(b.position() + 32) // bbox
      val n = b.getInt
      val pts = (0 until n).map(_ => wkbHeader(1) ++ le16(b.getDouble, b.getDouble))
      wkbHeader(4) ++ leInt(n) ++ pts.flatten
    case 3 => // PolyLine → LineString / MultiLineString
      val parts = partsAndPoints(b)
      if (parts.length == 1) wkbHeader(2) ++ lineString(parts.head)
      else wkbHeader(5) ++ leInt(parts.length) ++
        parts.flatMap(p => wkbHeader(2) ++ lineString(p))
    case 5 => // Polygon: rings grouped by orientation (CW outer, CCW hole)
      val rings = partsAndPoints(b)
      val grouped = groupRings(rings)
      if (grouped.length == 1)
        wkbHeader(3) ++ leInt(grouped.head.length) ++ grouped.head.flatMap(lineString)
      else wkbHeader(6) ++ leInt(grouped.length) ++ grouped.flatMap { poly =>
        wkbHeader(3) ++ leInt(poly.length) ++ poly.flatMap(lineString)
      }
    case z @ (11 | 13 | 15 | 18 | 21 | 23 | 25 | 28 | 31) => throw ShapefileException(
      s"shape type $z carries Z/M coordinates — not implemented; dropping " +
        "coordinates silently would corrupt the geometry")
    case other => throw ShapefileException(s"unknown shape type $other")
  }

  /** Shared PolyLine/Polygon layout: bbox, numParts, numPoints, part
    * offsets, points — returned as one point-array per part. */
  private def partsAndPoints(b: ByteBuffer): Seq[Array[(Double, Double)]] = {
    b.position(b.position() + 32) // bbox
    val nParts = b.getInt
    val nPoints = b.getInt
    val starts = (0 until nParts).map(_ => b.getInt)
    val pts = Array.fill(nPoints)((b.getDouble, b.getDouble))
    (0 until nParts).map { i =>
      val from = starts(i)
      val until = if (i + 1 < nParts) starts(i + 1) else nPoints
      pts.slice(from, until)
    }
  }

  /** Group polygon rings into polygons: the spec orients OUTER rings
    * clockwise and holes counter-clockwise; each outer ring opens a new
    * polygon and collects the holes that follow it. A leading hole (spec
    * violation) opens its own polygon rather than being dropped. */
  private[sources] def groupRings(rings: Seq[Array[(Double, Double)]]): Seq[Seq[Array[(Double, Double)]]] = {
    val out = Seq.newBuilder[Seq[Array[(Double, Double)]]]
    var current: List[Array[(Double, Double)]] = Nil
    rings.foreach { r =>
      val outer = signedArea(r) < 0 // y-up shoelace: clockwise = negative
      if (outer && current.nonEmpty) { out += current.reverse; current = Nil }
      current = r :: current
    }
    if (current.nonEmpty) out += current.reverse
    out.result()
  }

  private[sources] def signedArea(ring: Array[(Double, Double)]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      a += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
      i += 1
    }
    a / 2
  }

  // WKB building blocks (public OGC little-endian format, same encoding the
  // GeoJSON source emits — one `geom` representation across spatial sources)
  private[sources] def wkbHeader(geomType: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(geomType)
    b.array()
  }
  private[sources] def leInt(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private[sources] def le16(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(x).putDouble(y)
    b.array()
  }
  private[sources] def lineString(pts: Array[(Double, Double)]): Array[Byte] =
    leInt(pts.length) ++ pts.flatMap { case (x, y) => le16(x, y) }
}
