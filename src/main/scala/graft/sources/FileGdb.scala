package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native ESRI File Geodatabase (OpenFileGDB) reader — the `st_read`
  * OpenFileGDB driver surface (reference src/duckdb/spatial.rs:29-82
  * reaches it via GDAL; this is a from-scratch JVM parse of the publicly
  * documented, reverse-engineered V10 wire format GDAL's driver reads).
  *
  * A `.gdb` DIRECTORY is the dataset: each table is an
  * `a<id hex8>.gdbtable` (header → field descriptors → length-prefixed
  * rows with a nullable-field null bitmap) plus its `.gdbtablx` row-offset
  * index (5-byte little-endian absolute offsets in 1024-row blocks; offset
  * 0 = absent row). Table id 1 is GDB_SystemCatalog — its rows map names
  * to table ids (a row's implicit ObjectID IS the id); rows whose name
  * starts with `GDB_` are system tables. Multi-layer model matches the
  * other container drivers: `layer=<name>` selects, a multi-layer dataset
  * without it rejects loudly listing the names.
  *
  * Geometry: the spec's quantized varuints — Points store
  * (coord−origin)·scale+1 per axis; Polyline/Polygon store quantized bbox
  * then per-point deltas as sign-bit-in-first-byte varints, X and Y
  * tracked separately — dequantized against the geometry field's
  * origin/scale and emitted through the same OGC WKB building blocks as
  * every spatial driver here (polygon rings group by orientation, holes
  * and multi-parts included). Out-of-scope constructs reject LOUDLY
  * naming the file: Z/M dimensions (flags or shape types), curve or
  * Multipatch shapes, field types beyond
  * objectid/int32/float64/string/geometry, deleted-row bitmaps, SRS text.
  *
  * Scale shape: schema probes ONE table on the driver (bounded — header +
  * field descriptors); row parsing runs in executor tasks, one per
  * attached `.gdb` dataset (a geodatabase is a dim-sized fence/asset
  * layer in the pipelines here; many datasets parallelize). */
object FileGdb {

  final case class FileGdbException(msg: String) extends IllegalArgumentException(msg)

  private final case class Fld(name: String, typ: Int, nullable: Boolean,
      xOrigin: Double = 0, yOrigin: Double = 0, xyScale: Double = 0)

  // ------------------------------------------------------------------ read

  def read(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw FileGdbException("OpenFileGDB attach needs at least one .gdb path")
    val conf = spark.sessionState.newHadoopConf()
    val dirs: Seq[String] = paths.flatMap { p =>
      if (p.exists("*?[{".contains(_))) {
        val hp = new Path(p)
        val matched = Option(hp.getFileSystem(conf).globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw FileGdbException(s"glob `$p` matches no .gdb datasets")
        matched.map(_.getPath.toString)
      } else Seq(p)
    }
    // schema from the FIRST dataset (bounded driver read: catalog + field
    // descriptors); every other dataset re-checks in its executor task
    val layers0 = catalogLayers(conf, dirs.head)
    val (layerName, tableId0) = resolveLayer(layers0, options.get("layer"), dirs.head)
    val fields0 = tableFields(conf, dirs.head, tableId0)
    val schema = sparkSchema(fields0)

    import scala.jdk.CollectionConverters._
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val rows = spark.sparkContext
      .parallelize(dirs, math.max(1, dirs.length))
      .flatMap { d =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        val layers = catalogLayers(c, d)
        val id = layers.collectFirst { case (n, i) if n == layerName => i }
          .getOrElse(throw FileGdbException(
            s"`$d`: no layer named `$layerName`; available: " +
              layers.map(_._1).sorted.mkString(", ")))
        val flds = tableFields(c, d, id)
        if (sparkSchema(flds) != schema) throw FileGdbException(
          s"`$d` layer `$layerName` has a different schema; attach it separately")
        parseRows(c, d, id, flds)
      }
    spark.createDataFrame(rows, schema)
  }

  private def resolveLayer(layers: Seq[(String, Int)], opt: Option[String],
      gdb: String): (String, Int) = opt match {
    case Some(l) =>
      layers.find(_._1 == l).getOrElse(throw FileGdbException(
        s"`$gdb`: no layer named `$l`; available: ${layers.map(_._1).sorted.mkString(", ")}"))
    case None =>
      if (layers.isEmpty) throw FileGdbException(s"`$gdb`: the geodatabase holds no user layers")
      if (layers.size > 1) throw FileGdbException(
        s"`$gdb` holds ${layers.size} layers " +
          s"(${layers.map(_._1).sorted.mkString(", ")}); select one with layer=<name>")
      layers.head
  }

  // attribute names serve lowercased — the house convention across the
  // spatial drivers (and what the engine's case-insensitive resolution
  // assumes); the geometry column is `geom` like every other driver
  private def sparkSchema(fields: Seq[Fld]): StructType = StructType(fields.map { f =>
    f.typ match {
      case 6 => StructField(f.name.toLowerCase, LongType, nullable = false)
      case 1 => StructField(f.name.toLowerCase, IntegerType, nullable = true)
      case 3 => StructField(f.name.toLowerCase, DoubleType, nullable = true)
      case 4 => StructField(f.name.toLowerCase, StringType, nullable = true)
      case 7 => StructField("geom", BinaryType, nullable = true)
      case other => throw new IllegalStateException(s"unmapped field type $other")
    }
  })

  // ------------------------------------------------------- file plumbing

  private def readFully(conf: Configuration, p: Path): Array[Byte] = {
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw FileGdbException(s"`$p`: file does not exist")
    val st = fs.getFileStatus(p)
    val out = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, out) finally in.close()
    out
  }

  private def tablePath(gdb: String, id: Int): Path =
    new Path(gdb, f"a$id%08x.gdbtable")
  private def tablxPath(gdb: String, id: Int): Path =
    new Path(gdb, f"a$id%08x.gdbtablx")

  /** .gdbtablx → absolute row offsets (0 entries = absent rows, skipped). */
  private def rowOffsets(conf: Configuration, gdb: String, id: Int): Seq[Long] = {
    val bytes = readFully(conf, tablxPath(gdb, id))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = b.getInt
    if (magic != 3) throw FileGdbException(
      s"`${tablxPath(gdb, id)}`: not a .gdbtablx (magic $magic, wanted 3)")
    val nBlocks = b.getInt
    val nRows = b.getInt
    val width = b.getInt
    if (width < 4 || width > 6) throw FileGdbException(
      s"`${tablxPath(gdb, id)}`: unsupported offset width $width")
    if (16L + nBlocks.toLong * 1024 * width > bytes.length) throw FileGdbException(
      s"`${tablxPath(gdb, id)}`: truncated offset blocks")
    (0 until nRows).map { i =>
      var v = 0L
      (0 until width).foreach { j =>
        v |= (bytes(16 + i * width + j) & 0xffL) << (8 * j)
      }
      v
    }
  }

  /** .gdbtable header + field-description section → typed fields (in row
    * storage order, ObjectID first). */
  private def tableFields(conf: Configuration, gdb: String, id: Int): Seq[Fld] = {
    val p = tablePath(gdb, id)
    val bytes = readFully(conf, p)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (b.getInt != 3) throw FileGdbException(s"`$p`: not a .gdbtable (bad magic)")
    b.position(32)
    val descOff = b.getLong
    if (descOff <= 0 || descOff >= bytes.length) throw FileGdbException(
      s"`$p`: field-description offset $descOff out of bounds")
    b.position(descOff.toInt)
    b.getInt // section size
    val version = b.getInt
    if (version != 4) throw FileGdbException(
      s"`$p`: geodatabase version $version; this native reader serves V10 (=4) only")
    b.position(b.position() + 4) // geometry-type byte + 3 flag bytes
    val nFields = b.getShort & 0xffff
    (0 until nFields).map { _ =>
      def utf16(nChars: Int): String = {
        val a = new Array[Byte](nChars * 2); b.get(a)
        new String(a, java.nio.charset.StandardCharsets.UTF_16LE)
      }
      val name = utf16(b.get & 0xff)
      val aliasChars = b.get & 0xff
      if (aliasChars > 0) b.position(b.position() + aliasChars * 2)
      val typ = b.get & 0xff
      typ match {
        case 6 => b.position(b.position() + 2); Fld(name, 6, nullable = false)
        case 1 | 3 =>
          b.get // width
          val flags = b.get & 0xff
          if ((flags & 4) != 0) throw FileGdbException(
            s"`$p`: field `$name` carries a default value — out of this reader's scope")
          Fld(name, typ, (flags & 1) != 0)
        case 4 =>
          b.getInt // max length
          val flags = b.get & 0xff
          if ((flags & 4) != 0) throw FileGdbException(
            s"`$p`: field `$name` carries a default value — out of this reader's scope")
          Fld(name, 4, (flags & 1) != 0)
        case 7 =>
          b.get // unknown
          val flags = b.get & 0xff
          val srsBytes = b.getShort & 0xffff
          if (srsBytes > 0) b.position(b.position() + srsBytes)
          val zm = b.get & 0xff
          if (zm != 0) throw FileGdbException(
            s"`$p`: geometry field `$name` declares Z/M dimensions (flags $zm) — " +
              "dropping coordinates silently would corrupt the geometry; " +
              "re-export 2D or use a GDAL deployment")
          val xo = b.getDouble; val yo = b.getDouble; val sc = b.getDouble
          b.getDouble // xytolerance
          if (sc <= 0) throw FileGdbException(s"`$p`: geometry xyscale $sc must be positive")
          Fld(name, 7, (flags & 1) != 0, xo, yo, sc)
        case other => throw FileGdbException(
          s"`$p`: field `$name` has type $other — this native reader serves " +
            "objectid/int32/float64/string/geometry; use a GDAL deployment for the rest")
      }
    }
  }

  /** GDB_SystemCatalog (table 1) → (user layer name, table id). */
  private def catalogLayers(conf: Configuration, gdb: String): Seq[(String, Int)] = {
    val gp = new Path(gdb)
    val fs = gp.getFileSystem(conf)
    if (!fs.exists(gp) || !fs.getFileStatus(gp).isDirectory)
      throw FileGdbException(s"`$gdb`: not a .gdb directory")
    val fields = tableFields(conf, gdb, 1)
    val nameIdx = fields.indexWhere(_.name == "Name")
    if (nameIdx < 0) throw FileGdbException(
      s"`$gdb`: GDB_SystemCatalog has no Name column — not a file geodatabase?")
    // table id = the row's parsed ObjectID (derived from the PRE-filter
    // gdbtablx slot), NOT a post-filter ordinal: a deleted catalog entry
    // (gdbtablx offset 0 — routine after layer deletion) would shift every
    // later ordinal and silently map layer names to the wrong .gdbtable
    val oidIdx = fields.indexWhere(_.typ == 6)
    if (oidIdx < 0) throw FileGdbException(
      s"`$gdb`: GDB_SystemCatalog has no ObjectID column — not a file geodatabase?")
    parseRows(conf, gdb, 1, fields).collect {
      case row if row.get(nameIdx) != null &&
        !row.getString(nameIdx).startsWith("GDB_") =>
        (row.getString(nameIdx), row.getLong(oidIdx).toInt)
    }.toSeq
  }

  // ------------------------------------------------------------ row parse

  private def parseRows(conf: Configuration, gdb: String, id: Int,
      fields: Seq[Fld]): Iterator[Row] = {
    val p = tablePath(gdb, id)
    val bytes = readFully(conf, p)
    val offsets = rowOffsets(conf, gdb, id)
    offsets.iterator.zipWithIndex.filter(_._1 != 0L).map { case (off, i) =>
      if (off + 4 > bytes.length) throw FileGdbException(
        s"`$p`: row offset $off out of bounds (${bytes.length} bytes)")
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      b.position(off.toInt)
      val size = b.getInt
      if (size < 0 || off + 4 + size > bytes.length) throw FileGdbException(
        s"`$p`: row at $off declares $size bytes past the file end")
      // the null bitmap covers NULLABLE fields only (ObjectID is implicit
      // and never stored; a non-nullable field has no bit and is always
      // present), bit j of nullable-field j, LSB-first within each byte
      val bitmapLen = (fields.count(f => f.typ != 6 && f.nullable) + 7) / 8
      val bitmap = new Array[Byte](bitmapLen); b.get(bitmap)
      def isNull(j: Int): Boolean = (bitmap(j / 8) & (1 << (j % 8))) != 0
      var ni = 0 // running index within the nullable bitmap
      val vals = fields.map { f =>
        if (f.typ == 6) java.lang.Long.valueOf(i + 1L) // implicit ObjectID
        else {
          val thisNull = f.nullable && { val r = isNull(ni); ni += 1; r }
          if (thisNull) null
          else f.typ match {
            case 1 => java.lang.Integer.valueOf(b.getInt)
            case 3 => java.lang.Double.valueOf(b.getDouble)
            case 4 =>
              val n = varUInt(b).toInt
              if (n < 0 || n > b.remaining()) throw FileGdbException(
                s"`$p`: string length $n exceeds the remaining row bytes")
              val a = new Array[Byte](n); b.get(a)
              new String(a, java.nio.charset.StandardCharsets.UTF_8)
            case 7 =>
              val n = varUInt(b).toInt
              if (n < 0 || n > b.remaining()) throw FileGdbException(
                s"`$p`: geometry length $n exceeds the remaining row bytes")
              val end = b.position() + n
              val wkb = geometryWkb(b, f, p.toString)
              b.position(end)
              wkb
          }
        }
      }
      Row.fromSeq(vals)
    }
  }

  /** Unsigned varint (little-endian base-128). */
  private def varUInt(b: ByteBuffer): Long = {
    var v = 0L; var shift = 0
    var cont = true
    while (cont) {
      val x = b.get & 0xff
      v |= (x & 0x7fL) << shift
      shift += 7
      cont = (x & 0x80) != 0
      if (shift > 63) throw FileGdbException("varuint overruns 64 bits (corrupt row?)")
    }
    v
  }

  /** Signed varint: 6 magnitude bits + sign in the FIRST byte, 7 bits per
    * later byte (the spec's coordinate-delta encoding). */
  private def varSInt(b: ByteBuffer): Long = {
    var x = b.get & 0xff
    val neg = (x & 0x40) != 0
    var v = (x & 0x3fL)
    var shift = 6
    while ((x & 0x80) != 0) {
      x = b.get & 0xff
      v |= (x & 0x7fL) << shift
      shift += 7
      if (shift > 63) throw FileGdbException("varint overruns 64 bits (corrupt row?)")
    }
    if (neg) -v else v
  }

  // --------------------------------------------------- geometry → WKB

  private def geometryWkb(b: ByteBuffer, f: Fld, path: String): Array[Byte] = {
    import Shapefile.{wkbHeader, leInt, le16, lineString, groupRings}
    def deq(q: Long, origin: Double): Double = q / f.xyScale + origin
    varUInt(b) match {
      case 1 => // Point: quantized +1 per axis; raw 0 denotes an EMPTY point
        val qx = varUInt(b); val qy = varUInt(b)
        if (qx == 0 || qy == 0) throw FileGdbException(
          s"`$path`: empty point (quantized axis value 0) — this native " +
            "reader has no POINT EMPTY rendering in its WKB contract; " +
            "filter empty geometries or use a GDAL deployment")
        val x = deq(qx - 1, f.xOrigin)
        val y = deq(qy - 1, f.yOrigin)
        wkbHeader(1) ++ le16(x, y)
      case t @ (3 | 5) => // Polyline | Polygon
        val nPoints = varUInt(b).toInt
        val nParts = varUInt(b).toInt
        if (nPoints < 0 || nParts <= 0) throw FileGdbException(
          s"`$path`: geometry declares $nPoints points / $nParts parts")
        varUInt(b); varUInt(b); varUInt(b); varUInt(b) // quantized bbox
        val counts0 = (0 until nParts - 1).map(_ => varUInt(b).toInt)
        val counts = counts0 :+ (nPoints - counts0.sum)
        if (counts.last < 0) throw FileGdbException(
          s"`$path`: part point counts exceed the declared total $nPoints")
        var px = 0L; var py = 0L
        val parts: Seq[Array[(Double, Double)]] = counts.map { n =>
          Array.fill(n) {
            px += varSInt(b); py += varSInt(b)
            (deq(px, f.xOrigin), deq(py, f.yOrigin))
          }
        }
        if (t == 3) {
          if (parts.length == 1) wkbHeader(2) ++ lineString(parts.head)
          else wkbHeader(5) ++ leInt(parts.length) ++
            parts.flatMap(pp => wkbHeader(2) ++ lineString(pp))
        } else {
          val grouped = groupRings(parts)
          if (grouped.length == 1)
            wkbHeader(3) ++ leInt(grouped.head.length) ++ grouped.head.flatMap(lineString)
          else wkbHeader(6) ++ leInt(grouped.length) ++ grouped.flatMap { poly =>
            wkbHeader(3) ++ leInt(poly.length) ++ poly.flatMap(lineString)
          }
        }
      case z @ (9 | 11 | 13 | 15 | 18 | 19 | 20 | 21 | 23 | 25 | 26 | 27 | 28) =>
        throw FileGdbException(
          s"`$path`: shape type $z carries Z/M coordinates — dropping them " +
            "silently would corrupt the geometry; re-export 2D or use a GDAL deployment")
      case c @ (50 | 51 | 52 | 53 | 54) => throw FileGdbException(
        s"`$path`: generalized/curve shape type $c is outside this native " +
          "reader's scope; use a GDAL deployment")
      case other => throw FileGdbException(s"`$path`: unknown shape type $other")
    }
  }
}
