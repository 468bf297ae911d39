package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native FlatGeobuf reader — the GDAL FlatGeobuf driver surface the
  * reference reaches through `st_read` (reference: src/duckdb/spatial.rs:
  * 29-82), re-expressed without GDAL. FlatGeobuf (spec v3, flatgeobuf.org)
  * is: 8 magic bytes (`fgb` 0x03 `fgb` patch), a size-prefixed FlatBuffers
  * `Header` table (name, geometry type, typed columns, feature count,
  * index node size), an OPTIONAL packed Hilbert R-tree index, then
  * size-prefixed `Feature` tables to EOF. There is no FlatBuffers runtime
  * in this container, so the vtable walk is implemented directly from the
  * published wire format (soffset→vtable, voffset-per-field-id, uoffset
  * indirection for strings/vectors/tables) — ~60 lines, and it makes the
  * byte-level contract explicit instead of hiding it in a codegen class.
  *
  * Columns map per the spec's ColumnType enum (Bool/Byte..Int → int types,
  * UInt/Long/ULong → long, Float/Double, String/Json/DateTime → string,
  * Binary → binary) plus the same WKB `geom` binary every spatial driver
  * here delivers; feature properties decode from the spec's packed
  * (ushort column-index, value) blob. Geometry: xy pairs + `ends` part
  * splits + nested `parts` for MultiPolygon; Z/M drop is NOT silent —
  * has_z/has_m headers reject loudly (the shared WKB codec is 2-D).
  * GeometryCollection rejects loudly (same rule as every driver here).
  *
  * Scale shape: the driver reads ONE header per file (bounded metadata
  * work); feature payloads parse in EXECUTORS, one task per file via a
  * raw-bytes binaryFile scan. The Hilbert index is SKIPPED by the spec's
  * closed-form size (the packed R-tree exists for bbox range reads over
  * HTTP — a seam a future spatial_filter_box pushdown can use; today the
  * box filter composes post-scan like the other drivers). */
object FlatGeobuf {

  // ---- spec constants ----
  private val Magic = Array[Byte](0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62)
  private val NodeBytes = 40L // packed R-tree node: 4 doubles bbox + uint64

  def read(spark: SparkSession, files: Seq[String],
      options: Map[String, String]): DataFrame = {
    require(files.nonEmpty, "flatgeobuf read needs at least one file")
    val conf = spark.sessionState.newHadoopConf()
    // --- driver probe: header of the FIRST file gives the column schema ---
    val firstBytes = {
      val p = new Path(files.head)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val head = new Array[Byte](64 * 1024) // headers are small
        var n = 0
        var r = 0
        while (n < head.length && r >= 0) {
          r = in.read(head, n, head.length - n); if (r > 0) n += r
        }
        java.util.Arrays.copyOf(head, n)
      } finally in.close()
    }
    val probe = parseHeader(firstBytes, files.head)
    val schema = StructType(
      probe.columns.map { c => StructField(c.name, sparkType(c)) } :+
        StructField("geom", BinaryType))
    val probeCols = probe.columns
    val probeFile = files.head
    val texts = spark.read.format("binaryFile").load(files: _*)
      .select("path", "content")
    val rows = texts.rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val path = r.getString(0)
      val h = parseHeader(bytes, path)
      if (h.columns.map(c => (c.name, c.typ)) != probeCols.map(c => (c.name, c.typ)))
        throw new IllegalArgumentException(
          s"FlatGeobuf `$path` declares columns ${h.columns.map(_.name).mkString(",")} " +
            s"but the schema was probed from `$probeFile` " +
            s"(${probeCols.map(_.name).mkString(",")}); attach the files separately")
      features(bytes, h, path)
    }
    spark.createDataFrame(rows, schema)
  }

  // ------------------------------------------------------- header model

  private[graft] case class FgbColumn(name: String, typ: Int)
  private[graft] case class FgbHeader(
      geometryType: Int, columns: Seq[FgbColumn], featuresCount: Long,
      indexNodeSize: Int, dataStart: Long)

  private def sparkType(c: FgbColumn): DataType = c.typ match {
    case 0 | 1 | 3 | 4 | 5 => IntegerType // Byte UByte Short UShort Int
    case 2 => BooleanType
    case 6 | 7 | 8 => LongType // UInt Long ULong
    case 9 => FloatType
    case 10 => DoubleType
    case 11 | 12 | 13 => StringType // String Json DateTime
    case 14 => BinaryType
    case t => throw new IllegalArgumentException(
      s"FlatGeobuf column `${c.name}` has unknown ColumnType $t")
  }

  /** Parse magic + size-prefixed header; `dataStart` points past the
    * (optional) packed Hilbert R-tree index. */
  private[graft] def parseHeader(bytes: Array[Byte], path: String): FgbHeader = {
    if (bytes.length < 12 || !bytes.take(7).sameElements(Magic))
      throw new IllegalArgumentException(
        s"`$path` is not FlatGeobuf (magic bytes `fgb\\x03fgb` absent); " +
          "the native spatial drivers are GeoJSON, ESRI Shapefile, GPKG, " +
          "XLSX, KML, GML, GPX, FlatGeobuf")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen = b.getInt(8)
    val base = 12
    if (bytes.length < base + headerLen) throw new IllegalArgumentException(
      s"FlatGeobuf `$path`: header is $headerLen bytes but only " +
        s"${bytes.length - base} are available (a schema probe reads 64 KiB — " +
        "a header this large means thousands of columns; split the layer)")
    val t = new Fb(b, base + b.getInt(base)) // root table
    val geometryType = t.ubyte(2, 0)
    if (t.bool(3) || t.bool(4)) throw new IllegalArgumentException(
      s"FlatGeobuf `$path` declares Z/M dimensions; the shared WKB codec " +
        "here is 2-D — re-export the layer without Z/M or use a GDAL deployment")
    val columns = t.vectorOfTables(7).map { ct =>
      FgbColumn(
        ct.string(0).getOrElse(throw new IllegalArgumentException(
          s"FlatGeobuf `$path`: Column.name is required by the spec")),
        ct.ubyte(1, 0))
    }
    val featuresCount = t.ulong(8, 0L)
    val indexNodeSize = t.ushort(9, 16)
    val indexBytes =
      if (indexNodeSize == 0 || featuresCount == 0L) 0L
      else {
        // packed R-tree size: level sizes n, ceil(n/ns), ... down to 1
        var n = featuresCount
        var nodes = n
        while (n > 1) { n = (n + indexNodeSize - 1) / indexNodeSize; nodes += n }
        nodes * NodeBytes
      }
    FgbHeader(geometryType, columns, featuresCount, indexNodeSize,
      base.toLong + headerLen + indexBytes)
  }

  private def features(bytes: Array[Byte], h: FgbHeader, path: String): Seq[Row] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.Buffer[Row]()
    var pos = h.dataStart.toInt
    while (pos + 4 <= bytes.length) {
      val len = b.getInt(pos)
      val base = pos + 4
      val t = new Fb(b, base + b.getInt(base))
      val geom = t.table(0).map(g => geometryWkb(g, h.geometryType, path)).orNull
      val props = t.vectorBytes(1)
      val values = decodeProperties(props, h.columns, path)
      out += Row.fromSeq(values :+ geom)
      pos = base + len
    }
    out.toSeq
  }

  // --------------------------------------------- properties blob decode

  /** The spec's packed property encoding: repeated (uint16 LE column
    * index, value); value width fixed by the column type, strings and
    * binaries uint32-length-prefixed. Absent columns are NULL. */
  private def decodeProperties(props: Array[Byte], cols: Seq[FgbColumn],
      path: String): Seq[Any] = {
    val vals = new Array[Any](cols.length)
    if (props.nonEmpty) {
      val pb = ByteBuffer.wrap(props).order(ByteOrder.LITTLE_ENDIAN)
      while (pb.remaining() >= 2) {
        val i = pb.getShort & 0xffff
        if (i >= cols.length) throw new IllegalArgumentException(
          s"FlatGeobuf `$path`: property references column $i but the header " +
            s"declares ${cols.length} columns")
        // length prefixes come from untrusted bytes: a negative or
        // past-the-end uint32 must reject loudly naming the file, not
        // NegativeArraySizeException / OOM
        def lenPrefixed(): Array[Byte] = {
          val n = pb.getInt
          if (n < 0 || n > pb.remaining()) throw new IllegalArgumentException(
            s"FlatGeobuf `$path`: property length $n exceeds the remaining " +
              s"${pb.remaining()} property bytes (corrupt file?)")
          val a = new Array[Byte](n); pb.get(a); a
        }
        vals(i) = cols(i).typ match {
          case 0 => pb.get.toInt // Byte (signed)
          case 1 => pb.get & 0xff // UByte
          case 2 => pb.get != 0
          case 3 => pb.getShort.toInt // Short (signed)
          case 4 => pb.getShort & 0xffff // UShort
          case 5 => pb.getInt
          case 6 => pb.getInt.toLong & 0xffffffffL
          case 7 | 8 => pb.getLong
          case 9 => pb.getFloat
          case 10 => pb.getDouble
          case 11 | 12 | 13 =>
            new String(lenPrefixed(), java.nio.charset.StandardCharsets.UTF_8)
          case 14 => lenPrefixed()
        }
      }
    }
    vals.toSeq
  }

  // --------------------------------------------------- geometry → WKB

  private def geometryWkb(g: Fb, headerType: Int, path: String): Array[Byte] = {
    val t = { val own = g.ubyte(6, 0); if (own != 0) own else headerType }
    val xy = g.vectorDoubles(1)
    val ends = g.vectorUints(0)
    def pts: Array[(Double, Double)] =
      Array.tabulate(xy.length / 2)(i => (xy(2 * i), xy(2 * i + 1)))
    def rings: Seq[Array[(Double, Double)]] = {
      val p = pts
      if (ends.isEmpty) Seq(p)
      else {
        var start = 0
        ends.map { e =>
          val r = p.slice(start, e); start = e; r
        }
      }
    }
    t match {
      case 1 => // Point
        wkbHeader(1) ++ le16(xy(0), xy(1))
      case 2 => // LineString
        wkbHeader(2) ++ lineString(pts)
      case 3 => // Polygon
        val rs = rings
        wkbHeader(3) ++ leInt(rs.length) ++ rs.flatMap(lineString)
      case 4 => // MultiPoint
        val p = pts
        wkbHeader(4) ++ leInt(p.length) ++
          p.flatMap { case (x, y) => wkbHeader(1) ++ le16(x, y) }
      case 5 => // MultiLineString
        val rs = rings
        wkbHeader(5) ++ leInt(rs.length) ++
          rs.flatMap(r => wkbHeader(2) ++ lineString(r))
      case 6 => // MultiPolygon: nested part geometries, each a Polygon
        val parts = g.vectorOfTables(7)
        if (parts.isEmpty) throw new IllegalArgumentException(
          s"FlatGeobuf `$path`: MultiPolygon without `parts` geometries")
        wkbHeader(6) ++ leInt(parts.length) ++ parts.flatMap { pg =>
          val rs = {
            val pxy = pg.vectorDoubles(1)
            val pends = pg.vectorUints(0)
            val pp = Array.tabulate(pxy.length / 2)(i => (pxy(2 * i), pxy(2 * i + 1)))
            if (pends.isEmpty) Seq(pp)
            else { var s = 0; pends.map { e => val r = pp.slice(s, e); s = e; r } }
          }
          wkbHeader(3) ++ leInt(rs.length) ++ rs.flatMap(lineString)
        }
      case 7 => throw new IllegalArgumentException(
        s"FlatGeobuf `$path`: GeometryCollection has no WKB Multi* mapping in " +
          "this codec (same rule as every spatial driver here); split the layer " +
          "or use a GDAL deployment")
      case 0 => throw new IllegalArgumentException(
        s"FlatGeobuf `$path`: feature carries geometry type Unknown and the " +
          "header declares none")
      case other => throw new IllegalArgumentException(
        s"FlatGeobuf `$path`: geometry type $other (curves/TIN/surfaces) is " +
          "outside this codec's scope; use a GDAL deployment")
    }
  }

  private def lineString(p: Array[(Double, Double)]): Array[Byte] =
    leInt(p.length) ++ p.flatMap { case (x, y) => le16(x, y) }
  private def wkbHeader(geomType: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1: Byte).putInt(geomType); b.array()
  }
  private def leInt(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le16(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(x).putDouble(y); b.array()
  }

  // --------------------------------------------- minimal FlatBuffers walk

  /** A FlatBuffers table at absolute position `pos`: soffset at pos points
    * back to the vtable (uint16 vtable size, uint16 table size, then one
    * uint16 in-table offset per field id; 0/absent → default). */
  private[sources] final class Fb(b: ByteBuffer, pos: Int) {
    private val vt = pos - b.getInt(pos)
    private val vtSize = b.getShort(vt) & 0xffff
    private def voff(id: Int): Int = {
      val o = 4 + 2 * id
      if (o + 2 > vtSize) 0 else b.getShort(vt + o) & 0xffff
    }
    def ubyte(id: Int, dflt: Int): Int = {
      val o = voff(id); if (o == 0) dflt else b.get(pos + o) & 0xff
    }
    def bool(id: Int): Boolean = ubyte(id, 0) != 0
    def ushort(id: Int, dflt: Int): Int = {
      val o = voff(id); if (o == 0) dflt else b.getShort(pos + o) & 0xffff
    }
    def ulong(id: Int, dflt: Long): Long = {
      val o = voff(id); if (o == 0) dflt else b.getLong(pos + o)
    }
    private def indirect(id: Int): Int = {
      val o = voff(id); if (o == 0) -1 else pos + o + b.getInt(pos + o)
    }
    def string(id: Int): Option[String] = {
      val p = indirect(id)
      if (p < 0) None
      else {
        val n = b.getInt(p)
        val a = new Array[Byte](n)
        val dup = b.duplicate(); dup.position(p + 4); dup.get(a)
        Some(new String(a, java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    def table(id: Int): Option[Fb] = {
      val p = indirect(id); if (p < 0) None else Some(new Fb(b, p))
    }
    def vectorOfTables(id: Int): Seq[Fb] = {
      val p = indirect(id)
      if (p < 0) Seq.empty
      else {
        val n = b.getInt(p)
        (0 until n).map { i =>
          val ep = p + 4 + 4 * i
          new Fb(b, ep + b.getInt(ep))
        }
      }
    }
    def vectorBytes(id: Int): Array[Byte] = {
      val p = indirect(id)
      if (p < 0) Array.emptyByteArray
      else {
        val n = b.getInt(p)
        val a = new Array[Byte](n)
        val dup = b.duplicate(); dup.position(p + 4); dup.get(a)
        a
      }
    }
    def vectorDoubles(id: Int): Array[Double] = {
      val p = indirect(id)
      if (p < 0) Array.emptyDoubleArray
      else {
        val n = b.getInt(p)
        Array.tabulate(n)(i => b.getDouble(p + 4 + 8 * i))
      }
    }
    def vectorUints(id: Int): Seq[Int] = {
      val p = indirect(id)
      if (p < 0) Seq.empty
      else {
        val n = b.getInt(p)
        (0 until n).map(i => b.getInt(p + 4 + 4 * i))
      }
    }
  }
}
