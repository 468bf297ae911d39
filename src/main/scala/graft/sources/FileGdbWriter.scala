package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ESRI File Geodatabase (OpenFileGDB) writer — fixture
  * scaffolding for the native [[FileGdb]] reader's specs and oracle
  * queries (the reference surface is `st_read`, i.e. READ; this writer
  * exists so the byte-level wire format is exercised from an independent
  * code path). Implements the V10 layout from the publicly documented
  * reverse-engineered FGDB spec that GDAL's OpenFileGDB driver is built
  * on:
  *
  *   - one table = `a<id as 8-hex-digits>.gdbtable` (40-byte header →
  *     field-description section → length-prefixed rows with a
  *     nullable-field null bitmap) + `.gdbtablx` (16-byte header + 5-byte
  *     little-endian absolute row offsets in 1024-row blocks);
  *   - table id 1 is GDB_SystemCatalog (Name string, FileFormat int32):
  *     row's implicit ObjectID = the table id its Name refers to;
  *   - geometry values are varuint-quantized: Points store
  *     (coord − origin)·scale + 1 per axis; Polyline/Polygon store the
  *     quantized bbox then per-point deltas as the spec's
  *     sign-bit-in-first-byte varints, X and Y tracked separately.
  *
  * Fixture-scope bounds (the reader rejects what's outside them loudly):
  * no SRS text, no Z/M dimensions, no defaults, no deleted/sparse rows,
  * field types int32 / float64 / string / objectid / geometry only. The
  * writer REQUIRES exactly-quantizable coordinates (origin −400, scale
  * 2^16) so the quantization round-trip is bit-exact — what lets the g14
  * oracle hash geometry hex against the shared GeoJSON WKB codec. */
object FileGdbWriter {

  val XOrigin = -400.0
  val YOrigin = -400.0
  val XYScale = 65536.0 // 2^16: dyadic, so exact for coords in 1/65536 steps

  /** Attribute field: typ per the spec's field-type byte —
    * 1=int32, 3=float64, 4=string. ObjectID and geometry are implicit. */
  case class GdbField(name: String, typ: Int)

  /** Geometry payload: spec shape type (1=Point, 3=Polyline, 5=Polygon)
    * + one point-array per part. */
  case class GdbGeom(shapeType: Int, parts: Seq[Array[(Double, Double)]])

  /** One layer: (name, geometry shape type or 0 for none, attribute
    * fields, rows of (values aligned with fields; null = SQL NULL,
    * optional geometry)). Layer k lands as table id k+2. */
  def write(dir: java.io.File,
      layers: Seq[(String, Int, Seq[GdbField], Seq[(Seq[Any], Option[GdbGeom])])],
      // fixture knob for the reader's Z/M loud-reject spec; real layers
      // here are always 2D (0)
      zmFlags: Int = 0): Unit = {
    dir.mkdirs()
    val catRows: Seq[(Seq[Any], Option[GdbGeom])] =
      (Seq[Any]("GDB_SystemCatalog", 0) +:
        layers.map(l => Seq[Any](l._1, 0))).map(v => (v, None))
    writeTable(dir, 1, 0, Seq(GdbField("Name", 4), GdbField("FileFormat", 1)), catRows, 0)
    layers.zipWithIndex.foreach { case ((_, shapeType, fields, rows), i) =>
      writeTable(dir, 2 + i, shapeType, fields, rows, zmFlags)
    }
  }

  // ------------------------------------------------------------ encoding

  private def leInt(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def leShort(n: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(n.toShort).array()
  private def leLong(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n).array()
  private def leDouble(d: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array()

  /** Unsigned varint: little-endian base-128, bit7 = continuation. */
  private[sources] def vu(n0: Long): Array[Byte] = {
    require(n0 >= 0, s"varuint of negative $n0")
    var n = n0
    val out = Array.newBuilder[Byte]
    do {
      val b = (n & 0x7f).toInt
      n >>>= 7
      out += (if (n != 0) (b | 0x80) else b).toByte
    } while (n != 0)
    out.result()
  }

  /** Signed varint, the spec's coordinate-delta form: first byte carries 6
    * magnitude bits + sign in bit6, later bytes 7 bits each; bit7 always
    * continuation. */
  private[sources] def sv(n: Long): Array[Byte] = {
    val neg = n < 0
    var m = math.abs(n)
    val first = (m & 0x3f).toInt | (if (neg) 0x40 else 0)
    m >>>= 6
    val out = Array.newBuilder[Byte]
    if (m == 0) out += first.toByte
    else {
      out += (first | 0x80).toByte
      do {
        val b = (m & 0x7f).toInt
        m >>>= 7
        out += (if (m != 0) (b | 0x80) else b).toByte
      } while (m != 0)
    }
    out.result()
  }

  private def utf16Name(s: String): Array[Byte] = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    require(s.length < 256, s"field name too long: $s")
    Array(s.length.toByte) ++ b
  }

  private[sources] def quant(v: Double, origin: Double): Long = {
    val d = (v - origin) * XYScale
    val r = math.rint(d)
    require(r == d && r >= 0,
      s"fixture coordinate $v does not quantize exactly at origin $origin scale $XYScale")
    r.toLong
  }

  private def geomBlob(g: GdbGeom): Array[Byte] = g.shapeType match {
    case 1 =>
      require(g.parts.length == 1 && g.parts.head.length == 1, "Point wants one coordinate")
      val (x, y) = g.parts.head.head
      vu(1) ++ vu(quant(x, XOrigin) + 1) ++ vu(quant(y, YOrigin) + 1)
    case 3 | 5 =>
      val pts = g.parts.flatten
      val qx = pts.map(p => quant(p._1, XOrigin))
      val qy = pts.map(p => quant(p._2, YOrigin))
      val bbox = vu(qx.min) ++ vu(qy.min) ++ vu(qx.max - qx.min) ++ vu(qy.max - qy.min)
      val partCounts =
        if (g.parts.length == 1) Array.emptyByteArray
        else g.parts.init.flatMap(p => vu(p.length)).toArray
      // X then Y per point, each axis delta-tracked independently from 0
      var px = 0L; var py = 0L
      val coords = pts.flatMap { case (x, y) =>
        val cx = quant(x, XOrigin); val cy = quant(y, YOrigin)
        val out = sv(cx - px) ++ sv(cy - py)
        px = cx; py = cy
        out
      }.toArray
      vu(g.shapeType) ++ vu(pts.length) ++ vu(g.parts.length) ++
        bbox ++ partCounts ++ coords
    case other =>
      throw new IllegalArgumentException(s"FileGdbWriter: shape type $other not in fixture scope")
  }

  // ----------------------------------------------------------- structure

  private def fieldDesc(shapeType: Int, fields: Seq[GdbField], zmFlags: Int): Array[Byte] = {
    val withGeom = shapeType != 0
    val entries = Array.newBuilder[Byte]
    entries ++= utf16Name("OBJECTID") ++ Array(0.toByte) ++ Array(6.toByte, 4.toByte, 2.toByte)
    fields.foreach { f =>
      entries ++= utf16Name(f.name) ++ Array(0.toByte) ++ Array(f.typ.toByte)
      f.typ match {
        case 1 => entries ++= Array(4.toByte, 1.toByte) // width, nullable
        case 3 => entries ++= Array(8.toByte, 1.toByte)
        case 4 => entries ++= leInt(65536) ++ Array(1.toByte) // max len, nullable
        case other => throw new IllegalArgumentException(
          s"FileGdbWriter: field type $other not in fixture scope")
      }
    }
    if (withGeom) {
      entries ++= utf16Name("SHAPE") ++ Array(0.toByte) ++ Array(7.toByte)
      entries ++= Array(0.toByte, 1.toByte) // unknown, nullable
      entries ++= leShort(0) // srs text byte length (none)
      entries ++= Array(zmFlags.toByte) // z/m flags (0 = 2D)
      entries ++= leDouble(XOrigin) ++ leDouble(YOrigin) ++
        leDouble(XYScale) ++ leDouble(1.0 / XYScale) // xytolerance
    }
    val headerGeomType = shapeType match {
      case 0 => 0; case 1 => 1; case 3 => 3; case 5 => 4
    }
    val body = leInt(4) ++ // version (V10)
      Array(headerGeomType.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      leShort(fields.length + 1 + (if (withGeom) 1 else 0)) ++
      entries.result()
    leInt(body.length) ++ body
  }

  private def rowBytes(fields: Seq[GdbField], vals: Seq[Any],
      geom: Option[GdbGeom], withGeom: Boolean): Array[Byte] = {
    require(vals.length == fields.length,
      s"row has ${vals.length} values for ${fields.length} fields")
    val nullable = fields.length + (if (withGeom) 1 else 0)
    val bitmap = new Array[Byte]((nullable + 7) / 8)
    def setNull(i: Int): Unit = bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
    val body = Array.newBuilder[Byte]
    fields.zip(vals).zipWithIndex.foreach { case ((f, v), i) =>
      if (v == null) setNull(i)
      else f.typ match {
        case 1 => body ++= leInt(v.asInstanceOf[Number].intValue())
        case 3 => body ++= leDouble(v.asInstanceOf[Number].doubleValue())
        case 4 =>
          val b = v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          body ++= vu(b.length) ++ b
      }
    }
    if (withGeom) geom match {
      case None => setNull(fields.length)
      case Some(g) =>
        val blob = geomBlob(g)
        body ++= vu(blob.length) ++ blob
    }
    val payload = bitmap ++ body.result()
    leInt(payload.length) ++ payload
  }

  private def writeTable(dir: java.io.File, id: Int, shapeType: Int,
      fields: Seq[GdbField], rows: Seq[(Seq[Any], Option[GdbGeom])],
      zmFlags: Int): Unit = {
    val withGeom = shapeType != 0
    val desc = fieldDesc(shapeType, fields, zmFlags)
    val offsets = Seq.newBuilder[Long]
    val rowsBytes = Array.newBuilder[Byte]
    var pos = 40L + desc.length
    rows.foreach { case (vals, geom) =>
      val rb = rowBytes(fields, vals, geom, withGeom)
      offsets += pos
      rowsBytes ++= rb
      pos += rb.length
    }
    val body = desc ++ rowsBytes.result()
    val fileSize = 40L + body.length
    val header = leInt(3) ++ leInt(rows.length) ++ leInt(4) ++ leInt(5) ++
      leInt(0) ++ leInt(0) ++ leLong(fileSize) ++ leLong(40L)
    val table = new java.io.File(dir, f"a$id%08x.gdbtable")
    java.nio.file.Files.write(table.toPath, header ++ body)

    // .gdbtablx: 1024-row blocks of 5-byte LE offsets, zero-padded
    val nBlocks = math.max(1, (rows.length + 1023) / 1024)
    val off5 = Array.newBuilder[Byte]
    val offs = offsets.result()
    (0 until nBlocks * 1024).foreach { i =>
      val v = if (i < offs.length) offs(i) else 0L
      (0 until 5).foreach(b => off5 += ((v >>> (8 * b)) & 0xff).toByte)
    }
    val tablx = leInt(3) ++ leInt(nBlocks) ++ leInt(rows.length) ++ leInt(5) ++
      off5.result() ++ leInt(0) // no deleted-row bitmap
    java.nio.file.Files.write(
      new java.io.File(dir, f"a$id%08x.gdbtablx").toPath, tablx)
  }
}
