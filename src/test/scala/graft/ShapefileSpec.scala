package graft

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}

import graft.catalog.Catalog

/** Native shapefile reader against hand-built .shp/.dbf bytes written per
  * the PUBLIC ESRI Shapefile Technical Description and dBASE layout — the
  * reader is tested against the FORMAT, not a writer library. */
class ShapefileSpec extends SparkSpec {

  // ---------------------------------------------------------- byte writers
  private def shpFile(f: File, shapeType: Int, contents: Seq[Array[Byte]]): Unit = {
    val total = 100 + contents.map(c => 8 + c.length).sum
    val b = ByteBuffer.allocate(total)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)
    b.putInt(24, total / 2) // file length in 16-bit words
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000)
    b.putInt(32, shapeType)
    b.position(100)
    contents.zipWithIndex.foreach { case (c, i) =>
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(i + 1)
      b.putInt(c.length / 2)
      b.put(c)
    }
    java.nio.file.Files.write(f.toPath, b.array())
  }

  /** (name, type, length, decimals) descriptors + fixed-width row text. */
  private def dbfFile(f: File, fields: Seq[(String, Char, Int, Int)],
      rows: Seq[Seq[String]]): Unit = {
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_._3).sum
    val b = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0, 0x03.toByte)
    b.putInt(4, rows.length)
    b.putShort(8, headerSize.toShort)
    b.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, typ, len, dec), i) =>
      val off = 32 + 32 * i
      val nb = name.getBytes("US-ASCII")
      b.position(off); b.put(nb, 0, math.min(11, nb.length))
      b.put(off + 11, typ.toByte)
      b.put(off + 16, len.toByte)
      b.put(off + 17, dec.toByte)
    }
    b.put(32 + 32 * fields.length, 0x0d.toByte)
    var off = headerSize
    rows.foreach { r =>
      b.position(off); b.put(' '.toByte)
      fields.zip(r).foreach { case ((_, _, len, _), v) =>
        b.put(v.padTo(len, ' ').take(len).getBytes("US-ASCII"))
      }
      off += recordSize
    }
    b.put(off, 0x1a.toByte)
    java.nio.file.Files.write(f.toPath, b.array())
  }

  private def le(d: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array()
  private def leI(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
  private def pointContent(x: Double, y: Double): Array[Byte] =
    leI(1) ++ le(x) ++ le(y)
  private def wkb(t: Int): Array[Byte] = Array[Byte](1) ++ leI(t)

  // ---------------------------------------------------------------- tests
  test("points + dBASE attributes: C/N/F/L/D types, deleted rows skipped") {
    val dir = tempDir("shp_points")
    val shp = new File(dir, "layer.shp")
    val dbf = new File(dir, "layer.dbf")
    shpFile(shp, 1, Seq(pointContent(1.5, -2.5), pointContent(0.0, 7.25)))
    dbfFile(dbf,
      Seq(("NAME", 'C', 8, 0), ("VAL", 'N', 6, 0), ("RATE", 'N', 8, 2),
        ("OK", 'L', 1, 0), ("DT", 'D', 8, 0)),
      Seq(Seq("alpha", "42", "3.14", "T", "20240131"),
        Seq("beta", "-7", "", "N", "")))
    val df = Catalog.attach(spark, "shp_pts", "spatial", Map("files" -> shp.getPath))
    // attach folds names to lowercase, the reference's default casing rule
    assert(df.columns.toSeq === Seq("name", "val", "rate", "ok", "dt", "geom"))
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    val a = rows(0)
    assert(a.getString(0) === "alpha" && a.getLong(1) === 42L)
    assert(a.getDouble(2) === 3.14 && a.getBoolean(3) === true)
    assert(a.getDate(4).toString === "2024-01-31")
    assert(a.getAs[Array[Byte]]("geom").toSeq === (wkb(1) ++ le(1.5) ++ le(-2.5)).toSeq)
    val bRow = rows(1)
    assert(bRow.isNullAt(2) && bRow.getBoolean(3) === false && bRow.isNullAt(4))
  }

  test("polygon rings group by orientation: CW outer + CCW hole = one WKB polygon") {
    val dir = tempDir("shp_poly")
    // outer square CW, hole CCW, single polygon record with two rings
    val outer = Array((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Array((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))
    val pts = outer ++ hole
    val content = leI(5) ++ le(0) ++ le(0) ++ le(10) ++ le(10) ++
      leI(2) ++ leI(pts.length) ++ leI(0) ++ leI(outer.length) ++
      pts.flatMap { case (x, y) => le(x) ++ le(y) }
    shpFile(new File(dir, "poly.shp"), 5, Seq(content))
    dbfFile(new File(dir, "poly.dbf"), Seq(("ID", 'N', 4, 0)), Seq(Seq("1")))
    val df = Catalog.attach(spark, "shp_poly", "spatial",
      Map("files" -> s"$dir/poly.shp"))
    val expected = wkb(3) ++ leI(2) ++
      (leI(outer.length) ++ outer.flatMap { case (x, y) => le(x) ++ le(y) }) ++
      (leI(hole.length) ++ hole.flatMap { case (x, y) => le(x) ++ le(y) })
    assert(df.head().getAs[Array[Byte]]("geom").toSeq === expected.toSeq)
  }

  test("multi-part polyline becomes a WKB MultiLineString") {
    val dir = tempDir("shp_lines")
    val p1 = Array((0.0, 0.0), (1.0, 1.0))
    val p2 = Array((5.0, 5.0), (6.0, 5.0), (7.0, 5.0))
    val pts = p1 ++ p2
    val content = leI(3) ++ le(0) ++ le(0) ++ le(7) ++ le(5) ++
      leI(2) ++ leI(pts.length) ++ leI(0) ++ leI(p1.length) ++
      pts.flatMap { case (x, y) => le(x) ++ le(y) }
    shpFile(new File(dir, "lines.shp"), 3, Seq(content))
    dbfFile(new File(dir, "lines.dbf"), Seq(("ID", 'N', 4, 0)), Seq(Seq("1")))
    val df = Catalog.attach(spark, "shp_lines", "spatial",
      Map("files" -> s"$dir/lines.shp"))
    val expected = wkb(5) ++ leI(2) ++
      (wkb(2) ++ leI(2) ++ p1.flatMap { case (x, y) => le(x) ++ le(y) }) ++
      (wkb(2) ++ leI(3) ++ p2.flatMap { case (x, y) => le(x) ++ le(y) })
    assert(df.head().getAs[Array[Byte]]("geom").toSeq === expected.toSeq)
  }

  test("Z/M shape kinds and keep_wkb=false reject loudly") {
    val dir = tempDir("shp_z")
    // PointZ (11): x, y, z — refusing beats silently dropping z
    shpFile(new File(dir, "z.shp"), 11, Seq(leI(11) ++ le(1) ++ le(2) ++ le(3)))
    dbfFile(new File(dir, "z.dbf"), Seq(("ID", 'N', 4, 0)), Seq(Seq("1")))
    val e = intercept[Exception] {
      Catalog.attach(spark, "shp_z", "spatial", Map("files" -> s"$dir/z.shp")).collect()
    }
    assert(e.getMessage.contains("Z/M") ||
      Option(e.getCause).exists(_.getMessage.contains("Z/M")))
    val e2 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "shp_z2", "spatial",
        Map("files" -> s"$dir/z.shp", "keep_wkb" -> "false"))
    }
    assert(e2.getMessage.contains("GeoJSON-only"))
  }

  test("missing companion .dbf errors with a clear message") {
    val dir = tempDir("shp_nodbf")
    shpFile(new File(dir, "lonely.shp"), 1, Seq(pointContent(0, 0)))
    val e = intercept[graft.sources.Shapefile.ShapefileException] {
      Catalog.attach(spark, "shp_lonely", "spatial", Map("files" -> s"$dir/lonely.shp"))
    }
    assert(e.getMessage.contains(".dbf"))
  }

  test("spatial_filter_box composes with the shapefile source") {
    val dir = tempDir("shp_bbox")
    shpFile(new File(dir, "pts.shp"), 1,
      Seq(pointContent(2.0, 3.0), pointContent(50.0, 60.0)))
    dbfFile(new File(dir, "pts.dbf"), Seq(("ID", 'N', 4, 0)),
      Seq(Seq("1"), Seq("2")))
    val df = Catalog.attach(spark, "shp_bbox", "spatial",
      Map("files" -> s"$dir/pts.shp", "spatial_filter_box" -> "0,0,10,10"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("uppercase legacy layer NATION.SHP + NATION.DBF reads") {
    // legacy DOS-era tooling ships all-uppercase companions; the reader
    // probes .DBF when .dbf is absent on case-sensitive filesystems
    val dir = tempDir("shp_upper")
    shpFile(new File(dir, "NATION.SHP"), 1, Seq(pointContent(3.0, 4.0)))
    dbfFile(new File(dir, "NATION.DBF"),
      Seq(("ID", 'N', 4, 0)), Seq(Seq("9")))
    val df = Catalog.attach(spark, "shp_upper", "spatial",
      Map("files" -> s"$dir/NATION.SHP"))
    val r = df.head()
    assert(r.getLong(0) === 9L)
    assert(r.getAs[Array[Byte]]("geom").toSeq === (wkb(1) ++ le(3.0) ++ le(4.0)).toSeq)
  }
}
