package graft

import graft.catalog.Catalog
import graft.sources.{FlatGeobuf, FlatGeobufWriter}
import graft.sources.FlatGeobufWriter.FgbGeom

/** Native FlatGeobuf reader: magic + size-prefixed FlatBuffers framing,
  * hand-rolled vtable walk, packed typed properties, every geometry shape
  * mapped to the shared WKB codec, loud rejects for Z/M, collections and
  * non-fgb bytes. Fixtures come from the independent FlatGeobufWriter byte
  * emitter; the byte-layout test pins the wire format itself (magic,
  * size prefix, root/vtable offsets) so writer and reader cannot drift
  * into a shared private dialect unnoticed. */
class FlatGeobufSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String =
    b.map(x => f"$x%02X").mkString

  private def geo(json: String): String =
    wkbHex(graft.sources.GeoJson.geoJsonToWkb(json))

  test("byte layout: magic, size prefix, header fields at spec positions") {
    val dir = tempDir("fgb")
    val f = new java.io.File(dir, "pin.fgb")
    FlatGeobufWriter.write(f, "pin", 1,
      Seq("k" -> 7), Seq((Seq[Any](42L), FgbGeom(1, Array(1.5, 2.5)))))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // spec magic: 'f','g','b', major 3, 'f','g','b', patch
    assert(bytes.take(7).toSeq === Seq[Byte](0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getInt(8)
    assert(headerLen > 0 && 12 + headerLen < bytes.length)
    // root uoffset at the header's base resolves to a table whose soffset
    // points back at a vtable with a sane size field (the FlatBuffers
    // invariant every conforming parser relies on)
    val root = 12 + bb.getInt(12)
    val vt = root - bb.getInt(root)
    val vtSize = bb.getShort(vt) & 0xffff
    assert(vtSize >= 4 && vtSize % 2 === 0)
    // header parses: explicit no-index, one column, one feature
    val h = FlatGeobuf.parseHeader(bytes, f.getPath)
    assert(h.geometryType === 1 && h.featuresCount === 1L && h.indexNodeSize === 0)
    assert(h.columns.map(c => (c.name, c.typ)) === Seq(("k", 7)))
    // dataStart = 12 + headerLen exactly (no index bytes)
    assert(h.dataStart === 12L + headerLen)
  }

  test("typed properties + point WKB, absent properties are NULL") {
    val dir = tempDir("fgb")
    val f = new java.io.File(dir, "t.fgb")
    FlatGeobufWriter.write(f, "t", 1,
      Seq("k" -> 7, "name" -> 11, "score" -> 10, "ok" -> 2, "n" -> 5),
      Seq(
        (Seq[Any](7L, "alpha", 1.5, true, 3), FgbGeom(1, Array(3.5, 7.0))),
        (Seq[Any](8L, null, null, null, null), FgbGeom(1, Array(1.0, 2.0)))))
    val df = Catalog.attach(spark, "fgb_t1", "spatial", Map("files" -> f.getPath))
    assert(df.schema.fieldNames.toSeq === Seq("k", "name", "score", "ok", "n", "geom"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(0) === 7L && rows(0).getString(1) === "alpha")
    assert(rows(0).getDouble(2) === 1.5 && rows(0).getBoolean(3) === true)
    assert(rows(0).getInt(4) === 3)
    assert(wkbHex(rows(0).getAs[Array[Byte]]("geom")) ===
      geo("""{"type":"Point","coordinates":[3.5,7.0]}"""))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) &&
      rows(1).isNullAt(3) && rows(1).isNullAt(4))
  }

  test("line/polygon-with-hole/multi* geometries match the GeoJSON codec") {
    val dir = tempDir("fgb")
    val f = new java.io.File(dir, "g.fgb")
    // heterogeneous layer: header type Unknown, per-feature geometry types
    FlatGeobufWriter.write(f, "g", 0, Seq("id" -> 7), Seq(
      (Seq[Any](1L), FgbGeom(2, Array(0, 0, 1, 1, 2, 0))),
      (Seq[Any](2L), FgbGeom(3,
        Array(0, 0, 4, 0, 4, 4, 0, 4, 0, 0, 1, 1, 2, 1, 2, 2, 1, 2, 1, 1),
        ends = Seq(5, 10))),
      (Seq[Any](3L), FgbGeom(4, Array(1, 2, 3, 4))),
      (Seq[Any](4L), FgbGeom(5, Array(0, 0, 1, 1, 2, 2, 3, 3), ends = Seq(2, 4))),
      (Seq[Any](5L), FgbGeom(6, Array.emptyDoubleArray, parts = Seq(
        FgbGeom(3, Array(0, 0, 1, 0, 1, 1, 0, 0)),
        FgbGeom(3, Array(5, 5, 6, 5, 6, 6, 5, 5)))))))
    val byId = Catalog.attach(spark, "fgb_t2", "spatial", Map("files" -> f.getPath))
      .collect().map(r => r.getLong(0) -> wkbHex(r.getAs[Array[Byte]]("geom"))).toMap
    assert(byId(1L) === geo("""{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}"""))
    assert(byId(2L) === geo(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],[[1,1],[2,1],[2,2],[1,2],[1,1]]]}"""))
    assert(byId(3L) === geo("""{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}"""))
    assert(byId(4L) === geo(
      """{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}"""))
    assert(byId(5L) === geo(
      """{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]],[[[5,5],[6,5],[6,6],[5,5]]]]}"""))
  }

  test("box filter composes; rejects are loud") {
    val dir = tempDir("fgb")
    val f = new java.io.File(dir, "f.fgb")
    FlatGeobufWriter.write(f, "f", 1, Seq("id" -> 7),
      (0 until 5).map(k => (Seq[Any](k.toLong),
        FgbGeom(1, Array(k.toDouble, k.toDouble)))))
    val boxed = Catalog.attach(spark, "fgb_t3", "spatial",
      Map("files" -> f.getPath, "spatial_filter_box" -> "1, 1, 3, 3"))
    assert(boxed.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L))
    val e1 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "fgb_t4", "spatial",
        Map("files" -> f.getPath, "keep_wkb" -> "false"))
    }
    assert(e1.getMessage.contains("FlatGeobuf"))
    // not-fgb bytes reject naming the format
    val bad = new java.io.File(dir, "bad.fgb")
    java.nio.file.Files.write(bad.toPath, "not a flatgeobuf".getBytes)
    val e2 = intercept[Exception] {
      Catalog.attach(spark, "fgb_t5", "spatial", Map("files" -> bad.getPath))
    }
    assert(e2.getMessage.contains("magic"))
    // GeometryCollection has no WKB mapping — loud at parse
    val gc = new java.io.File(dir, "gc.fgb")
    FlatGeobufWriter.write(gc, "gc", 7, Seq("id" -> 7),
      Seq((Seq[Any](1L), FgbGeom(7, Array(0.0, 0.0)))))
    val e3 = intercept[Exception] {
      Catalog.attach(spark, "fgb_t6", "spatial", Map("files" -> gc.getPath)).collect()
    }
    val m3 = Option(e3.getCause).map(_.getMessage).getOrElse("") + e3.getMessage
    assert(m3.contains("GeometryCollection"))
    // columns diverging from the probe file reject naming both files
    val g1 = new java.io.File(dir, "s1.fgb")
    val g2 = new java.io.File(dir, "s2.fgb")
    FlatGeobufWriter.write(g1, "s", 1, Seq("id" -> 7),
      Seq((Seq[Any](1L), FgbGeom(1, Array(0.0, 0.0)))))
    FlatGeobufWriter.write(g2, "s", 1, Seq("id" -> 7, "extra" -> 11),
      Seq((Seq[Any](2L, "x"), FgbGeom(1, Array(1.0, 1.0)))))
    val e4 = intercept[Exception] {
      Catalog.attach(spark, "fgb_t7", "spatial",
        Map("files" -> s"${g1.getPath},${g2.getPath}")).collect()
    }
    val m4 = Option(e4.getCause).map(_.getMessage).getOrElse("") + e4.getMessage
    assert(m4.contains("probed") || m4.contains("separately"))
  }

  test("unsigned property types decode above the signed max (UByte/UShort)") {
    val dir = tempDir("fgb")
    val f = new java.io.File(dir, "u.fgb")
    // UByte 200 > Byte.MaxValue, UShort 40000 > Short.MaxValue — a
    // sign-extending decode would return -56 / -25536
    FlatGeobufWriter.write(f, "u", 1,
      Seq("ub" -> 1, "us" -> 4, "sb" -> 0, "ss" -> 3),
      Seq(
        (Seq[Any](200, 40000, -5, -300), FgbGeom(1, Array(0.0, 0.0))),
        (Seq[Any](7, 7, 7, 7), FgbGeom(1, Array(1.0, 1.0)))))
    val df = Catalog.attach(spark, "fgb_u1", "spatial", Map("files" -> f.getPath))
    val rows = df.select("ub", "us", "sb", "ss").collect().sortBy(_.getInt(0))
    assert(rows(1).getInt(0) === 200 && rows(1).getInt(1) === 40000)
    // signed types keep sign-extension
    assert(rows(1).getInt(2) === -5 && rows(1).getInt(3) === -300)
    assert(rows(0).toSeq === Seq(7, 7, 7, 7))
  }

  test("corrupt string length prefix rejects loudly naming the file") {
    val dir = tempDir("fgb")
    val f = new java.io.File(dir, "c.fgb")
    val marker = "CORRUPTME_UNIQUE_MARKER"
    FlatGeobufWriter.write(f, "c", 1, Seq("name" -> 11),
      Seq((Seq[Any](marker), FgbGeom(1, Array(0.0, 0.0)))))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // locate the uint32 length prefix immediately before the marker's utf8
    // bytes inside the property blob and overwrite it with a huge value
    val mb = marker.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val at = bytes.indexOfSlice(mb)
    assert(at > 4)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(at - 4) === mb.length) // sanity: found the prefix
    bb.putInt(at - 4, Int.MaxValue - 3)
    val bad = new java.io.File(dir, "c_bad.fgb")
    java.nio.file.Files.write(bad.toPath, bytes)
    val e = intercept[Exception] {
      Catalog.attach(spark, "fgb_c1", "spatial", Map("files" -> bad.getPath)).collect()
    }
    val m = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(m.contains("c_bad.fgb") && m.contains("property length"))
  }
}
