package graft

import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.sources.{FileGdb, FileGdbWriter}
import graft.sources.FileGdbWriter.{GdbField, GdbGeom}

/** Native OpenFileGDB reader: .gdbtable/.gdbtablx framing, system-catalog
  * layer resolution, null bitmap, quantized geometry dequantization through
  * the shared WKB codec, loud rejects for Z/M, curves and foreign field
  * types. Fixtures come from the independent FileGdbWriter byte emitter;
  * the byte-layout test pins the wire format (magics, header offsets,
  * 5-byte tablx offsets) so writer and reader cannot drift into a private
  * dialect unnoticed. */
class FileGdbSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
  private def geo(json: String): String =
    wkbHex(graft.sources.GeoJson.geoJsonToWkb(json))

  private def pointLayer(name: String, n: Int) =
    (name, 1, Seq(GdbField("k", 1), GdbField("label", 4), GdbField("score", 3)),
      (1 to n).map { i =>
        (Seq[Any](i, if (i % 3 == 0) null else s"pt$i",
          if (i % 4 == 0) null else i / 2.0),
          Some(GdbGeom(1, Seq(Array((i / 2.0, i.toDouble))))))
      })

  test("byte layout: magics, header offsets, 5-byte tablx offsets at spec positions") {
    val dir = tempDir("gdb")
    val gdb = new java.io.File(dir, "pin.gdb")
    FileGdbWriter.write(gdb, Seq(pointLayer("pts", 3)))
    val table = java.nio.file.Files.readAllBytes(
      new java.io.File(gdb, "a00000002.gdbtable").toPath)
    val bb = java.nio.ByteBuffer.wrap(table).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(0) === 3) // magic
    assert(bb.getInt(4) === 3) // row count
    assert(bb.getLong(24) === table.length.toLong) // file size at spec offset
    assert(bb.getLong(32) === 40L) // field-description offset
    assert(bb.getInt(44) === 4) // V10 version inside the field section
    val tablx = java.nio.file.Files.readAllBytes(
      new java.io.File(gdb, "a00000002.gdbtablx").toPath)
    val tb = java.nio.ByteBuffer.wrap(tablx).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(tb.getInt(0) === 3 && tb.getInt(8) === 3 && tb.getInt(12) === 5)
    // first row offset points INSIDE the table file, past the header
    var off0 = 0L
    (0 until 5).foreach(j => off0 |= (tablx(16 + j) & 0xffL) << (8 * j))
    assert(off0 > 40L && off0 < table.length)
    // the catalog (table 1) exists and maps the layer name to id 2
    val cat = java.nio.file.Files.readAllBytes(
      new java.io.File(gdb, "a00000001.gdbtable").toPath)
    assert(java.nio.ByteBuffer.wrap(cat).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0) === 3)
  }

  test("points + typed attributes + NULL bitmap round-trip; ObjectID implicit") {
    val dir = tempDir("gdb")
    val gdb = new java.io.File(dir, "t.gdb")
    FileGdbWriter.write(gdb, Seq(pointLayer("pts", 8)))
    val df = Catalog.attach(spark, "gdb_t1", "spatial", Map("files" -> gdb.getPath))
    assert(df.schema.fieldNames.toSeq === Seq("objectid", "k", "label", "score", "geom"))
    val rows = df.collect().sortBy(_.getInt(1))
    assert(rows.length === 8)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 8L)) // implicit ObjectID
    assert(rows(2).isNullAt(2) && rows(5).isNullAt(2)) // k=3,6 label null
    assert(rows(3).isNullAt(3) && rows(7).isNullAt(3)) // k=4,8 score null
    assert(rows(0).getString(2) === "pt1" && rows(0).getDouble(3) === 0.5)
    assert(wkbHex(rows(4).getAs[Array[Byte]]("geom")) ===
      geo("""{"type":"Point","coordinates":[2.5,5.0]}"""))
  }

  test("multi-layer dataset: loud list without layer=, select with it") {
    val dir = tempDir("gdb")
    val gdb = new java.io.File(dir, "m.gdb")
    FileGdbWriter.write(gdb, Seq(pointLayer("alpha", 2), pointLayer("beta", 3)))
    val e = intercept[FileGdb.FileGdbException] {
      Catalog.attach(spark, "gdb_m0", "spatial", Map("files" -> gdb.getPath))
    }
    assert(e.getMessage.contains("alpha, beta") && e.getMessage.contains("layer="))
    val beta = Catalog.attach(spark, "gdb_m1", "spatial",
      Map("files" -> gdb.getPath, "layer" -> "beta"))
    assert(beta.count() === 3)
    val e2 = intercept[FileGdb.FileGdbException] {
      Catalog.attach(spark, "gdb_m2", "spatial",
        Map("files" -> gdb.getPath, "layer" -> "nope"))
    }
    assert(e2.getMessage.contains("no layer named `nope`"))
  }

  test("polyline / polygon-with-hole / multipolygon match the GeoJSON codec") {
    val dir = tempDir("gdb")
    val gdb = new java.io.File(dir, "g.gdb")
    // polygon rings: shapefile orientation — outer CW (y-up negative area),
    // holes CCW; FileGdbWriter stores parts verbatim
    val outer = Array((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
    val hole = Array((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    val outer2 = Array((10.0, 0.0), (10.0, 1.0), (11.0, 1.0), (11.0, 0.0), (10.0, 0.0))
    FileGdbWriter.write(gdb, Seq(
      ("lines", 3, Seq(GdbField("id", 1)), Seq(
        (Seq[Any](1), Some(GdbGeom(3, Seq(Array((0.0, 0.0), (1.0, 1.0), (2.0, 0.5)))))),
        (Seq[Any](2), Some(GdbGeom(3, Seq(
          Array((0.0, 0.0), (1.0, 1.0)), Array((2.0, 2.0), (3.0, 3.0)))))),
        (Seq[Any](3), None))),
      ("polys", 5, Seq(GdbField("id", 1)), Seq(
        (Seq[Any](1), Some(GdbGeom(5, Seq(outer, hole)))),
        (Seq[Any](2), Some(GdbGeom(5, Seq(outer, outer2))))))))
    val lines = Catalog.attach(spark, "gdb_g1", "spatial",
      Map("files" -> gdb.getPath, "layer" -> "lines"))
      .select("id", "geom").collect().sortBy(_.getInt(0))
    assert(wkbHex(lines(0).getAs[Array[Byte]](1)) ===
      geo("""{"type":"LineString","coordinates":[[0,0],[1,1],[2,0.5]]}"""))
    assert(wkbHex(lines(1).getAs[Array[Byte]](1)) ===
      geo("""{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}"""))
    assert(lines(2).isNullAt(1))
    val polys = Catalog.attach(spark, "gdb_g2", "spatial",
      Map("files" -> gdb.getPath, "layer" -> "polys"))
      .select("id", "geom").collect().sortBy(_.getInt(0))
    assert(wkbHex(polys(0).getAs[Array[Byte]](1)) ===
      geo("""{"type":"Polygon","coordinates":[
        [[0,0],[0,4],[4,4],[4,0],[0,0]],[[1,1],[2,1],[2,2],[1,2],[1,1]]]}"""))
    assert(wkbHex(polys(1).getAs[Array[Byte]](1)) ===
      geo("""{"type":"MultiPolygon","coordinates":[
        [[[0,0],[0,4],[4,4],[4,0],[0,0]]],[[[10,0],[10,1],[11,1],[11,0],[10,0]]]]}"""))
  }

  test("loud rejects: Z/M flags, curve shapes, not-a-gdb, spatial filter works") {
    val dir = tempDir("gdb")
    // Z/M flags in the geometry descriptor reject at schema probe
    val zm = new java.io.File(dir, "zm.gdb")
    FileGdbWriter.write(zm, Seq(pointLayer("pts", 1)), zmFlags = 1)
    val e1 = intercept[FileGdb.FileGdbException] {
      Catalog.attach(spark, "gdb_z1", "spatial", Map("files" -> zm.getPath))
    }
    assert(e1.getMessage.contains("Z/M"))
    // curve shape type in a blob rejects at parse: patch the shape-type
    // varuint (offset known from the tablx entry: size(4) + bitmap(1) +
    // blobLen varuint(1) for this single-field fixture)
    val cv = new java.io.File(dir, "cv.gdb")
    FileGdbWriter.write(cv, Seq(("c", 1, Seq.empty[GdbField],
      Seq((Seq.empty[Any], Some(GdbGeom(1, Seq(Array((1.0, 2.0))))))))))
    val tablx = java.nio.file.Files.readAllBytes(
      new java.io.File(cv, "a00000002.gdbtablx").toPath)
    var off = 0L
    (0 until 5).foreach(j => off |= (tablx(16 + j) & 0xffL) << (8 * j))
    val tPath = new java.io.File(cv, "a00000002.gdbtable").toPath
    val tBytes = java.nio.file.Files.readAllBytes(tPath)
    assert(tBytes(off.toInt + 6) === 1) // shape-type varuint (Point)
    tBytes(off.toInt + 6) = 51 // generalized polyline
    java.nio.file.Files.write(tPath, tBytes)
    val e2 = intercept[Exception] {
      Catalog.attach(spark, "gdb_c1", "spatial", Map("files" -> cv.getPath)).collect()
    }
    val m2 = Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage
    assert(m2.contains("curve") || m2.contains("scope"))
    // a directory named .gdb without catalog tables rejects loudly
    val fake = new java.io.File(dir, "fake.gdb"); fake.mkdirs()
    val e3 = intercept[Exception] {
      Catalog.attach(spark, "gdb_f1", "spatial", Map("files" -> fake.getPath))
    }
    assert(e3.getMessage.contains("does not exist"))
    // spatial_filter_box composes over the attach like every spatial driver
    val pts = new java.io.File(dir, "p.gdb")
    FileGdbWriter.write(pts, Seq(pointLayer("pts", 9)))
    val boxed = Catalog.attach(spark, "gdb_b1", "spatial",
      Map("files" -> pts.getPath, "spatial_filter_box" -> "1.0, 2.0, 2.5, 5.0"))
    assert(boxed.select("k").collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3, 4, 5))
  }
}
