package graft

import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.sources.Dxf

/** Native DXF reader: (group code, value) pair-stream parse, ENTITIES
  * section walk, POINT/LINE/LWPOLYLINE/POLYLINE+VERTEX mapping to the
  * shared WKB codec, and loud rejects for curves, bulges, nonzero Z,
  * blocks and unknown entities. */
class DxfSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
  private def geo(json: String): String =
    wkbHex(graft.sources.GeoJson.geoJsonToWkb(json))

  private def dxf(entities: String): String =
    s"0\nSECTION\n2\nHEADER\n0\nENDSEC\n0\nSECTION\n2\nENTITIES\n${entities}0\nENDSEC\n0\nEOF\n"

  private def writeDxf(dir: java.io.File, name: String, entities: String): String =
    writeText(dir, name, dxf(entities))

  test("point / line / lwpolyline / old polyline map to the shared WKB codec") {
    val dir = tempDir("dxf")
    val f = writeDxf(dir, "g.dxf",
      // POINT on layer A, handle 2A
      "0\nPOINT\n5\n2A\n8\nA\n10\n1.5\n20\n2.5\n30\n0.0\n" +
        // LINE (0,0) -> (3,4)
        "0\nLINE\n5\n2B\n8\nA\n10\n0.0\n20\n0.0\n11\n3.0\n21\n4.0\n" +
        // open LWPOLYLINE, 3 vertices
        "0\nLWPOLYLINE\n5\n2C\n8\nB\n90\n3\n70\n0\n10\n0.0\n20\n0.0\n10\n1.0\n20\n1.0\n10\n2.0\n20\n0.5\n" +
        // CLOSED LWPOLYLINE -> Polygon (ring closes itself)
        "0\nLWPOLYLINE\n5\n2D\n8\nB\n90\n4\n70\n1\n10\n0.0\n20\n0.0\n10\n4.0\n20\n0.0\n10\n4.0\n20\n4.0\n10\n0.0\n20\n4.0\n" +
        // old-style POLYLINE with VERTEX runs
        "0\nPOLYLINE\n5\n2E\n8\nC\n70\n0\n0\nVERTEX\n8\nC\n10\n5.0\n20\n5.0\n0\nVERTEX\n8\nC\n10\n6.0\n20\n7.0\n0\nSEQEND\n")
    val df = Catalog.attach(spark, "dxf_g1", "spatial", Map("files" -> f))
    assert(df.schema.fieldNames.toSeq === Seq("layer", "handle", "etype", "geom"))
    val rows = df.collect().sortBy(_.getString(1))
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq === Seq(
      ("A", "2A", "POINT"), ("A", "2B", "LINE"), ("B", "2C", "LWPOLYLINE"),
      ("B", "2D", "LWPOLYLINE"), ("C", "2E", "POLYLINE")))
    def g(i: Int): String = wkbHex(rows(i).getAs[Array[Byte]]("geom"))
    assert(g(0) === geo("""{"type":"Point","coordinates":[1.5,2.5]}"""))
    assert(g(1) === geo("""{"type":"LineString","coordinates":[[0,0],[3,4]]}"""))
    assert(g(2) === geo("""{"type":"LineString","coordinates":[[0,0],[1,1],[2,0.5]]}"""))
    assert(g(3) === geo("""{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}"""))
    assert(g(4) === geo("""{"type":"LineString","coordinates":[[5,5],[6,7]]}"""))
  }

  test("loud rejects: curves, bulge arcs, nonzero Z, unknown entities, not-a-dxf") {
    val dir = tempDir("dxf")
    def attachErr(name: String, entities: String): String = {
      val f = writeDxf(dir, name, entities)
      val e = intercept[Exception] {
        Catalog.attach(spark, s"dxf_$name".replace('.', '_'), "spatial",
          Map("files" -> f)).collect()
      }
      Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    }
    assert(attachErr("arc.dxf", "0\nARC\n10\n0\n20\n0\n40\n5\n").contains("curve"))
    assert(attachErr("bulge.dxf",
      "0\nLWPOLYLINE\n90\n2\n10\n0\n20\n0\n42\n0.5\n10\n1\n20\n1\n").contains("bulge"))
    assert(attachErr("z.dxf",
      "0\nPOINT\n10\n1\n20\n2\n30\n3.5\n").contains("Z"))
    assert(attachErr("ins.dxf", "0\nINSERT\n2\nBLK\n10\n0\n20\n0\n").contains("scope"))
    assert(attachErr("unk.dxf", "0\nWIPEOUT\n10\n0\n20\n0\n").contains("unknown entity"))
    val bad = writeText(dir, "bad.dxf", "this is not\na dxf at all\n")
    val e = intercept[Exception] {
      Catalog.attach(spark, "dxf_bad", "spatial", Map("files" -> bad)).collect()
    }
    val m = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(m.contains("not a DXF file"))
  }

  test("spatial filters and the layer-file model compose over DXF") {
    val dir = tempDir("dxf")
    val ents = (1 to 9).map { i =>
      s"0\nPOINT\n5\n${i}F\n8\nP\n10\n$i.0\n20\n${i * 2}.0\n"
    }.mkString
    val f = writeDxf(dir, "pts.dxf", ents)
    val boxed = Catalog.attach(spark, "dxf_box", "spatial",
      Map("files" -> f, "spatial_filter_box" -> "2.0, 0.0, 5.0, 20.0"))
    assert(boxed.select("handle").collect().map(_.getString(0)).sorted.toSeq
      === Seq("2F", "3F", "4F", "5F"))
    // directory layer model: basename = layer name, like .shp/.geojson
    val d2 = new java.io.File(dir, "lyrs"); d2.mkdirs()
    writeDxf(d2, "a.dxf", "0\nPOINT\n10\n1\n20\n1\n")
    writeDxf(d2, "b.dxf", "0\nPOINT\n10\n2\n20\n2\n")
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "dxf_d0", "spatial", Map("files" -> d2.getPath))
    }
    assert(e.getMessage.contains("layer=<name>"))
    val a = Catalog.attach(spark, "dxf_d1", "spatial",
      Map("files" -> d2.getPath, "layer" -> "a"))
    assert(a.count() === 1)
  }

  test("POLYLINE header's mandatory dummy point (10/20/30 zeros) is not a vertex") {
    // real AutoCAD output always carries the dummy point in the POLYLINE
    // header itself; collecting it would prepend a spurious (0,0) vertex
    val dir = tempDir("dxf")
    val f = writeDxf(dir, "pd.dxf",
      "0\nPOLYLINE\n5\n30\n8\nC\n70\n0\n10\n0.0\n20\n0.0\n30\n0.0\n" +
        "0\nVERTEX\n8\nC\n10\n5.0\n20\n5.0\n" +
        "0\nVERTEX\n8\nC\n10\n6.0\n20\n7.0\n0\nSEQEND\n")
    val df = Catalog.attach(spark, "dxf_pd", "spatial", Map("files" -> f))
    val g = df.collect().head.getAs[Array[Byte]]("geom")
    assert(wkbHex(g) === geo("""{"type":"LineString","coordinates":[[5,5],[6,7]]}"""))
  }
}
