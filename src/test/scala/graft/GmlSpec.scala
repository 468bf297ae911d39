package graft

import graft.catalog.Catalog

/** Native GML reader: feature members, gml_id + simple string properties,
  * GML3 pos/posList and GML2 coordinates, every geometry shape mapped to
  * the shared WKB codec, srsDimension-3 z-drop, and loud rejects for the
  * shapes the codec cannot express. Fixtures are hand-written GML straight
  * from the OGC spec text. */
class GmlSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString

  private def write(dir: java.io.File, name: String, body: String): String =
    writeText(dir, name,
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml"
         |    xmlns:ogr="http://ogr.maptools.org/">
         |$body
         |</gml:FeatureCollection>""".stripMargin)

  private def geoJsonWkbHex(json: String): String =
    wkbHex(graft.sources.GeoJson.geoJsonToWkb(json))

  test("features: gml_id, string properties, GML3 point, z-drop, GML2 coordinates") {
    val dir = tempDir("gml")
    val p = write(dir, "a.gml",
      """<gml:featureMember>
        |  <ogr:city gml:id="c1">
        |    <ogr:name>alpha</ogr:name>
        |    <ogr:pop>1200</ogr:pop>
        |    <ogr:shape><gml:Point srsDimension="3">
        |      <gml:pos>3.5 7.0 99</gml:pos></gml:Point></ogr:shape>
        |  </ogr:city>
        |</gml:featureMember>
        |<gml:featureMember>
        |  <ogr:city fid="c2">
        |    <ogr:name>beta</ogr:name>
        |    <ogr:shape><gml:Point>
        |      <gml:coordinates>1.0,2.0</gml:coordinates></gml:Point></ogr:shape>
        |  </ogr:city>
        |</gml:featureMember>""".stripMargin)
    val df = Catalog.attach(spark, "gml_t1", "spatial", Map("files" -> p))
    assert(df.schema.fieldNames.toSeq === Seq("gml_id", "name", "pop", "geom"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows(0).getString(0) === "c1" && rows(0).getString(1) === "alpha")
    assert(rows(0).getString(2) === "1200")
    assert(wkbHex(rows(0).getAs[Array[Byte]](3)) ===
      geoJsonWkbHex("""{"type":"Point","coordinates":[3.5,7.0]}"""))
    assert(rows(1).getString(0) === "c2" && rows(1).getString(2) == null)
    assert(wkbHex(rows(1).getAs[Array[Byte]](3)) ===
      geoJsonWkbHex("""{"type":"Point","coordinates":[1.0,2.0]}"""))
  }

  test("linestring, polygon with hole, multi* — bytes match the GeoJSON codec") {
    val dir = tempDir("gml2")
    val p = write(dir, "g.gml",
      """<gml:featureMember><ogr:f gml:id="f1">
        |  <ogr:g><gml:LineString>
        |    <gml:posList>0 0 1 1 2 0</gml:posList></gml:LineString></ogr:g>
        |</ogr:f></gml:featureMember>
        |<gml:featureMember><ogr:f gml:id="f2">
        |  <ogr:g><gml:Polygon>
        |    <gml:exterior><gml:LinearRing>
        |      <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
        |    </gml:LinearRing></gml:exterior>
        |    <gml:interior><gml:LinearRing>
        |      <gml:posList>1 1 2 1 2 2 1 2 1 1</gml:posList>
        |    </gml:LinearRing></gml:interior>
        |  </gml:Polygon></ogr:g>
        |</ogr:f></gml:featureMember>
        |<gml:featureMember><ogr:f gml:id="f3">
        |  <ogr:g><gml:MultiSurface>
        |    <gml:surfaceMember><gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
        |      <gml:coordinates>0,0 1,0 1,1 0,0</gml:coordinates>
        |    </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon></gml:surfaceMember>
        |    <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing>
        |      <gml:posList>5 5 6 5 6 6 5 5</gml:posList>
        |    </gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
        |  </gml:MultiSurface></ogr:g>
        |</ogr:f></gml:featureMember>
        |<gml:featureMember><ogr:f gml:id="f4">
        |  <ogr:g><gml:MultiPoint>
        |    <gml:pointMember><gml:Point><gml:pos>1 2</gml:pos></gml:Point></gml:pointMember>
        |    <gml:pointMember><gml:Point><gml:pos>3 4</gml:pos></gml:Point></gml:pointMember>
        |  </gml:MultiPoint></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin)
    val byId = Catalog.attach(spark, "gml_t2", "spatial", Map("files" -> p))
      .collect().map(r => r.getString(0) -> wkbHex(r.getAs[Array[Byte]](1))).toMap
    assert(byId("f1") === geoJsonWkbHex(
      """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0],[2.0,0.0]]}"""))
    assert(byId("f2") === geoJsonWkbHex(
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0]],[[1.0,1.0],[2.0,1.0],[2.0,2.0],[1.0,2.0],[1.0,1.0]]]}"""))
    assert(byId("f3") === geoJsonWkbHex(
      """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]}"""))
    assert(byId("f4") === geoJsonWkbHex(
      """{"type":"MultiPoint","coordinates":[[1.0,2.0],[3.0,4.0]]}"""))
  }

  test("GML3 LineString/LinearRing by REPEATED pos children keeps every coordinate") {
    // regression: only the FIRST <gml:pos> used to be read, silently
    // truncating the shape to one coordinate (corrupt WKB)
    val dir = tempDir("gmlpos")
    val p = write(dir, "r.gml",
      """<gml:featureMember><ogr:f gml:id="f1">
        |  <ogr:g><gml:LineString>
        |    <gml:pos>0 0</gml:pos><gml:pos>1 1</gml:pos><gml:pos>2 0</gml:pos>
        |  </gml:LineString></ogr:g>
        |</ogr:f></gml:featureMember>
        |<gml:featureMember><ogr:f gml:id="f2">
        |  <ogr:g><gml:Polygon><gml:exterior><gml:LinearRing>
        |    <gml:pos>0 0</gml:pos><gml:pos>3 0</gml:pos>
        |    <gml:pos>3 3</gml:pos><gml:pos>0 0</gml:pos>
        |  </gml:LinearRing></gml:exterior></gml:Polygon></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin)
    val byId = Catalog.attach(spark, "gml_t6", "spatial", Map("files" -> p))
      .collect().map(r => r.getString(0) -> wkbHex(r.getAs[Array[Byte]](1))).toMap
    assert(byId("f1") === geoJsonWkbHex(
      """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0],[2.0,0.0]]}"""))
    assert(byId("f2") === geoJsonWkbHex(
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[3.0,0.0],[3.0,3.0],[0.0,0.0]]]}"""))
  }

  test("non-UTF-8 prolog encoding parses via the raw-bytes scan") {
    val dir = tempDir("gmlenc")
    val body =
      """<gml:featureMember><ogr:f gml:id="f1">
        |  <ogr:name>münchen</ogr:name>
        |  <ogr:g><gml:Point><gml:pos>0 0</gml:pos></gml:Point></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin
    val doc =
      s"""<?xml version="1.0" encoding="ISO-8859-1"?>
         |<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml"
         |    xmlns:ogr="http://ogr.maptools.org/">
         |$body
         |</gml:FeatureCollection>""".stripMargin
    val f = new java.io.File(dir, "latin1.gml")
    java.nio.file.Files.write(f.toPath,
      doc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val rows = Catalog.attach(spark, "gml_t7", "spatial",
      Map("files" -> f.getPath)).collect()
    assert(rows.length === 1 && rows(0).getString(1) === "münchen")
  }

  test("rejects are loud: curves, later-file attributes, complex properties") {
    val dir = tempDir("gml3")
    val curved = write(dir, "c.gml",
      """<gml:featureMember><ogr:f gml:id="f1">
        |  <ogr:g><gml:Curve><gml:segments/></gml:Curve></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin)
    val e1 = intercept[Exception] {
      Catalog.attach(spark, "gml_t3", "spatial", Map("files" -> curved)).collect()
    }
    assert((Option(e1.getCause).map(_.getMessage).getOrElse("") + e1.getMessage)
      .contains("Curve"))

    val a = write(dir, "a.gml",
      """<gml:featureMember><ogr:f gml:id="f1">
        |  <ogr:name>x</ogr:name>
        |  <ogr:g><gml:Point><gml:pos>0 0</gml:pos></gml:Point></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin)
    write(dir, "b.gml",
      """<gml:featureMember><ogr:f gml:id="f2">
        |  <ogr:name>y</ogr:name><ogr:extra>dropped?</ogr:extra>
        |  <ogr:g><gml:Point><gml:pos>1 1</gml:pos></gml:Point></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin)
    val e2 = intercept[Exception] {
      Catalog.attach(spark, "gml_t4", "spatial",
        Map("files" -> s"${dir.getPath}/a.gml,${dir.getPath}/b.gml")).collect()
    }
    val msg2 = Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage
    assert(msg2.contains("extra") && msg2.contains("a.gml"))

    val complex = write(dir, "x.gml",
      """<gml:featureMember><ogr:f gml:id="f1">
        |  <ogr:meta><ogr:inner>v</ogr:inner></ogr:meta>
        |  <ogr:g><gml:Point><gml:pos>0 0</gml:pos></gml:Point></ogr:g>
        |</ogr:f></gml:featureMember>""".stripMargin)
    val e3 = intercept[Exception] {
      Catalog.attach(spark, "gml_t5", "spatial", Map("files" -> complex)).collect()
    }
    assert((Option(e3.getCause).map(_.getMessage).getOrElse("") + e3.getMessage)
      .contains("complex"))
    locally { val _ = a }
  }
}
