package graft

import graft.catalog.Catalog

/** Native KML reader: Placemark rows, typed Schema/SimpleData + untyped
  * Data extended attributes, every geometry shape mapped to the shared
  * WKB codec, and loud rejects for the shapes the codec cannot express.
  * Fixtures are hand-written KML straight from the OGC spec text. */
class KmlSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String =
    b.map(x => f"$x%02X").mkString

  private def write(dir: java.io.File, name: String, body: String): String =
    writeText(dir, name,
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
         |$body
         |</Document></kml>""".stripMargin)

  test("placemarks: name/description, typed schema fields, untyped Data, point WKB") {
    val dir = tempDir("kml")
    val p = write(dir, "a.kml",
      """<Schema name="s" id="s">
        |  <SimpleField type="int" name="k"/>
        |  <SimpleField type="double" name="score"/>
        |</Schema>
        |<Folder><Placemark>
        |  <name>alpha</name><description>first</description>
        |  <ExtendedData>
        |    <SchemaData schemaUrl="#s">
        |      <SimpleData name="k">7</SimpleData>
        |      <SimpleData name="score">1.5</SimpleData>
        |    </SchemaData>
        |    <Data name="tag"><value>core</value></Data>
        |  </ExtendedData>
        |  <Point><coordinates>3.5,7.0,99</coordinates></Point>
        |</Placemark>
        |<Placemark><name>beta</name>
        |  <ExtendedData><Data name="tag"><value>edge</value></Data></ExtendedData>
        |  <Point><coordinates>1.0,2.0</coordinates></Point>
        |</Placemark></Folder>""".stripMargin)
    val df = Catalog.attach(spark, "kml_t1", "spatial", Map("files" -> p))
    assert(df.schema.fieldNames.toSeq ===
      Seq("name", "description", "k", "score", "tag", "geom"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows(0).getString(0) === "alpha" && rows(0).getString(1) === "first")
    assert(rows(0).getInt(2) === 7 && rows(0).getDouble(3) === 1.5)
    assert(rows(0).getString(4) === "core")
    // altitude drops; WKB = little-endian Point(3.5, 7.0)
    assert(wkbHex(rows(0).getAs[Array[Byte]]("geom")).startsWith("0101000000"))
    assert(rows(1).getString(0) === "beta")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(rows(1).getString(4) === "edge")
  }

  test("line/polygon-with-hole/multipoint geometries match the GeoJSON codec") {
    val dir = tempDir("kml")
    val p = write(dir, "g.kml",
      """<Placemark><name>ln</name>
        |  <LineString><coordinates>0,0 1,1 2,0</coordinates></LineString>
        |</Placemark>
        |<Placemark><name>poly</name>
        |  <Polygon>
        |    <outerBoundaryIs><LinearRing><coordinates>0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs>
        |    <innerBoundaryIs><LinearRing><coordinates>1,1 2,1 2,2 1,2 1,1</coordinates></LinearRing></innerBoundaryIs>
        |  </Polygon>
        |</Placemark>
        |<Placemark><name>mp</name>
        |  <MultiGeometry>
        |    <Point><coordinates>1,2</coordinates></Point>
        |    <Point><coordinates>3,4</coordinates></Point>
        |  </MultiGeometry>
        |</Placemark>""".stripMargin)
    val df = Catalog.attach(spark, "kml_t2", "spatial", Map("files" -> p))
    val byName = df.collect().map(r =>
      r.getString(0) -> wkbHex(r.getAs[Array[Byte]]("geom"))).toMap
    // same bytes the GeoJSON codec emits for the identical shapes
    assert(byName("ln") === wkbHex(graft.sources.GeoJson.geoJsonToWkb(
      """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""")))
    assert(byName("poly") === wkbHex(graft.sources.GeoJson.geoJsonToWkb(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],[[1,1],[2,1],[2,2],[1,2],[1,1]]]}""")))
    assert(byName("mp") === wkbHex(graft.sources.GeoJson.geoJsonToWkb(
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")))
  }

  test("spatial filters compose; rejects are loud") {
    val dir = tempDir("kml")
    val p = write(dir, "f.kml",
      (0 until 5).map(k =>
        s"""<Placemark><name>n$k</name><Point><coordinates>$k.0,$k.0</coordinates></Point></Placemark>""")
        .mkString("\n"))
    // bbox filter rides the shared WkbEnvelope machinery
    val boxed = Catalog.attach(spark, "kml_t3", "spatial",
      Map("files" -> p, "spatial_filter_box" -> "1, 1, 3, 3"))
    assert(boxed.select("name").collect().map(_.getString(0)).sorted.toSeq
      === Seq("n1", "n2", "n3"))
    // keep_wkb=false is GeoJSON-only
    val e1 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "kml_t4", "spatial",
        Map("files" -> p, "keep_wkb" -> "false"))
    }
    assert(e1.getMessage.contains("KML"))
    // mixed-type MultiGeometry has no WKB mapping
    val mixed = write(dir, "m.kml",
      """<Placemark><MultiGeometry>
        |  <Point><coordinates>0,0</coordinates></Point>
        |  <LineString><coordinates>0,0 1,1</coordinates></LineString>
        |</MultiGeometry></Placemark>""".stripMargin)
    val e2 = intercept[Exception] {
      Catalog.attach(spark, "kml_t5", "spatial", Map("files" -> mixed)).collect()
    }
    assert(e2.getMessage.contains("mixed"))
  }

  test("attribute only in a later file rejects loudly naming the probe file") {
    val dir = tempDir("kml_probe")
    // schema probes a.kml; b.kml carries an extra Data attribute that the
    // probed schema cannot serve — silent narrowing would drop it from
    // every row, so the executor parse must fail loud instead
    val a = write(dir, "a.kml",
      """<Placemark><name>p1</name>
        |  <ExtendedData><Data name="tag"><value>x</value></Data></ExtendedData>
        |  <Point><coordinates>0,0</coordinates></Point>
        |</Placemark>""".stripMargin)
    write(dir, "b.kml",
      """<Placemark><name>p2</name>
        |  <ExtendedData>
        |    <Data name="tag"><value>y</value></Data>
        |    <Data name="extra"><value>dropped?</value></Data>
        |  </ExtendedData>
        |  <Point><coordinates>1,1</coordinates></Point>
        |</Placemark>""".stripMargin)
    val e = intercept[Exception] {
      Catalog.attach(spark, "kml_t6", "spatial",
        Map("files" -> s"${dir.getPath}/a.kml,${dir.getPath}/b.kml")).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("extra") && msg.contains("a.kml"),
      s"expected loud undeclared-attribute reject naming the probe file: $msg")
    // and a single-file read of b.kml (its own probe) still serves the column
    val solo = Catalog.attach(spark, "kml_t7", "spatial",
      Map("files" -> s"${dir.getPath}/b.kml"))
    assert(solo.schema.fieldNames.contains("extra"))
    assert(solo.select("extra").collect().head.getString(0) === "dropped?")
    locally { val _ = a }
  }
}
