package graft

import graft.catalog.Catalog

/** Native GPX reader: the five fixed GDAL layers (waypoints/routes/tracks/
  * route_points/track_points), lat/lon ATTRIBUTE positions → shared WKB
  * codec with x=lon y=lat, elevation/time as typed columns, and loud
  * rejects for empty geometry and missing positions. Fixtures are
  * hand-written GPX 1.1 straight from the Topografix schema text. */
class GpxSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String =
    b.map(x => f"$x%02X").mkString

  private def write(dir: java.io.File, name: String, body: String): String =
    writeText(dir, name,
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
         |$body
         |</gpx>""".stripMargin)

  test("waypoints: name/desc/ele/time columns, lon-lat axis order in WKB") {
    val dir = tempDir("gpx")
    val p = write(dir, "a.gpx",
      """<wpt lat="7.0" lon="3.5">
        |  <ele>120.25</ele><time>2024-01-02T03:04:05Z</time>
        |  <name>alpha</name><desc>first</desc>
        |</wpt>
        |<wpt lat="2.0" lon="1.0"><name>beta</name></wpt>""".stripMargin)
    val df = Catalog.attach(spark, "gpx_t1", "spatial", Map("files" -> p))
    assert(df.schema.fieldNames.toSeq === Seq("name", "desc", "ele", "time", "geom"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows(0).getString(0) === "alpha" && rows(0).getString(1) === "first")
    assert(rows(0).getDouble(2) === 120.25)
    assert(rows(0).getString(3) === "2024-01-02T03:04:05Z")
    // GPX stores lat then lon as attributes; WKB must be Point(lon, lat)
    assert(wkbHex(rows(0).getAs[Array[Byte]]("geom")) ===
      wkbHex(graft.sources.GeoJson.geoJsonToWkb(
        """{"type":"Point","coordinates":[3.5,7.0]}""")))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("routes and tracks: LineString / MultiLineString via the shared codec") {
    val dir = tempDir("gpx")
    val p = write(dir, "r.gpx",
      """<rte><name>r1</name><desc>loop</desc>
        |  <rtept lat="0.0" lon="0.0"/><rtept lat="1.0" lon="1.0"/><rtept lat="0.0" lon="2.0"/>
        |</rte>
        |<trk><name>t1</name>
        |  <trkseg><trkpt lat="0.0" lon="0.0"/><trkpt lat="1.0" lon="1.0"/></trkseg>
        |  <trkseg><trkpt lat="2.0" lon="2.0"/><trkpt lat="3.0" lon="3.0"/></trkseg>
        |</trk>""".stripMargin)
    val routes = Catalog.attach(spark, "gpx_t2", "spatial",
      Map("files" -> p, "layer" -> "routes")).collect()
    assert(routes.length === 1 && routes(0).getString(0) === "r1")
    assert(wkbHex(routes(0).getAs[Array[Byte]]("geom")) ===
      wkbHex(graft.sources.GeoJson.geoJsonToWkb(
        """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""")))
    val tracks = Catalog.attach(spark, "gpx_t3", "spatial",
      Map("files" -> p, "layer" -> "tracks")).collect()
    assert(tracks.length === 1 && tracks(0).getString(0) === "t1")
    assert(wkbHex(tracks(0).getAs[Array[Byte]]("geom")) ===
      wkbHex(graft.sources.GeoJson.geoJsonToWkb(
        """{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}""")))
  }

  test("route_points/track_points: GDAL fid/seg/point numbering, point WKB") {
    val dir = tempDir("gpx")
    val p = write(dir, "pts.gpx",
      """<rte><rtept lat="0.0" lon="0.0"><name>s</name><ele>5.5</ele></rtept>
        |     <rtept lat="1.0" lon="1.0"/></rte>
        |<rte><rtept lat="2.0" lon="2.0"/></rte>
        |<trk>
        |  <trkseg><trkpt lat="0.0" lon="0.0"/><trkpt lat="1.0" lon="1.0"/></trkseg>
        |  <trkseg><trkpt lat="2.0" lon="2.0"/></trkseg>
        |</trk>""".stripMargin)
    val rp = Catalog.attach(spark, "gpx_t4", "spatial",
      Map("files" -> p, "layer" -> "route_points"))
      .collect().sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(rp.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 0L), (0L, 1L), (1L, 0L)))
    assert(rp(0).getString(2) === "s" && rp(0).getDouble(3) === 5.5)
    val tp = Catalog.attach(spark, "gpx_t5", "spatial",
      Map("files" -> p, "layer" -> "track_points"))
      .collect().sortBy(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 0L, 0L), (0L, 0L, 1L), (0L, 1L, 0L)))
  }

  test("box filter composes; rejects are loud") {
    val dir = tempDir("gpx")
    val p = write(dir, "f.gpx",
      (0 until 5).map(k =>
        s"""<wpt lat="$k.0" lon="$k.0"><name>n$k</name></wpt>""").mkString("\n"))
    val boxed = Catalog.attach(spark, "gpx_t6", "spatial",
      Map("files" -> p, "spatial_filter_box" -> "1, 1, 3, 3"))
    assert(boxed.select("name").collect().map(_.getString(0)).sorted.toSeq
      === Seq("n1", "n2", "n3"))
    val e1 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "gpx_t7", "spatial",
        Map("files" -> p, "keep_wkb" -> "false"))
    }
    assert(e1.getMessage.contains("GPX"))
    // unknown layer rejects listing the five
    val e2 = intercept[Exception] {
      Catalog.attach(spark, "gpx_t8", "spatial",
        Map("files" -> p, "layer" -> "segments")).collect()
    }
    assert(e2.getMessage.contains("waypoints") && e2.getMessage.contains("track_points"))
    // a point without lat/lon fails loud, never skips silently
    val bad = write(dir, "bad.gpx", """<wpt lon="1.0"><name>x</name></wpt>""")
    val e3 = intercept[Exception] {
      Catalog.attach(spark, "gpx_t9", "spatial", Map("files" -> bad)).collect()
    }
    val m3 = Option(e3.getCause).map(_.getMessage).getOrElse("") + e3.getMessage
    assert(m3.contains("lat"))
    // an empty route has no LineString — loud
    val er = write(dir, "er.gpx", """<rte><name>hollow</name></rte>""")
    val e4 = intercept[Exception] {
      Catalog.attach(spark, "gpx_t10", "spatial",
        Map("files" -> er, "layer" -> "routes")).collect()
    }
    val m4 = Option(e4.getCause).map(_.getMessage).getOrElse("") + e4.getMessage
    assert(m4.contains("rtept"))
  }
}
