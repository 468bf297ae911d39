package graft

import graft.catalog.Catalog

class GeoJsonSpec extends SparkSpec {

  private val fc =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","properties":{"name":"origin","pop":1},
      | "geometry":{"type":"Point","coordinates":[1.0,2.0]}},
      |{"type":"Feature","properties":{"name":"line","pop":2},
      | "geometry":{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}}
      |]}""".stripMargin

  test("spatial attach yields properties + WKB geom column") {
    val dir = tempDir("geo")
    val p = writeText(dir, "places.geojson", fc)
    val df = Catalog.attach(spark, "places", "spatial", Map("files" -> p))
    assert(df.columns.contains("geom"))
    assert(df.columns.contains("name"))
    assert(df.count() === 2)
    val wkb = df.filter(df("name") === "origin").select("geom").head().getAs[Array[Byte]](0)
    // little-endian WKB Point(1,2): 01 01000000 + x + y
    assert(wkb(0) === 1.toByte)
    assert(wkb.length === 21)
    val bb = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.get(); assert(bb.getInt === 1)
    assert(bb.getDouble === 1.0); assert(bb.getDouble === 2.0)
  }

  test("layer model: directory datasets, layer selection, driver/option gates") {
    val dir = tempDir("geo_layers")
    def fcOne(name: String, x: Double) =
      s"""{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"$name"},
        | "geometry":{"type":"Point","coordinates":[$x,0.0]}}
        |]}""".stripMargin
    writeText(dir, "cities.geojson", fcOne("c1", 1.0))
    writeText(dir, "rivers.geojson", fcOne("r1", 2.0))
    // multi-layer directory without `layer` rejects loudly, names listed
    val e1 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "lyr_multi", "spatial", Map("files" -> dir.getPath))
    }
    assert(e1.getMessage.contains("cities") && e1.getMessage.contains("rivers"))
    // layer=<name> selects exactly that layer's rows
    val cities = Catalog.attach(spark, "lyr_cities", "spatial",
      Map("files" -> dir.getPath, "layer" -> "cities"))
    assert(cities.select("name").collect().map(_.getString(0)).toSeq === Seq("c1"))
    // unknown layer rejects, available names listed
    val e2 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "lyr_nope", "spatial",
        Map("files" -> dir.getPath, "layer" -> "roads"))
    }
    assert(e2.getMessage.contains("no layer named `roads`"))
    // single-layer directory attaches without `layer`
    val solo = tempDir("geo_layers_solo")
    writeText(solo, "only.geojson", fcOne("s1", 3.0))
    assert(Catalog.attach(spark, "lyr_solo", "spatial",
      Map("files" -> solo.getPath)).count() === 1L)
    // allowed_drivers gates by native driver name
    val e3 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "lyr_drv", "spatial",
        Map("files" -> dir.getPath, "layer" -> "cities",
          "allowed_drivers" -> "ESRI Shapefile"))
    }
    assert(e3.getMessage.contains("GeoJSON"))
    assert(Catalog.attach(spark, "lyr_drv_ok", "spatial",
      Map("files" -> dir.getPath, "layer" -> "cities",
        "allowed_drivers" -> "GeoJSON,ESRI Shapefile")).count() === 1L)
    // sequential_layer_scan validates; open_options rejects loudly;
    // sibling_files entries must exist
    assert(Catalog.attach(spark, "lyr_seq", "spatial",
      Map("files" -> dir.getPath, "layer" -> "cities",
        "sequential_layer_scan" -> "true")).count() === 1L)
    val e4 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "lyr_oo", "spatial",
        Map("files" -> dir.getPath, "layer" -> "cities",
          "open_options" -> "FLATTEN_NESTED_ATTRIBUTES=YES"))
    }
    assert(e4.getMessage.contains("GDAL driver switches"))
    val e5 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "lyr_sib", "spatial",
        Map("files" -> dir.getPath, "layer" -> "cities",
          "sibling_files" -> s"${dir.getPath}/missing.prj"))
    }
    assert(e5.getMessage.contains("does not exist"))
  }

  test("keep_wkb toggles representation, never column presence") {
    val dir = tempDir("geo_repr")
    val p = writeText(dir, "repr.geojson", fc)
    // keep_wkb true (and the default, above): geom is WKB binary
    val wkbDf = Catalog.attach(spark, "repr_wkb", "spatial",
      Map("files" -> p, "keep_wkb" -> "true"))
    assert(wkbDf.schema("geom").dataType ===
      org.apache.spark.sql.types.BinaryType)
    // keep_wkb false: geom column SURVIVES as the engine-native
    // representation (canonical GeoJSON text) — the reference's keep_wkb
    // switches WKB_BLOB vs GEOMETRY, it never drops the column
    // (src/duckdb/spatial.rs:29-54)
    val txtDf = Catalog.attach(spark, "repr_txt", "spatial",
      Map("files" -> p, "keep_wkb" -> "false"))
    assert(txtDf.columns.contains("geom"))
    assert(txtDf.schema("geom").dataType ===
      org.apache.spark.sql.types.StringType)
    val g = txtDf.filter(txtDf("name") === "origin").select("geom").head().getString(0)
    assert(g.contains("\"type\":\"Point\"") || g.contains("\"Point\""))
    assert(txtDf.count() === 2)
  }

  test("GDAL-only spatial options are rejected, not ignored") {
    val dir = tempDir("geo_rej")
    val p = writeText(dir, "x.geojson", fc)
    Seq("layer", "open_options", "allowed_drivers").foreach { opt =>
      val e = intercept[Catalog.InvalidOptionException] {
        Catalog.attach(spark, "rej_spatial", "spatial", Map("files" -> p, opt -> "v"))
      }
      assert(e.getMessage.contains(opt))
    }
  }

  test("spatial_filter_box keeps envelope-intersecting features only") {
    val dir = tempDir("geo_bbox")
    val p = writeText(dir, "b.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"inside"},
        | "geometry":{"type":"Point","coordinates":[5.0,5.0]}},
        |{"type":"Feature","properties":{"name":"outside"},
        | "geometry":{"type":"Point","coordinates":[50.0,50.0]}},
        |{"type":"Feature","properties":{"name":"straddle"},
        | "geometry":{"type":"LineString","coordinates":[[-100.0,5.0],[100.0,5.0]]}},
        |{"type":"Feature","properties":{"name":"env_only"},
        | "geometry":{"type":"LineString","coordinates":[[-1.0,-1.0],[11.0,11.0]]}}
        |]}""".stripMargin)
    def names(opts: Map[String, String]): Seq[String] =
      Catalog.attach(spark, "bbox_t", "spatial", opts + ("files" -> p))
        .select("name").collect().map(_.getString(0)).toSeq.sorted
    // box 0..10: the outside point drops; the wide line's envelope
    // straddles the box (no vertex inside); env_only has both vertices
    // outside but envelope overlap
    assert(names(Map("spatial_filter_box" -> "0,0,10,10")) ===
      Seq("env_only", "inside", "straddle"))
    // same result over the keep_wkb=false (GeoJSON text) representation
    assert(names(Map("spatial_filter_box" -> "0,0,10,10", "keep_wkb" -> "false")) ===
      Seq("env_only", "inside", "straddle"))
    // a tiny far box keeps nothing
    assert(names(Map("spatial_filter_box" -> "200,200,201,201")) === Seq.empty)
    // malformed boxes reject loudly
    val e1 = intercept[Catalog.InvalidOptionException] {
      names(Map("spatial_filter_box" -> "1,2,3"))
    }
    assert(e1.getMessage.contains("minx,miny,maxx,maxy"))
    val e2 = intercept[Catalog.InvalidOptionException] {
      names(Map("spatial_filter_box" -> "9,0,1,10"))
    }
    assert(e2.getMessage.contains("inverted"))
  }

  test("spatial_filter WKT polygon keeps exactly the interior points") {
    val dir = tempDir("geo_wkt")
    val p = writeText(dir, "w.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"in_outer"},
        | "geometry":{"type":"Point","coordinates":[5.0,5.0]}},
        |{"type":"Feature","properties":{"name":"in_hole"},
        | "geometry":{"type":"Point","coordinates":[5.0,4.0]}},
        |{"type":"Feature","properties":{"name":"outside"},
        | "geometry":{"type":"Point","coordinates":[50.0,5.0]}}
        |]}""".stripMargin)
    // square with a square hole around (5,4): in_outer stays, in_hole and
    // outside drop — the even-odd walk must honor the hole ring
    val wkt = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 3, 6 3, 6 5, 4 5, 4 3))"
    val df = Catalog.attach(spark, "wkt_t", "spatial",
      Map("files" -> p, "spatial_filter" -> wkt))
    assert(df.select("name").collect().map(_.getString(0)).toSeq === Seq("in_outer"))
    // keep_wkb=false path composes the same way
    val df2 = Catalog.attach(spark, "wkt_t2", "spatial",
      Map("files" -> p, "spatial_filter" -> wkt, "keep_wkb" -> "false"))
    assert(df2.select("name").collect().map(_.getString(0)).toSeq === Seq("in_outer"))
    // malformed / non-polygon WKT rejects at attach
    val e1 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "wkt_bad", "spatial",
        Map("files" -> p, "spatial_filter" -> "LINESTRING(0 0, 1 1)"))
    }
    assert(e1.getMessage.contains("POLYGON"))
  }

  test("spatial_filter intersects line, polygon and Multi* layers exactly") {
    val dir = tempDir("geo_wkt_poly")
    val filter = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"
    def kept(file: String, body: String): Seq[String] = {
      val p = writeText(dir, file, body)
      Catalog.attach(spark, s"wkt_${file.takeWhile(_ != '.')}", "spatial",
        Map("files" -> p, "spatial_filter" -> filter))
        .select("name").collect().map(_.getString(0)).toSeq
    }
    // lines: crossing (vertices outside, one segment crosses), inside,
    // disjoint — the three LineString branches
    assert(kept("lines.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"crossing"},
        | "geometry":{"type":"LineString","coordinates":[[-5.0,5.0],[15.0,5.0]]}},
        |{"type":"Feature","properties":{"name":"inside"},
        | "geometry":{"type":"LineString","coordinates":[[2.0,2.0],[3.0,3.0]]}},
        |{"type":"Feature","properties":{"name":"disjoint"},
        | "geometry":{"type":"LineString","coordinates":[[20.0,20.0],[30.0,30.0]]}}
        |]}""".stripMargin) === Seq("crossing", "inside"))
    // polygons: geometry-inside-filter, filter-inside-geometry (no vertex
    // of either inside the other is impossible there — the big square's
    // vertices are outside but the FILTER's vertices are inside it),
    // boundary-crossing, disjoint — all three exact branches plus the
    // envelope fast-path
    assert(kept("polys.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"inside"},
        | "geometry":{"type":"Polygon","coordinates":[[[2.0,2.0],[4.0,2.0],[4.0,4.0],[2.0,4.0],[2.0,2.0]]]}},
        |{"type":"Feature","properties":{"name":"surrounds_filter"},
        | "geometry":{"type":"Polygon","coordinates":[[[-50.0,-50.0],[50.0,-50.0],[50.0,50.0],[-50.0,50.0],[-50.0,-50.0]]]}},
        |{"type":"Feature","properties":{"name":"crossing"},
        | "geometry":{"type":"Polygon","coordinates":[[[8.0,8.0],[15.0,8.0],[15.0,12.0],[8.0,12.0],[8.0,8.0]]]}},
        |{"type":"Feature","properties":{"name":"disjoint"},
        | "geometry":{"type":"Polygon","coordinates":[[[20.0,20.0],[25.0,20.0],[25.0,25.0],[20.0,25.0],[20.0,20.0]]]}}
        |]}""".stripMargin) === Seq("inside", "surrounds_filter", "crossing"))
    // a geometry sitting wholly inside a HOLE of the filter is outside
    val holed = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    val p3 = writeText(dir, "hole.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"in_hole"},
        | "geometry":{"type":"Polygon","coordinates":[[[4.5,4.5],[5.5,4.5],[5.5,5.5],[4.5,5.5],[4.5,4.5]]]}}
        |]}""".stripMargin)
    assert(Catalog.attach(spark, "wkt_hole", "spatial",
      Map("files" -> p3, "spatial_filter" -> holed)).count() === 0L)
    // Multi*: one member intersecting keeps the feature
    assert(kept("multi.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"multi_hit"},
        | "geometry":{"type":"MultiPoint","coordinates":[[50.0,50.0],[5.0,5.0]]}},
        |{"type":"Feature","properties":{"name":"multi_miss"},
        | "geometry":{"type":"MultiPolygon","coordinates":[[[[20.0,20.0],[25.0,20.0],[25.0,25.0],[20.0,25.0],[20.0,20.0]]]]}}
        |]}""".stripMargin) === Seq("multi_hit"))
  }

  test("wkb_env_intersects is a native SQL function over WKB") {
    val wkbInside = spark.sql(
      """SELECT wkb_env_intersects(geojson_to_wkb('{"type":"Point","coordinates":[2.0,3.0]}'),
        |0D, 0D, 10D, 10D) AS r""".stripMargin).head().getBoolean(0)
    assert(wkbInside)
    val wkbOutside = spark.sql(
      """SELECT wkb_env_intersects(geojson_to_wkb('{"type":"Point","coordinates":[20.0,3.0]}'),
        |0D, 0D, 10D, 10D) AS r""".stripMargin).head().getBoolean(0)
    assert(!wkbOutside)
    // polygon whose ring surrounds the box: envelopes intersect
    val poly = spark.sql(
      """SELECT wkb_env_intersects(geojson_to_wkb(
        |'{"type":"Polygon","coordinates":[[[-5.0,-5.0],[15.0,-5.0],[15.0,15.0],[-5.0,15.0],[-5.0,-5.0]]]}'),
        |0D, 0D, 10D, 10D) AS r""".stripMargin).head().getBoolean(0)
    assert(poly)
  }

  test("geojson_to_wkb is a native SQL function (SparkSessionExtensions)") {
    val json = """{"type":"Point","coordinates":[-120.66029,35.2812]}"""
    val viaSql = spark.sql(s"SELECT geojson_to_wkb('$json') AS g")
      .head().getAs[Array[Byte]](0)
    assert(viaSql.toSeq === graft.sources.GeoJson.geoJsonToWkb(json).toSeq)
    // codegen-capable: the projection stays inside whole-stage codegen
    val df = spark.range(3).selectExpr(s"geojson_to_wkb('$json') AS g")
    df.collect()
    assert(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).contains("codegen id"))
    // type checking rejects non-string input
    intercept[Exception] { spark.sql("SELECT geojson_to_wkb(42)").collect() }
  }

  test("polygon WKB encodes ring structure") {
    val wkb = graft.sources.GeoJson.geoJsonToWkb(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")
    val bb = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.get(); assert(bb.getInt === 3) // polygon
    assert(bb.getInt === 1)           // 1 ring
    assert(bb.getInt === 4)           // 4 points
  }
}
