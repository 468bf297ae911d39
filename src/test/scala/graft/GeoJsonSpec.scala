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
    Seq("layer", "spatial_filter_box", "allowed_drivers").foreach { opt =>
      val e = intercept[Catalog.InvalidOptionException] {
        Catalog.attach(spark, "rej_spatial", "spatial", Map("files" -> p, opt -> "v"))
      }
      assert(e.getMessage.contains(opt))
    }
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
