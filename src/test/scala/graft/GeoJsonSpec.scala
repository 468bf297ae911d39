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

  test("polygon WKB encodes ring structure") {
    val wkb = graft.sources.GeoJson.geoJsonToWkb(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")
    val bb = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.get(); assert(bb.getInt === 3) // polygon
    assert(bb.getInt === 1)           // 1 ring
    assert(bb.getInt === 4)           // 4 points
  }
}
