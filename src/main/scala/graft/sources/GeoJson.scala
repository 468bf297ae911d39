package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal geospatial source: GeoJSON FeatureCollection → DataFrame with the
  * feature properties as columns and the geometry as a WKB `geom` binary
  * column — the one behavior the reference's spatial tests pin
  * (reference: src/duckdb/spatial.rs:29-82; tests/tests/spatial.rs:33-77,
  * GeoJSON in → WKB blob out). The full GDAL driver surface is out of scope
  * (SURVEY §7 step 8).
  *
  * WKB encoding is the public OGC little-endian format: 1-byte order, uint32
  * geometry type (1 Point, 2 LineString, 3 Polygon, 4-6 Multi*), doubles.
  */
object GeoJson {

  def read(spark: SparkSession, files: Seq[String], options: Map[String, String]): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(files: _*)
    val feats = raw.select(explode(col("features")).as("f"))
    val hasProps = feats.schema("f").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains("properties")
    val base = if (hasProps) feats.select(col("f.properties.*"), col("f.geometry").as("geometry"))
               else feats.select(col("f.geometry").as("geometry"))
    // keep_wkb toggles the geometry REPRESENTATION, never column presence
    // (reference: src/duckdb/spatial.rs:29-54 passes keep_wkb to st_read,
    // which yields a WKB_BLOB geometry column when true and the engine's
    // GEOMETRY type when false). This engine has no GEOMETRY type; the
    // native representation is canonical GeoJSON text. Default matches the
    // reference's FDW usage (WKB — GEOMETRY cannot cross the FDW boundary).
    // geojson_to_wkb is a native codegen Expression injected by
    // Engine.configure via SparkSessionExtensions (graft.functions).
    if (options.get("keep_wkb").exists(_.toBoolean == false))
      base.withColumn("geom", to_json(col("geometry"))).drop("geometry")
    else
      base.withColumn("geom", expr("geojson_to_wkb(to_json(geometry))")).drop("geometry")
  }

  private val mapper = new ObjectMapper()

  /** GeoJSON geometry object (as JSON text) → WKB bytes. Null-safe. */
  def geoJsonToWkb(geometryJson: String): Array[Byte] = {
    if (geometryJson == null) return null
    val node = mapper.readTree(geometryJson)
    encodeGeometry(node)
  }

  /** Spark's JSON inference widens heterogeneous coordinate arrays (Point's
    * [x,y] vs LineString's [[x,y],...]) to array<string>, so a coordinates
    * node (or any nested level) may arrive as JSON text — re-parse it. */
  private def j(node: JsonNode): JsonNode =
    if (node != null && node.isTextual) mapper.readTree(node.asText()) else node

  private def encodeGeometry(node: JsonNode): Array[Byte] = {
    val typ = node.get("type").asText()
    val coords = j(node.get("coordinates"))
    typ match {
      case "Point" => header(1) ++ point(coords)
      case "LineString" => header(2) ++ ring(coords)
      case "Polygon" => header(3) ++ rings(coords)
      case "MultiPoint" => collection(4, coords, c => header(1) ++ point(j(c)))
      case "MultiLineString" => collection(5, coords, c => header(2) ++ ring(j(c)))
      case "MultiPolygon" => collection(6, coords, c => header(3) ++ rings(j(c)))
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON geometry `$other`")
    }
  }

  private def header(geomType: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(geomType)
    b.array()
  }

  private def point(c: JsonNode): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(c.get(0).asDouble()).putDouble(c.get(1).asDouble())
    b.array()
  }

  private def ring(c: JsonNode): Array[Byte] = {
    val n = c.size()
    val b = ByteBuffer.allocate(4 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(n)
    (0 until n).foreach { i =>
      val pt = j(c.get(i))
      b.putDouble(pt.get(0).asDouble()).putDouble(pt.get(1).asDouble())
    }
    b.array()
  }

  private def rings(c: JsonNode): Array[Byte] = {
    val parts = (0 until c.size()).map(i => ring(j(c.get(i))))
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(c.size()).array() ++
      parts.flatten
  }

  private def collection(geomType: Int, c: JsonNode, enc: JsonNode => Array[Byte]): Array[Byte] = {
    val parts = (0 until c.size()).map(i => enc(c.get(i)))
    header(geomType) ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(c.size()).array() ++
      parts.flatten
  }
}
