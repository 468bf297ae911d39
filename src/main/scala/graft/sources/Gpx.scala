package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.{Document, Element, Node}

/** Native GPX reader — the GDAL GPX driver surface the reference reaches
  * through `st_read` (reference: src/duckdb/spatial.rs:29-82), re-expressed
  * without GDAL. GPX is a FIXED-schema format (the GPS exchange XSD), so
  * unlike KML/GML there is no driver-side probe at all: the five GDAL
  * layers and their columns are closed forms —
  *
  *   waypoints     one row per <wpt>:   name, desc, ele, time, Point
  *   routes        one row per <rte>:   name, desc, LineString of <rtept>
  *   tracks        one row per <trk>:   name, desc, MultiLineString of
  *                                      <trkseg> polylines
  *   route_points  one row per <rtept>: route_fid, route_point_id,
  *                                      name, ele, time, Point
  *   track_points  one row per <trkpt>: track_fid, track_seg_id,
  *                                      track_seg_point_id, ele, time, Point
  *
  * selected with `layer` (default `waypoints`); an unknown layer rejects
  * loudly listing the five. fid/id columns are 0-based document order
  * within their file, the GDAL numbering.
  *
  * Scale shape: zero driver work — files parse in EXECUTORS, one task per
  * file via a raw-bytes binaryFile scan (the XML parser honors each
  * document's own prolog encoding; external entities disabled, no XXE).
  * Geometry: GPX stores positions as lat/lon ATTRIBUTES; WKB is (x=lon,
  * y=lat) through the shared GeoJSON→WKB codec, so Point/LineString bytes
  * are identical across every spatial driver here. Elevation is a column
  * (`ele`), never a third coordinate — the shared codec is 2-D. Loud
  * degradation: a point element missing its lat or lon attribute, or a
  * route/track with an empty point list, fails naming the element — GDAL
  * silently skips such features; this engine's house rule is loud. */
object Gpx {

  val Layers: Seq[String] =
    Seq("waypoints", "routes", "tracks", "route_points", "track_points")

  def read(spark: SparkSession, files: Seq[String],
      options: Map[String, String]): DataFrame = {
    require(files.nonEmpty, "gpx read needs at least one file")
    val layer = options.getOrElse("layer", "waypoints")
    if (!Layers.contains(layer)) throw new IllegalArgumentException(
      s"GPX layer `$layer` does not exist; the GPX layers are " +
        Layers.mkString("`", "`, `", "`"))
    val schema = layerSchema(layer)
    val texts = spark.read.format("binaryFile").load(files: _*).select("content")
    val rows = texts.rdd.flatMap { r =>
      val doc = parseXml(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0)))
      layerRows(doc, layer)
    }
    spark.createDataFrame(rows, schema)
  }

  private def layerSchema(layer: String): StructType = layer match {
    case "waypoints" => StructType(Seq(
      StructField("name", StringType), StructField("desc", StringType),
      StructField("ele", DoubleType), StructField("time", StringType),
      StructField("geom", BinaryType)))
    case "routes" | "tracks" => StructType(Seq(
      StructField("name", StringType), StructField("desc", StringType),
      StructField("geom", BinaryType)))
    case "route_points" => StructType(Seq(
      StructField("route_fid", LongType), StructField("route_point_id", LongType),
      StructField("name", StringType), StructField("ele", DoubleType),
      StructField("time", StringType), StructField("geom", BinaryType)))
    case "track_points" => StructType(Seq(
      StructField("track_fid", LongType), StructField("track_seg_id", LongType),
      StructField("track_seg_point_id", LongType), StructField("ele", DoubleType),
      StructField("time", StringType), StructField("geom", BinaryType)))
  }

  private def layerRows(doc: Document, layer: String): Seq[Row] = {
    val root = doc.getDocumentElement
    layer match {
      case "waypoints" =>
        childrenByLocalName(root, "wpt").map { w =>
          Row(text(w, "name"), text(w, "desc"), eleOf(w), text(w, "time"),
            GeoJson.geoJsonToWkb(s"""{"type":"Point","coordinates":${lonLat(w)}}"""))
        }
      case "routes" =>
        childrenByLocalName(root, "rte").map { rte =>
          val pts = childrenByLocalName(rte, "rtept")
          if (pts.isEmpty) throw new IllegalArgumentException(
            "GPX <rte> carries no <rtept> positions — an empty route has no " +
              "LineString; drop the element or read layer=route_points")
          Row(text(rte, "name"), text(rte, "desc"), GeoJson.geoJsonToWkb(
            s"""{"type":"LineString","coordinates":[${pts.map(lonLat).mkString(",")}]}"""))
        }
      case "tracks" =>
        childrenByLocalName(root, "trk").map { trk =>
          val segs = childrenByLocalName(trk, "trkseg")
            .map(seg => childrenByLocalName(seg, "trkpt"))
          if (segs.isEmpty || segs.exists(_.isEmpty)) throw new IllegalArgumentException(
            "GPX <trk> carries no <trkseg> / an empty segment — a track needs " +
              "at least one positioned segment; drop it or read layer=track_points")
          Row(text(trk, "name"), text(trk, "desc"), GeoJson.geoJsonToWkb(
            s"""{"type":"MultiLineString","coordinates":[${
              segs.map(pts => s"[${pts.map(lonLat).mkString(",")}]").mkString(",")}]}"""))
        }
      case "route_points" =>
        childrenByLocalName(root, "rte").zipWithIndex.flatMap { case (rte, fid) =>
          childrenByLocalName(rte, "rtept").zipWithIndex.map { case (p, i) =>
            Row(fid.toLong, i.toLong, text(p, "name"), eleOf(p), text(p, "time"),
              GeoJson.geoJsonToWkb(s"""{"type":"Point","coordinates":${lonLat(p)}}"""))
          }
        }
      case "track_points" =>
        childrenByLocalName(root, "trk").zipWithIndex.flatMap { case (trk, fid) =>
          childrenByLocalName(trk, "trkseg").zipWithIndex.flatMap { case (seg, sid) =>
            childrenByLocalName(seg, "trkpt").zipWithIndex.map { case (p, i) =>
              Row(fid.toLong, sid.toLong, i.toLong, eleOf(p), text(p, "time"),
                GeoJson.geoJsonToWkb(s"""{"type":"Point","coordinates":${lonLat(p)}}"""))
            }
          }
        }
    }
  }

  // ------------------------------------------------------------ parsing

  private def parseXml(in: java.io.InputStream): Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(in)
  }

  private def localName(e: Element): String = {
    val t = e.getTagName
    val i = t.indexOf(':')
    if (i >= 0) t.substring(i + 1) else t
  }

  /** DIRECT children with the given local name, document order (GPX nesting
    * is strict — wpt/rte/trk under gpx, rtept under rte, trkseg under trk,
    * trkpt under trkseg — so a recursive walk would double-count). */
  private def childrenByLocalName(e: Element, name: String): Seq[Element] = {
    val out = mutable.Buffer[Element]()
    var c = e.getFirstChild
    while (c != null) {
      c match {
        case ce: Element if localName(ce) == name => out += ce
        case _ => ()
      }
      c = c.getNextSibling
    }
    out.toSeq
  }

  private def text(e: Element, name: String): String =
    childrenByLocalName(e, name).headOption
      .map(_.getTextContent.trim).filter(_.nonEmpty).orNull

  private def eleOf(e: Element): Any =
    childrenByLocalName(e, "ele").headOption
      .map(_.getTextContent.trim).filter(_.nonEmpty).map(_.toDouble).orNull

  /** "[lon,lat]" from the element's lat/lon ATTRIBUTES (the GPX position
    * encoding); loud when either is missing or non-numeric. */
  private def lonLat(e: Element): String = {
    val lat = e.getAttribute("lat")
    val lon = e.getAttribute("lon")
    if (lat.isEmpty || lon.isEmpty) throw new IllegalArgumentException(
      s"GPX <${localName(e)}> needs lat and lon attributes (got lat=`$lat` " +
        s"lon=`$lon`); GDAL skips such points silently — fix the file instead")
    s"[${lon.toDouble},${lat.toDouble}]"
  }
}
