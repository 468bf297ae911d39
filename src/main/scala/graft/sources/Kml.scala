package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.{Document, Element, Node}

/** Native KML reader — the GDAL KML/LIBKML driver surface the reference
  * reaches through `st_read` (reference: src/duckdb/spatial.rs:29-82),
  * re-expressed without GDAL: one row per `<Placemark>`, columns `name`,
  * `description`, the document's declared `<Schema><SimpleField>` columns
  * (typed), any untyped `<Data name=…>` extended-data columns (string),
  * and the geometry as the same WKB `geom` binary contract every other
  * spatial driver here delivers.
  *
  * Scale shape: the driver probes ONE file for the attribute schema
  * (bounded metadata work — KML documents declare their schema up front);
  * the files themselves parse in EXECUTORS, one task per file via a
  * raw-bytes binaryFile scan (the XML parser honors each document's own
  * prolog encoding), so a directory of region extracts fans out. Geometry
  * encoding reuses the GeoJSON→WKB codec (`GeoJson.geoJsonToWkb`), so
  * Point/LineString/Polygon/Multi* bytes are identical across drivers.
  * XML parsing is namespace-agnostic by LOCAL name (KML documents arrive
  * with and without the default-namespace declaration) and external
  * entities are disabled (no XXE). Unsupported shapes reject loudly:
  * mixed-type `<MultiGeometry>` (no GeometryCollection in the WKB codec)
  * and `<gx:Track>`-style extension geometries. */
object Kml {

  def read(spark: SparkSession, files: Seq[String],
      options: Map[String, String]): DataFrame = {
    require(files.nonEmpty, "kml read needs at least one file")
    val conf = spark.sessionState.newHadoopConf()
    // --- driver probe: attribute schema from the FIRST file ---
    val firstDoc = {
      val p = new Path(files.head)
      val in = p.getFileSystem(conf).open(p)
      try parseXml(in) finally in.close()
    }
    // typed declared fields (<Schema><SimpleField type=… name=…/>)
    val declared: Seq[(String, DataType)] =
      elementsByLocalName(firstDoc.getDocumentElement, "SimpleField").map { e =>
        val n = e.getAttribute("name")
        val t = e.getAttribute("type").toLowerCase match {
          case "int" | "short" | "ushort" => IntegerType
          case "uint" => LongType
          case "float" => FloatType
          case "double" => DoubleType
          case "bool" => BooleanType
          case _ => StringType
        }
        (n, t)
      }
    // untyped <Data name=…> keys, document order, minus declared ones
    val dataNames: Seq[String] =
      elementsByLocalName(firstDoc.getDocumentElement, "Data")
        .map(_.getAttribute("name")).filter(_.nonEmpty).distinct
        .filterNot(n => declared.exists(_._1 == n))
    val attrSpec: Seq[(String, DataType)] =
      declared ++ dataNames.map(_ -> StringType)
    val schema = StructType(
      Seq(StructField("name", StringType), StructField("description", StringType)) ++
        attrSpec.map { case (n, t) => StructField(n, t) } :+
        StructField("geom", BinaryType))
    val spec: Seq[(String, String)] =
      attrSpec.map { case (n, t) => (n, t.typeName) }

    // --- executor parse: one whole document per task ---
    // loud degradation: the schema came from ONE probe file, so an
    // attribute appearing only in a LATER file would otherwise be silently
    // dropped from every row — detect it during parse and fail naming the
    // probe file instead (GDAL-KML silently narrows here; this engine's
    // house rule is loud)
    val probeFile = files.head
    // raw bytes, not wholetext: the XML parser must see the original
    // encoding (a text round-trip would mojibake non-UTF-8 prologs)
    val texts = spark.read.format("binaryFile").load(files: _*).select("content")
    val rows = texts.rdd.flatMap { r =>
      val doc = parseXml(new java.io.ByteArrayInputStream(
        r.getAs[Array[Byte]](0)))
      elementsByLocalName(doc.getDocumentElement, "Placemark").map { pm =>
        placemarkRow(pm, spec, probeFile)
      }
    }
    spark.createDataFrame(rows, schema)
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

  /** All descendant elements with the given KML local name, document
    * order, namespace-prefix-agnostic. */
  private def elementsByLocalName(root: Element, name: String): Seq[Element] = {
    val out = mutable.Buffer[Element]()
    def walk(n: Node): Unit = n match {
      case e: Element =>
        if (localName(e) == name) out += e
        var c = e.getFirstChild
        while (c != null) { walk(c); c = c.getNextSibling }
      case _ => ()
    }
    walk(root)
    out.toSeq
  }

  private def childByLocalName(e: Element, name: String): Option[Element] = {
    var c = e.getFirstChild
    while (c != null) {
      c match {
        case ce: Element if localName(ce) == name => return Some(ce)
        case _ => ()
      }
      c = c.getNextSibling
    }
    None
  }

  private def placemarkRow(pm: Element, spec: Seq[(String, String)],
      probeFile: String): Row = {
    def text(n: String): String =
      childByLocalName(pm, n).map(_.getTextContent.trim).filter(_.nonEmpty).orNull
    // extended data: SchemaData SimpleData (declared) + Data/value pairs
    val values = mutable.Map[String, String]()
    elementsByLocalName(pm, "SimpleData").foreach { e =>
      values(e.getAttribute("name")) = e.getTextContent.trim
    }
    elementsByLocalName(pm, "Data").foreach { e =>
      childByLocalName(e, "value").foreach(v =>
        values(e.getAttribute("name")) = v.getTextContent.trim)
    }
    val specNames = spec.map(_._1).toSet
    values.keys.filter(_.nonEmpty).find(!specNames.contains(_)).foreach { n =>
      throw new IllegalArgumentException(
        s"KML attribute `$n` is not in the probed schema (attribute columns " +
          s"were derived from `$probeFile`) — it appears only in a later " +
          "file and would be silently dropped; probe that file first or " +
          "restructure the documents to declare a shared schema")
    }
    def typed(n: String, t: String): Any = values.get(n) match {
      case None | Some("") => null
      case Some(v) => t match {
        case "integer" => v.toInt
        case "long" => v.toLong
        case "float" => v.toFloat
        case "double" => v.toDouble
        case "boolean" => v == "1" || v.equalsIgnoreCase("true")
        case _ => v
      }
    }
    val geom = geometryOf(pm).map(GeoJson.geoJsonToWkb).orNull
    Row.fromSeq(Seq(text("name"), text("description")) ++
      spec.map { case (n, t) => typed(n, t) } :+ geom)
  }

  // ------------------------------------- KML geometry → GeoJSON text

  private val GeomNames = Set("Point", "LineString", "Polygon", "MultiGeometry")

  private def geometryOf(pm: Element): Option[String] = {
    var c = pm.getFirstChild
    while (c != null) {
      c match {
        case e: Element if GeomNames(localName(e)) => return Some(geoJson(e))
        case e: Element if localName(e).endsWith("Track") ||
            localName(e) == "Model" =>
          throw new IllegalArgumentException(
            s"KML geometry `${localName(e)}` is a KML-extension shape with no " +
              "WKB mapping in this native reader; use a GDAL deployment")
        case _ => ()
      }
      c = c.getNextSibling
    }
    None
  }

  private def geoJson(e: Element): String = localName(e) match {
    case "Point" => s"""{"type":"Point","coordinates":${coords(e).head}}"""
    case "LineString" =>
      s"""{"type":"LineString","coordinates":[${coords(e).mkString(",")}]}"""
    case "Polygon" => s"""{"type":"Polygon","coordinates":${polygonRings(e)}}"""
    case "MultiGeometry" =>
      val parts = {
        val out = mutable.Buffer[Element]()
        var c = e.getFirstChild
        while (c != null) {
          c match {
            case ce: Element if GeomNames(localName(ce)) &&
              localName(ce) != "MultiGeometry" => out += ce
            case _ => ()
          }
          c = c.getNextSibling
        }
        out.toSeq
      }
      val kinds = parts.map(localName).distinct
      if (parts.isEmpty || kinds.length != 1) throw new IllegalArgumentException(
        s"KML MultiGeometry with ${if (parts.isEmpty) "no" else "mixed"} child " +
          "geometries has no WKB Multi* mapping (GeometryCollection is out of " +
          "this codec's scope); split the placemark or use a GDAL deployment")
      kinds.head match {
        case "Point" =>
          s"""{"type":"MultiPoint","coordinates":[${parts.map(p => coords(p).head).mkString(",")}]}"""
        case "LineString" =>
          s"""{"type":"MultiLineString","coordinates":[${parts.map(p => s"[${coords(p).mkString(",")}]").mkString(",")}]}"""
        case "Polygon" =>
          s"""{"type":"MultiPolygon","coordinates":[${parts.map(polygonRings).mkString(",")}]}"""
      }
  }

  /** `<coordinates>` of `e` (its DIRECT geometry): "lon,lat[,alt]" tuples,
    * whitespace-separated, → GeoJSON "[lon,lat]" texts. Altitude drops —
    * the shared WKB codec is 2-D, matching the other drivers here. */
  private def coords(e: Element): Seq[String] = {
    val node = elementsByLocalName(e, "coordinates").headOption.getOrElse(
      throw new IllegalArgumentException(
        s"KML ${localName(e)} carries no <coordinates>"))
    node.getTextContent.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { tup =>
      val parts = tup.split(",")
      if (parts.length < 2) throw new IllegalArgumentException(
        s"KML coordinate tuple `$tup` needs lon,lat")
      s"[${parts(0).toDouble},${parts(1).toDouble}]"
    }
  }

  private def polygonRings(e: Element): String = {
    val outer = childByLocalName(e, "outerBoundaryIs").flatMap(b =>
      childByLocalName(b, "LinearRing")).getOrElse(
      throw new IllegalArgumentException(
        "KML Polygon lacks <outerBoundaryIs><LinearRing>"))
    val inners = {
      val out = mutable.Buffer[Element]()
      var c = e.getFirstChild
      while (c != null) {
        c match {
          case ce: Element if localName(ce) == "innerBoundaryIs" =>
            childByLocalName(ce, "LinearRing").foreach(out += _)
          case _ => ()
        }
        c = c.getNextSibling
      }
      out.toSeq
    }
    (outer +: inners).map(r => s"[${coords(r).mkString(",")}]")
      .mkString("[", ",", "]")
  }
}
