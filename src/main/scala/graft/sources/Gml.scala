package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.{Document, Element, Node}

/** Native GML reader — the GDAL GML driver surface the reference reaches
  * through `st_read` (reference: src/duckdb/spatial.rs:29-82), re-expressed
  * without GDAL: one row per feature member of a `FeatureCollection`,
  * columns `gml_id` (the feature's gml:id/fid attribute), the feature's
  * simple properties (string-typed — GML carries no inline types; a typed
  * CREATE FOREIGN TABLE casts, exactly GDAL's no-.xsd behavior), and the
  * geometry as the same WKB `geom` binary contract every other spatial
  * driver here delivers.
  *
  * Scale shape mirrors the KML driver: ONE probe file derives the
  * attribute schema on the driver (union over that file's features); the
  * files parse in EXECUTORS via a raw-bytes binaryFile scan, one task per
  * file (the XML parser honors each document's own prolog encoding). An
  * attribute appearing only in a LATER file rejects loudly naming the
  * probe file — never silent narrowing. Geometry encoding reuses the
  * GeoJSON→WKB codec, so bytes are identical across drivers.
  *
  * Geometry surface: GML3 `pos`/`posList` and GML2 `coordinates` (cs/ts
  * separators honored), Point/LineString/Polygon (exterior|outerBoundaryIs
  * + interior|innerBoundaryIs rings), MultiPoint/MultiLineString/
  * MultiCurve/MultiPolygon/MultiSurface via their *Member(s) properties.
  * `srsDimension=3` tuples drop z (the shared codec is 2-D, as everywhere
  * here); tuples are read in DOCUMENT ORDER as (x, y) — no srsName axis
  * flipping (GDAL's behavior without axis-order hints). Non-linear shapes
  * (Curve/Arc/Surface/Solid) reject loudly. External entities disabled
  * (no XXE). */
object Gml {

  def read(spark: SparkSession, files: Seq[String],
      options: Map[String, String]): DataFrame = {
    require(files.nonEmpty, "gml read needs at least one file")
    val conf = spark.sessionState.newHadoopConf()
    // --- driver probe: attribute schema from the FIRST file (all features) ---
    val probeFile = files.head
    val firstDoc = {
      val p = new Path(probeFile)
      val in = p.getFileSystem(conf).open(p)
      try parseXml(in) finally in.close()
    }
    val attrs = mutable.LinkedHashSet[String]()
    featuresOf(firstDoc).foreach { f =>
      propertiesOf(f).foreach {
        case (name, None) => attrs += name
        case _ => ()
      }
    }
    val attrNames = attrs.toSeq
    val schema = StructType(
      StructField("gml_id", StringType) +:
        attrNames.map(n => StructField(n, StringType)) :+
        StructField("geom", BinaryType))

    // --- executor parse: one whole document per task ---
    // raw bytes, not wholetext: the XML parser must see the original
    // encoding (a text round-trip would mojibake non-UTF-8 prologs)
    val texts = spark.read.format("binaryFile").load(files: _*).select("content")
    val rows = texts.rdd.flatMap { r =>
      val doc = parseXml(new java.io.ByteArrayInputStream(
        r.getAs[Array[Byte]](0)))
      featuresOf(doc).map(f => featureRow(f, attrNames, probeFile))
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

  private def childElements(e: Element): Seq[Element] = {
    val out = mutable.Buffer[Element]()
    var c = e.getFirstChild
    while (c != null) {
      c match { case ce: Element => out += ce; case _ => () }
      c = c.getNextSibling
    }
    out.toSeq
  }

  /** Feature elements: the single element child of each `featureMember` /
    * `member`, every element child of a `featureMembers`, document order. */
  private def featuresOf(doc: Document): Seq[Element] = {
    val out = mutable.Buffer[Element]()
    def walk(n: Node): Unit = n match {
      case e: Element =>
        localName(e) match {
          case "featureMember" | "member" => out ++= childElements(e)
          case "featureMembers" => out ++= childElements(e)
          case _ => childElements(e).foreach(walk)
        }
      case _ => ()
    }
    walk(doc.getDocumentElement)
    out.toSeq
  }

  private val GeomNames = Set("Point", "LineString", "Polygon", "MultiPoint",
    "MultiLineString", "MultiCurve", "MultiPolygon", "MultiSurface")
  private val RejectGeoms = Set("Curve", "Arc", "ArcString", "Surface",
    "CompositeSurface", "Solid", "MultiGeometry", "GeometryCollection")

  /** A feature's properties in document order: (name, Some(geometry
    * element)) for the geometry property, (name, None) for a simple text
    * property. Complex non-geometry properties reject loudly (GDAL's
    * flattening heuristics are out of native scope — loud beats lossy). */
  private def propertiesOf(f: Element): Seq[(String, Option[Element])] =
    childElements(f).map { p =>
      val kids = childElements(p)
      kids.find(k => GeomNames(localName(k))) match {
        case Some(g) => (localName(p), Some(g))
        case None =>
          kids.find(k => RejectGeoms(localName(k))).foreach { g =>
            throw new IllegalArgumentException(
              s"GML geometry `${localName(g)}` has no WKB mapping in this " +
                "native reader (non-linear or heterogeneous shape); use a " +
                "GDAL deployment")
          }
          if (kids.nonEmpty) throw new IllegalArgumentException(
            s"GML property `${localName(p)}` nests complex content — this " +
              "native reader serves simple (text) properties and one " +
              "geometry property; flatten the schema or use a GDAL deployment")
          (localName(p), None)
      }
    }

  private def featureRow(f: Element, attrNames: Seq[String],
      probeFile: String): Row = {
    val id = Seq("gml:id", "id", "fid").map(f.getAttribute)
      .find(_.nonEmpty).orNull
    val values = mutable.Map[String, String]()
    var geom: Array[Byte] = null
    childElements(f).zip(propertiesOf(f)).foreach {
      case (_, (_, Some(g))) =>
        if (geom != null) throw new IllegalArgumentException(
          "GML feature carries more than one geometry property — this " +
            "native reader serves exactly one `geom` column")
        geom = GeoJson.geoJsonToWkb(geoJson(g))
      case (p, (n, None)) =>
        val t = p.getTextContent.trim
        values(n) = if (t.nonEmpty) t else null
    }
    val declared = attrNames.toSet
    values.keys.find(!declared.contains(_)).foreach { n =>
      throw new IllegalArgumentException(
        s"GML attribute `$n` is not in the probed schema (attribute columns " +
          s"were derived from `$probeFile`) — it appears only in a later " +
          "file and would be silently dropped; probe that file first or " +
          "restructure the documents to declare a shared schema")
    }
    Row.fromSeq(id +: attrNames.map(values.get(_).flatMap(Option(_)).orNull) :+ geom)
  }

  // ------------------------------------- GML geometry → GeoJSON text

  /** Coordinate tuples of `e`'s DIRECT pos/posList/coordinates child, as
    * GeoJSON "[x,y]" texts. srsDimension (on the element or the list) > 2
    * drops the extra ordinates; GML2 `coordinates` honors cs/ts. */
  private def tuples(e: Element): Seq[String] = {
    val kids = childElements(e)
    def dim(el: Element): Int = {
      val d = Seq(el.getAttribute("srsDimension"), e.getAttribute("srsDimension"))
        .find(_.nonEmpty).map(_.toInt).getOrElse(2)
      if (d < 2 || d > 3) throw new IllegalArgumentException(
        s"GML srsDimension=$d is not representable in the shared 2-D WKB codec")
      d
    }
    kids.find(k => localName(k) == "posList").map { pl =>
      val d = dim(pl)
      val nums = pl.getTextContent.trim.split("\\s+").filter(_.nonEmpty)
      if (nums.length % d != 0) throw new IllegalArgumentException(
        s"GML posList length ${nums.length} is not a multiple of srsDimension $d")
      nums.grouped(d).map(t => s"[${t(0).toDouble},${t(1).toDouble}]").toSeq
    }.orElse {
      // GML3 also allows a LineString/LinearRing as REPEATED <gml:pos>
      // children — taking only the first would silently truncate the shape
      val poss = kids.filter(k => localName(k) == "pos")
      if (poss.isEmpty) None
      else Some(poss.map { p =>
        val nums = p.getTextContent.trim.split("\\s+").filter(_.nonEmpty)
        if (nums.length < 2) throw new IllegalArgumentException(
          s"GML pos `${p.getTextContent.trim}` needs at least x y")
        s"[${nums(0).toDouble},${nums(1).toDouble}]"
      })
    }.orElse(kids.find(k => localName(k) == "coordinates").map { c =>
      val cs = Option(c.getAttribute("cs")).filter(_.nonEmpty).getOrElse(",")
      val ts = Option(c.getAttribute("ts")).filter(_.nonEmpty).getOrElse(" ")
      c.getTextContent.trim.split(java.util.regex.Pattern.quote(ts) + "|\\s+")
        .filter(_.nonEmpty).toSeq.map { tup =>
          val parts = tup.split(java.util.regex.Pattern.quote(cs))
          if (parts.length < 2) throw new IllegalArgumentException(
            s"GML coordinate tuple `$tup` needs x${cs}y")
          s"[${parts(0).toDouble},${parts(1).toDouble}]"
        }
    }).getOrElse(throw new IllegalArgumentException(
      s"GML ${localName(e)} carries no pos/posList/coordinates"))
  }

  private def ringOf(boundary: Element): Element =
    childElements(boundary).find(k => localName(k) == "LinearRing").getOrElse(
      throw new IllegalArgumentException(
        s"GML ${localName(boundary)} lacks a LinearRing (curved rings have " +
          "no WKB mapping in this native reader)"))

  private def polygonRings(e: Element): String = {
    val kids = childElements(e)
    val outer = kids.find(k =>
      localName(k) == "exterior" || localName(k) == "outerBoundaryIs")
      .map(ringOf).getOrElse(throw new IllegalArgumentException(
        "GML Polygon lacks <exterior>/<outerBoundaryIs>"))
    val inners = kids.filter(k =>
      localName(k) == "interior" || localName(k) == "innerBoundaryIs").map(ringOf)
    (outer +: inners).map(r => s"[${tuples(r).mkString(",")}]")
      .mkString("[", ",", "]")
  }

  /** Member geometries of a Multi* container: the element children of each
    * `*Member` property plus every element child of a `*Members` batch. */
  private def members(e: Element, expect: String): Seq[Element] = {
    val out = childElements(e).flatMap { m =>
      val ln = localName(m)
      if (ln.endsWith("Member") || ln.endsWith("Members")) childElements(m)
      else Nil
    }
    out.foreach { g =>
      if (localName(g) != expect) throw new IllegalArgumentException(
        s"GML ${localName(e)} member `${localName(g)}` is not a $expect — " +
          "no WKB mapping in this native reader; use a GDAL deployment")
    }
    if (out.isEmpty) throw new IllegalArgumentException(
      s"GML ${localName(e)} carries no member geometries")
    out
  }

  private def geoJson(e: Element): String = localName(e) match {
    case "Point" => s"""{"type":"Point","coordinates":${tuples(e).head}}"""
    case "LineString" =>
      s"""{"type":"LineString","coordinates":[${tuples(e).mkString(",")}]}"""
    case "Polygon" => s"""{"type":"Polygon","coordinates":${polygonRings(e)}}"""
    case "MultiPoint" =>
      s"""{"type":"MultiPoint","coordinates":[${members(e, "Point").map(p => tuples(p).head).mkString(",")}]}"""
    case "MultiLineString" | "MultiCurve" =>
      s"""{"type":"MultiLineString","coordinates":[${members(e, "LineString").map(l => s"[${tuples(l).mkString(",")}]").mkString(",")}]}"""
    case "MultiPolygon" | "MultiSurface" =>
      s"""{"type":"MultiPolygon","coordinates":[${members(e, "Polygon").map(polygonRings).mkString(",")}]}"""
    case other => throw new IllegalArgumentException(
      s"GML geometry `$other` has no WKB mapping in this native reader; " +
        "use a GDAL deployment")
  }
}
