package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native AutoCAD DXF reader — the `st_read` DXF driver surface
  * (reference src/duckdb/spatial.rs:29-82 reaches it via GDAL; this is a
  * from-scratch parse of the public ASCII DXF format: the file is a flat
  * stream of (group code, value) line pairs, entities living between
  * `SECTION`/`2`/`ENTITIES` and `ENDSEC`).
  *
  * Model mirrors GDAL's DXF driver: ONE feature layer per file, one row
  * per entity with `layer` (group 8), `handle` (group 5), `etype` (the
  * entity keyword) and `geom` as the SAME OGC WKB contract as every
  * spatial driver here. Entities in scope:
  *
  *   - POINT (10/20)                          → Point
  *   - LINE (10/20 → 11/21)                   → LineString
  *   - LWPOLYLINE (90 count, 70 bit0 closed,
  *     repeated 10/20)                        → LineString, closed → Polygon
  *   - POLYLINE … VERTEX … SEQEND (old style) → same mapping
  *
  * Out-of-scope constructs reject LOUDLY naming the file: nonzero Z
  * (group 30/38 elevation), curve entities (ARC, CIRCLE, ELLIPSE, SPLINE),
  * LWPOLYLINE bulge arcs (group 42 ≠ 0), INSERT block references, 3DFACE.
  * Unknown entity keywords also reject (a silent skip would drop data).
  * Schema is fixed, so files parse in EXECUTORS one task per file with no
  * driver probe; the shapefile layer-file model (basename = layer) applies. */
object Dxf {

  final case class DxfException(msg: String) extends IllegalArgumentException(msg)

  val schema: StructType = StructType(Seq(
    StructField("layer", StringType, nullable = true),
    StructField("handle", StringType, nullable = true),
    StructField("etype", StringType, nullable = false),
    StructField("geom", BinaryType, nullable = true)))

  def read(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw DxfException("DXF attach needs at least one .dxf path")
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[String] = paths.flatMap { p =>
      if (p.exists("*?[{".contains(_))) {
        val hp = new Path(p)
        val matched = Option(hp.getFileSystem(conf).globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw DxfException(s"glob `$p` matches no .dxf files")
        matched.map(_.getPath.toString)
      } else Seq(p)
    }
    import scala.jdk.CollectionConverters._
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        parseOne(c, f)
      }
    spark.createDataFrame(rows, schema)
  }

  // ------------------------------------------------------------- parsing

  /** The DXF pair stream: (code, value) per two lines; codes are integers
    * with arbitrary leading whitespace (the fixed-width AutoCAD layout). */
  private def pairs(conf: Configuration, f: String): Iterator[(Int, String)] = {
    val p = new Path(f)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw DxfException(s"`$f`: file does not exist")
    val in = fs.open(p)
    val bytes = try {
      val len = fs.getFileStatus(p).getLen.toInt
      val a = new Array[Byte](len); in.readFully(0, a); a
    } finally in.close()
    val lines = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\r?\n", -1).iterator
    new Iterator[(Int, String)] {
      def hasNext: Boolean = lines.hasNext
      def next(): (Int, String) = {
        val codeLine = lines.next().trim
        if (!lines.hasNext) throw DxfException(
          s"`$f`: dangling group code `$codeLine` at end of file")
        val value = lines.next()
        val code = try codeLine.toInt catch {
          case _: NumberFormatException => throw DxfException(
            s"`$f`: group code `$codeLine` is not an integer — not a DXF file?")
        }
        (code, value.trim)
      }
    }
  }

  private def parseOne(conf: Configuration, f: String): Iterator[Row] = {
    val it = pairs(conf, f).buffered
    // seek to SECTION / 2 ENTITIES
    var inEntities = false
    while (!inEntities && it.hasNext) {
      val (c, v) = it.next()
      if (c == 0 && v == "SECTION" && it.hasNext) {
        val (c2, v2) = it.next()
        if (c2 == 2 && v2 == "ENTITIES") inEntities = true
      }
    }
    if (!inEntities) throw DxfException(s"`$f`: no ENTITIES section — not a DXF file?")

    import Shapefile.{wkbHeader, leInt, le16, lineString}
    val out = Seq.newBuilder[Row]

    // entity-local state
    var etype: String = null
    var layer: String = null
    var handle: String = null
    var xs = List.empty[Double]; var ys = List.empty[Double]
    var x1 = Double.NaN; var y1 = Double.NaN // LINE end point (11/21)
    var closed = false
    var inVertex = false // inside old-style POLYLINE VERTEX run

    def requireZ(v: String, code: Int): Unit = {
      val z = v.toDouble
      if (z != 0.0) throw DxfException(
        s"`$f`: nonzero Z/elevation $z (group $code) — dropping the third " +
          "dimension silently would corrupt the geometry; flatten to 2D or " +
          "use a GDAL deployment")
    }

    def emit(): Unit = {
      if (etype == null) return
      if (xs.length != ys.length) throw DxfException(
        s"`$f`: $etype has ${xs.length} x but ${ys.length} y coordinates")
      val pts = xs.reverse.zip(ys.reverse).toArray
      val geom: Array[Byte] = etype match {
        case "POINT" =>
          if (pts.length != 1) throw DxfException(s"`$f`: POINT with ${pts.length} coordinates")
          wkbHeader(1) ++ le16(pts.head._1, pts.head._2)
        case "LINE" =>
          if (pts.length != 1 || x1.isNaN || y1.isNaN)
            throw DxfException(s"`$f`: LINE missing its 10/20 or 11/21 coordinates")
          wkbHeader(2) ++ lineString(Array(pts.head, (x1, y1)))
        case "LWPOLYLINE" | "POLYLINE" =>
          if (pts.length < 2) throw DxfException(
            s"`$f`: $etype with ${pts.length} vertices")
          if (closed) {
            val ring = if (pts.head == pts.last) pts else pts :+ pts.head
            wkbHeader(3) ++ leInt(1) ++ lineString(ring)
          } else wkbHeader(2) ++ lineString(pts)
        case other => throw new IllegalStateException(s"emit of $other")
      }
      out += Row(layer, handle, etype, geom)
    }

    def reset(t: String): Unit = {
      etype = t; layer = null; handle = null
      xs = Nil; ys = Nil; x1 = Double.NaN; y1 = Double.NaN
      closed = false; inVertex = false
    }

    var done = false
    while (!done && it.hasNext) {
      val (c, v) = it.next()
      if (c == 0) v match {
        case "ENDSEC" | "EOF" => emit(); done = true
        case "POINT" | "LINE" | "LWPOLYLINE" => emit(); reset(v)
        case "POLYLINE" => emit(); reset("POLYLINE")
        case "VERTEX" =>
          if (etype != "POLYLINE") throw DxfException(
            s"`$f`: VERTEX outside a POLYLINE run")
          inVertex = true
        case "SEQEND" => inVertex = false
        case curve @ ("ARC" | "CIRCLE" | "ELLIPSE" | "SPLINE") =>
          throw DxfException(
            s"`$f`: curve entity $curve is outside this native reader's " +
              "scope (no curve types in the WKB contract); use a GDAL deployment")
        case "INSERT" | "3DFACE" => throw DxfException(
          s"`$f`: entity $v (block reference / 3D face) is outside this " +
            "native reader's scope; explode blocks or use a GDAL deployment")
        case other => throw DxfException(
          s"`$f`: unknown entity `$other` — skipping silently would drop data")
      } else if (etype != null) c match {
        case 8 => if (!inVertex) layer = v
        case 5 => if (!inVertex) handle = v
        // POLYLINE headers carry a mandatory dummy point (groups 10/20/30,
        // always 0) that is NOT a vertex — only VERTEX-scoped coordinates
        // are geometry (GDAL's DXF driver ignores the header point the same
        // way). Other entity types carry coordinates directly.
        case 10 => if (etype != "POLYLINE" || inVertex) xs ::= v.toDouble
        case 20 => if (etype != "POLYLINE" || inVertex) ys ::= v.toDouble
        case 11 => x1 = v.toDouble
        case 21 => y1 = v.toDouble
        case 30 | 31 | 38 => requireZ(v, c)
        case 42 => if (v.toDouble != 0.0) throw DxfException(
          s"`$f`: LWPOLYLINE bulge ${v.toDouble} (group 42) is an arc " +
            "segment — outside this native reader's scope; use a GDAL deployment")
        // polyline closed flag; VERTEX's own group-70 flags are unrelated
        case 70 => if (!inVertex) closed = (v.toInt & 1) != 0
        case 90 => () // declared vertex count: the 10/20 run is authoritative
        case _ => () // other groups (colors, linetypes, subclass markers) carry no geometry
      }
      if (etype != null && xs.length != ys.length + 1 && ys.length != xs.length + 1 &&
        xs.length != ys.length) throw DxfException(
        s"`$f`: unbalanced 10/20 coordinate groups")
    }
    if (!done) emit() // file ended without ENDSEC/EOF: keep the last entity
    out.result().iterator
  }
}
