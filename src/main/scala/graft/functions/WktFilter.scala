package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `wkb_intersects_wkt(geom, 'POLYGON((x y, ...))')` — EXACT intersects
  * test of a WKB geometry against a WKT polygon (outer ring + optional
  * holes), the reference's `st_read(..., spatial_filter=...)` predicate
  * (src/duckdb/spatial.rs:29-82, option SpatialFilter) without GDAL.
  *
  * Geometry kinds: Point (even-odd point-in-polygon, the g04 contract),
  * LineString, Polygon, and their Multi* collections. The non-point test
  * is the standard exact arrangement for simple polygons: envelope
  * fast-path, then any-geometry-vertex-inside-filter OR
  * any-filter-vertex-inside-geometry OR any-segment-pair-crossing —
  * covering containment either way and boundary crossing, holes included
  * via even-odd parity. Unknown WKB kinds reject loudly.
  *
  * The polygon parses once at plan time (attach-time constant); per row
  * one O(filter-vertices × geom-vertices) walk in whole-stage codegen.
  * Row-local: zero shuffle at any corpus size.
  */
case class WkbIntersectsWkt(child: Expression, rings: Array[Array[Double]],
    wktForDisplay: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wkb_intersects_wkt expects BINARY wkb, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_intersects_wkt"

  override protected def nullSafeEval(input: Any): Any =
    WktFilter.wkbIntersectsRings(input.asInstanceOf[Array[Byte]], rings)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ringsRef = ctx.addReferenceObj("wktRings", rings, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WktFilter.wkbIntersectsRings($c, $ringsRef);
    """)
  }

  // Array fields break case-class equality (reference semantics); compare
  // the canonical WKT text instead so plan matching works.
  override def equals(other: Any): Boolean = other match {
    case o: WkbIntersectsWkt => child == o.child && wktForDisplay == o.wktForDisplay
    case _ => false
  }
  override def hashCode(): Int = (child, wktForDisplay).hashCode()

  override protected def withNewChildInternal(newChild: Expression): WkbIntersectsWkt =
    copy(child = newChild)
}

object WktFilter {

  /** Parse `POLYGON((x y, x y, ...)[, (hole...)])` → rings as flat
    * [x0,y0,x1,y1,...] arrays. Loud on any other WKT kind or malformed
    * text. Case-insensitive tag; closing point may repeat the first. */
  def parseWktPolygon(wkt: String): Array[Array[Double]] = {
    val m = """(?is)^\s*POLYGON\s*\(\s*(.*)\s*\)\s*$""".r.findFirstMatchIn(wkt)
      .getOrElse(throw new IllegalArgumentException(
        s"spatial_filter `${wkt.take(80)}` is not POLYGON WKT " +
          "(only POLYGON filters are supported natively; MULTIPOLYGON and " +
          "other kinds need a GDAL deployment)"))
    val body = m.group(1).trim
    val rings = body.split("""\)\s*,\s*\(""").map(_.replaceAll("""[()]""", "").trim)
    val parsed = rings.map { ring =>
      val pts = ring.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        val xy = p.split("\\s+")
        if (xy.length != 2) throw new IllegalArgumentException(
          s"spatial_filter point `$p` is not `x y` (Z/M coordinates are not supported)")
        try (xy(0).toDouble, xy(1).toDouble) catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spatial_filter point `$p` is not numeric")
        }
      }
      if (pts.length < 3) throw new IllegalArgumentException(
        s"spatial_filter ring has ${pts.length} point(s); a polygon ring needs >= 3")
      pts.flatMap { case (x, y) => Seq(x, y) }.toArray
    }
    parsed
  }

  /** Even-odd crossing test of (px, py) against all rings (holes toggle
    * naturally). */
  def pointInRings(px: Double, py: Double, rings: Array[Array[Double]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = ring(2 * i); val yi = ring(2 * i + 1)
        val xj = ring(2 * j); val yj = ring(2 * j + 1)
        if ((yi > py) != (yj > py) &&
            px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  /** EXACT intersects of a WKB geometry against the filter rings. */
  def wkbIntersectsRings(wkb: Array[Byte], rings: Array[Array[Double]]): Boolean =
    geomIntersects(java.nio.ByteBuffer.wrap(wkb), rings)

  private def geomIntersects(buf: java.nio.ByteBuffer,
      rings: Array[Array[Double]]): Boolean = {
    val order = buf.get()
    buf.order(if (order == 1) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    buf.getInt() match {
      case 1 => // Point
        val px = buf.getDouble(); val py = buf.getDouble()
        pointInRings(px, py, rings)
      case 2 => // LineString
        lineStringIntersects(readCoords(buf), rings)
      case 3 => // Polygon
        polygonIntersects(readRings(buf), rings)
      case t @ (4 | 5 | 6) => // Multi*: each sub-geometry has its own header.
        // every sub-geometry must be CONSUMED even after a hit would be
        // known, so no early exit mid-buffer — fold over all of them
        val n = buf.getInt()
        var hit = false
        var i = 0
        while (i < n) { if (geomIntersects(buf, rings)) hit = true; i += 1 }
        hit
      case other => throw new IllegalArgumentException(
        s"spatial_filter supports Point/LineString/Polygon/Multi* layers " +
          s"natively (got WKB geometry type $other); GeometryCollection and " +
          "exotic kinds need a GDAL deployment")
    }
  }

  private def readCoords(buf: java.nio.ByteBuffer): Array[Double] = {
    val n = buf.getInt()
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < 2 * n) { out(i) = buf.getDouble(); i += 1 }
    out
  }

  private def readRings(buf: java.nio.ByteBuffer): Array[Array[Double]] = {
    val n = buf.getInt()
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) { out(i) = readCoords(buf); i += 1 }
    out
  }

  private def envDisjoint(coords: Array[Array[Double]],
      rings: Array[Array[Double]]): Boolean = {
    var gMinX = Double.MaxValue; var gMinY = Double.MaxValue
    var gMaxX = Double.MinValue; var gMaxY = Double.MinValue
    coords.foreach { ring =>
      var i = 0
      while (i < ring.length) {
        val x = ring(i); val y = ring(i + 1)
        if (x < gMinX) gMinX = x; if (x > gMaxX) gMaxX = x
        if (y < gMinY) gMinY = y; if (y > gMaxY) gMaxY = y
        i += 2
      }
    }
    var fMinX = Double.MaxValue; var fMinY = Double.MaxValue
    var fMaxX = Double.MinValue; var fMaxY = Double.MinValue
    rings.foreach { ring =>
      var i = 0
      while (i < ring.length) {
        val x = ring(i); val y = ring(i + 1)
        if (x < fMinX) fMinX = x; if (x > fMaxX) fMaxX = x
        if (y < fMinY) fMinY = y; if (y > fMaxY) fMaxY = y
        i += 2
      }
    }
    gMaxX < fMinX || fMaxX < gMinX || gMaxY < fMinY || fMaxY < gMinY
  }

  private def cross(ax: Double, ay: Double, bx: Double, by: Double,
      px: Double, py: Double): Double =
    (bx - ax) * (py - ay) - (by - ay) * (px - ax)

  private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
      px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** Segment [a,b] × segment [c,d] — proper crossings plus collinear /
    * endpoint-touch cases (a boundary touch IS an intersection). */
  private def segIntersects(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val d1 = cross(cx, cy, dx, dy, ax, ay)
    val d2 = cross(cx, cy, dx, dy, bx, by)
    val d3 = cross(ax, ay, bx, by, cx, cy)
    val d4 = cross(ax, ay, bx, by, dx, dy)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && onSegment(cx, cy, dx, dy, ax, ay)) true
    else if (d2 == 0 && onSegment(cx, cy, dx, dy, bx, by)) true
    else if (d3 == 0 && onSegment(ax, ay, bx, by, cx, cy)) true
    else if (d4 == 0 && onSegment(ax, ay, bx, by, dx, dy)) true
    else false
  }

  /** Any segment of `coords` (closed ring when `closed`) crossing any
    * segment of any filter ring. */
  private def anySegmentCross(coords: Array[Double], closed: Boolean,
      rings: Array[Array[Double]]): Boolean = {
    val n = coords.length / 2
    val segs = if (closed) n else n - 1
    var i = 0
    while (i < segs) {
      val j = (i + 1) % n
      val ax = coords(2 * i); val ay = coords(2 * i + 1)
      val bx = coords(2 * j); val by = coords(2 * j + 1)
      var r = 0
      while (r < rings.length) {
        val ring = rings(r)
        val m = ring.length / 2
        var k = 0
        var l = m - 1
        while (k < m) {
          if (segIntersects(ax, ay, bx, by,
              ring(2 * l), ring(2 * l + 1), ring(2 * k), ring(2 * k + 1))) return true
          l = k
          k += 1
        }
        r += 1
      }
      i += 1
    }
    false
  }

  private def lineStringIntersects(coords: Array[Double],
      rings: Array[Array[Double]]): Boolean = {
    if (envDisjoint(Array(coords), rings)) return false
    // a line wholly inside the filter has every vertex inside; otherwise
    // entering/leaving crosses a filter segment
    var i = 0
    while (i < coords.length) {
      if (pointInRings(coords(i), coords(i + 1), rings)) return true
      i += 2
    }
    anySegmentCross(coords, closed = false, rings)
  }

  private def polygonIntersects(geomRings: Array[Array[Double]],
      rings: Array[Array[Double]]): Boolean = {
    if (geomRings.isEmpty) return false
    if (envDisjoint(geomRings, rings)) return false
    // geometry (partially) inside filter: some outer-ring vertex inside
    val outer = geomRings(0)
    var i = 0
    while (i < outer.length) {
      if (pointInRings(outer(i), outer(i + 1), rings)) return true
      i += 2
    }
    // filter (partially) inside geometry: some filter vertex inside the
    // geometry's even-odd arrangement (holes counted)
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var k = 0
      while (k < ring.length) {
        if (pointInRings(ring(k), ring(k + 1), geomRings)) return true
        k += 2
      }
      r += 1
    }
    // boundaries cross without either containment direction holding
    geomRings.exists(g => anySegmentCross(g, closed = true, rings))
  }
}
