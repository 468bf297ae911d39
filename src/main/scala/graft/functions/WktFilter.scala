package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `wkb_point_in_wkt(geom, 'POLYGON((x y, ...))')` — exact even-odd
  * point-in-polygon test of a WKB Point against a WKT polygon (outer ring +
  * optional holes), the reference's `st_read(..., spatial_filter=...)`
  * predicate (src/duckdb/spatial.rs:29-82, option SpatialFilter) for point
  * layers, without GDAL. Non-point geometries REJECT LOUDLY: the exact
  * intersects test for lines/polygons needs a geometry library, and an
  * envelope approximation under an option that promises exact filtering
  * would be silent wrongness — `spatial_filter_box` is the envelope path.
  *
  * The polygon parses once at plan time (attach-time constant); per row one
  * O(vertices) crossing walk in whole-stage codegen. Row-local: zero
  * shuffle at any corpus size.
  */
case class WkbPointInWktPolygon(child: Expression, rings: Array[Array[Double]],
    wktForDisplay: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wkb_point_in_wkt expects BINARY wkb, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_point_in_wkt"

  override protected def nullSafeEval(input: Any): Any =
    WktFilter.pointInRings(input.asInstanceOf[Array[Byte]], rings)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ringsRef = ctx.addReferenceObj("wktRings", rings, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WktFilter.pointInRings($c, $ringsRef);
    """)
  }

  // Array fields break case-class equality (reference semantics); compare
  // the canonical WKT text instead so plan matching works.
  override def equals(other: Any): Boolean = other match {
    case o: WkbPointInWktPolygon => child == o.child && wktForDisplay == o.wktForDisplay
    case _ => false
  }
  override def hashCode(): Int = (child, wktForDisplay).hashCode()

  override protected def withNewChildInternal(newChild: Expression): WkbPointInWktPolygon =
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

  /** Even-odd crossing test of the WKB Point against all rings (holes
    * toggle naturally). Throws loudly on non-point WKB. */
  def pointInRings(wkb: Array[Byte], rings: Array[Array[Double]]): Boolean = {
    val buf = java.nio.ByteBuffer.wrap(wkb)
    val order = buf.get()
    buf.order(if (order == 1) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    val geomType = buf.getInt()
    if (geomType != 1) throw new IllegalArgumentException(
      s"spatial_filter supports Point layers natively (got WKB geometry type " +
        s"$geomType); use spatial_filter_box for envelope filtering of other " +
        "geometry kinds")
    val px = buf.getDouble()
    val py = buf.getDouble()
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
}
