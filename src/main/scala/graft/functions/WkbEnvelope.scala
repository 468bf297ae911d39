package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `wkb_env_intersects(geom, minx, miny, maxx, maxy)` — true when the
  * geometry's ENVELOPE (min/max of every vertex) intersects the closed box,
  * the same feature test GDAL's `SetSpatialFilterRect` applies for the
  * reference's `st_read(..., spatial_filter_box=...)`
  * (src/duckdb/spatial.rs:29-82, option SpatialFilterBox). Runs per row in
  * whole-stage codegen directly above the scan — no GDAL, no geometry
  * library; one linear WKB walk, short-circuiting the moment the running
  * envelope already intersects.
  *
  * Scale shape: a row-local projection/filter (zero shuffle); at 100 TB the
  * filter drops rows before any downstream exchange sees them.
  *
  * The box is bound at construction (attach-time constants), keeping the
  * expression unary so null propagation is the standard one: NULL wkb →
  * NULL (filtered out). Malformed WKB throws loudly — a spatial filter that
  * silently kept or dropped undecodable rows would be wrongness either way.
  */
case class WkbEnvIntersects(child: Expression,
    minX: Double, minY: Double, maxX: Double, maxY: Double)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wkb_env_intersects expects BINARY wkb, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_env_intersects"

  override protected def nullSafeEval(input: Any): Any =
    WkbEnvelope.intersects(input.asInstanceOf[Array[Byte]], minX, minY, maxX, maxY)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WkbEnvelope.intersects(
        $c, ${minX}D, ${minY}D, ${maxX}D, ${maxY}D);
    """)

  override protected def withNewChildInternal(newChild: Expression): WkbEnvIntersects =
    copy(child = newChild)
}

object WkbEnvelope {

  /** Envelope-intersect test; returns as soon as a vertex proves overlap.
    * Throws on malformed/unsupported WKB. */
  def intersects(wkb: Array[Byte], minX: Double, minY: Double,
      maxX: Double, maxY: Double): Boolean = {
    val buf = ByteBuffer.wrap(wkb)
    val env = new Env(minX, minY, maxX, maxY)
    geometry(buf, env)
    env.hit || env.straddles
  }

  /** Running envelope + early-accept when a vertex lands inside the box. */
  private final class Env(val bMinX: Double, val bMinY: Double,
      val bMaxX: Double, val bMaxY: Double) {
    var gMinX: Double = Double.PositiveInfinity
    var gMinY: Double = Double.PositiveInfinity
    var gMaxX: Double = Double.NegativeInfinity
    var gMaxY: Double = Double.NegativeInfinity
    var hit: Boolean = false
    def add(x: Double, y: Double): Unit = {
      if (x < gMinX) gMinX = x; if (x > gMaxX) gMaxX = x
      if (y < gMinY) gMinY = y; if (y > gMaxY) gMaxY = y
      if (x >= bMinX && x <= bMaxX && y >= bMinY && y <= bMaxY) hit = true
    }
    /** Envelopes can overlap with no vertex inside the box (a long segment
      * straddling it) — the full-envelope test after the walk. */
    def straddles: Boolean =
      gMinX <= bMaxX && gMaxX >= bMinX && gMinY <= bMaxY && gMaxY >= bMinY
  }

  private def geometry(buf: ByteBuffer, env: Env): Unit = {
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val geomType = buf.getInt()
    geomType match {
      case 1 => env.add(buf.getDouble(), buf.getDouble()) // Point
      case 2 => ring(buf, env) // LineString
      case 3 => // Polygon: nRings rings
        var r = buf.getInt()
        while (r > 0) { ring(buf, env); r -= 1 }
      case 4 | 5 | 6 | 7 => // Multi*/GeometryCollection: nested geometries
        var n = buf.getInt()
        while (n > 0) { geometry(buf, env); n -= 1 }
      case other => throw new IllegalArgumentException(
        s"wkb_env_intersects: unsupported WKB geometry type $other " +
          "(Point/LineString/Polygon/Multi*/GeometryCollection supported; " +
          "Z/M variants are not)")
    }
  }

  private def ring(buf: ByteBuffer, env: Env): Unit = {
    var n = buf.getInt()
    while (n > 0) { env.add(buf.getDouble(), buf.getDouble()); n -= 1 }
  }

  /** Parse the attach option `minx,miny,maxx,maxy` → 4 doubles, loud on
    * malformed input or an inverted box. */
  def parseBox(value: String): (Double, Double, Double, Double) = {
    val parts = value.split(",").map(_.trim)
    if (parts.length != 4) throw new IllegalArgumentException(
      s"spatial_filter_box `$value` must be `minx,miny,maxx,maxy`")
    val ds = parts.map { p =>
      try p.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spatial_filter_box component `$p` is not a number")
      }
    }
    if (ds(0) > ds(2) || ds(1) > ds(3)) throw new IllegalArgumentException(
      s"spatial_filter_box `$value` is inverted: require minx <= maxx and miny <= maxy")
    (ds(0), ds(1), ds(2), ds(3))
  }
}
