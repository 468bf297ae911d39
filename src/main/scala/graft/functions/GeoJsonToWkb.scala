package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geojson_to_wkb(geometry_json)` as a NATIVE Catalyst expression with
  * codegen — the preferred extension path (custom `Expression` with
  * `doGenCode` beats a Scala UDF: no closure serialization, no
  * encoder boundary, stays inside whole-stage codegen). Encoding logic is
  * shared with graft.sources.GeoJson (reference behavior pinned by
  * tests/tests/spatial.rs:33-77: GeoJSON in → OGC little-endian WKB out).
  */
case class GeoJsonToWkb(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geojson_to_wkb expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "geojson_to_wkb"

  override protected def nullSafeEval(input: Any): Any =
    graft.sources.GeoJson.geoJsonToWkb(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.GeoJson.geoJsonToWkb($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): GeoJsonToWkb =
    copy(child = newChild)
}

/** Function registrations injected via SparkSessionExtensions
  * (Engine.configure wires them into every engine session). */
object GraftFunctions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val geojsonToWkb: FunctionDescription = (
    FunctionIdentifier("geojson_to_wkb"),
    new ExpressionInfo(classOf[GeoJsonToWkb].getName, "geojson_to_wkb"),
    (children: Seq[Expression]) => GeoJsonToWkb(children.head))

  val vecDot: FunctionDescription = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => VecDot(children.head, children(1)))

  val vecSignDot: FunctionDescription = (
    FunctionIdentifier("vec_signdot"),
    new ExpressionInfo(classOf[VecSignDot].getName, "vec_signdot"),
    (children: Seq[Expression]) => VecSignDot(children.head, children(1), children(2)))

  val minhashSig: FunctionDescription = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSigExpr].getName, "minhash_sig"),
    (children: Seq[Expression]) => MinhashSigExpr(children.head))

  val simhash16: FunctionDescription = (
    FunctionIdentifier("simhash16"),
    new ExpressionInfo(classOf[Simhash16Expr].getName, "simhash16"),
    (children: Seq[Expression]) => Simhash16Expr(children.head))

  val winnowMinima: FunctionDescription = (
    FunctionIdentifier("winnow_minima"),
    new ExpressionInfo(classOf[WinnowMinimaExpr].getName, "winnow_minima"),
    (children: Seq[Expression]) => WinnowMinimaExpr(children.head, children(1)))

  val vecCosine: FunctionDescription = (
    FunctionIdentifier("vec_cosine"),
    new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
    (children: Seq[Expression]) => VecCosine(children.head, children(1)))

  val vecDecimalMean: FunctionDescription = (
    FunctionIdentifier("vec_decimal_mean"),
    new ExpressionInfo(classOf[VecDecimalMean].getName, "vec_decimal_mean"),
    (children: Seq[Expression]) => VecDecimalMean(children.head))

  val icebergBucket: FunctionDescription = (
    FunctionIdentifier("iceberg_bucket"),
    new ExpressionInfo(classOf[IcebergBucketExpr].getName, "iceberg_bucket"),
    (children: Seq[Expression]) => IcebergBucketExpr(children.head, children(1)))

  val pgJsonGet: FunctionDescription = (
    FunctionIdentifier("pg_json_get"),
    new ExpressionInfo(classOf[PgJsonGetExpr].getName, "pg_json_get"),
    (children: Seq[Expression]) => PgJsonGetExpr(children.head, children(1)))

  val wkbEnvIntersects: FunctionDescription = (
    FunctionIdentifier("wkb_env_intersects"),
    new ExpressionInfo(classOf[WkbEnvIntersects].getName, "wkb_env_intersects"),
    (children: Seq[Expression]) => {
      // box bounds are attach-time constants — fold them at build so the
      // expression stays unary (standard null propagation, simple codegen)
      def d(i: Int): Double = children(i).eval() match {
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"wkb_env_intersects bound ${i} must be a numeric literal, got $other")
      }
      WkbEnvIntersects(children.head, d(1), d(2), d(3), d(4))
    })

  val wkbIntersectsWkt: FunctionDescription = (
    FunctionIdentifier("wkb_intersects_wkt"),
    new ExpressionInfo(classOf[WkbIntersectsWkt].getName, "wkb_intersects_wkt"),
    (children: Seq[Expression]) => {
      val wkt = children(1).eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"wkb_intersects_wkt filter must be a WKT string literal, got $other")
      }
      WkbIntersectsWkt(children.head, WktFilter.parseWktPolygon(wkt), wkt)
    })

  /** `bloom_might_contain(bloom_bytes, xxhash64_value)` — a thin binding to
    * Spark's OWN codegen'd BloomFilterMightContain (the expression the
    * optimizer injects for runtime join filters, internal-only in the
    * registry). Exposing it lets operators apply a pre-built, broadcast-as-
    * literal bloom filter as a row-local gate — the incremental-dedup shape
    * (Dedup.incrementalGate). The first argument must be a foldable BINARY
    * (the sketch's writeTo serialization); the second an XXHASH64 of the
    * key, matching the sketch's putLong/mightContainLong pairing. */
  val bloomMightContain: FunctionDescription = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_might_contain"),
    (children: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children.head, children(1)))

  val wkbMeasures: FunctionDescription = (
    FunctionIdentifier("wkb_measures"),
    new ExpressionInfo(classOf[WkbMeasures].getName, "wkb_measures"),
    (children: Seq[Expression]) => WkbMeasures(children.head))

  val wkbContainsPoint: FunctionDescription = (
    FunctionIdentifier("wkb_contains_point"),
    new ExpressionInfo(classOf[WkbContainsPoint].getName, "wkb_contains_point"),
    (children: Seq[Expression]) => WkbContainsPoint(children.head, children(1)))

  val all: Seq[FunctionDescription] =
    Seq(geojsonToWkb, vecDot, vecSignDot, minhashSig, simhash16, winnowMinima,
      vecCosine, vecDecimalMean, icebergBucket, pgJsonGet, wkbEnvIntersects,
      wkbIntersectsWkt, bloomMightContain, wkbMeasures, wkbContainsPoint)
}
