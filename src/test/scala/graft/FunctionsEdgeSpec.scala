package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Edge semantics of the native codegen expressions: null ELEMENTS inside
  * input arrays must behave like the explode+aggregate chains the natives
  * replaced (md5(NULL) rows were ignored by min()/conditional sums), and
  * codegen locals must not collide when one projection evaluates the same
  * expression twice over non-nullable children. */
class FunctionsEdgeSpec extends SparkSpec {

  test("minhash_sig skips null elements; all-null array hashes like empty") {
    val rows = spark.sql(
      """SELECT minhash_sig(array('ab','cd')) AS full,
        |       minhash_sig(array('ab', CAST(NULL AS STRING), 'cd')) AS holey,
        |       minhash_sig(array(CAST(NULL AS STRING))) AS allnull,
        |       minhash_sig(CAST(array() AS ARRAY<STRING>)) AS empty""".stripMargin).head()
    assert(rows.getSeq[Long](0) === rows.getSeq[Long](1),
      "null elements must not perturb the signature")
    assert(rows.isNullAt(2), "all-null shingle array carries no signature")
    assert(rows.isNullAt(3))
  }

  test("simhash16 skips null elements; all-null array hashes like empty") {
    val r = spark.sql(
      """SELECT simhash16(array('tok','ken')) AS full,
        |       simhash16(array('tok', CAST(NULL AS STRING), 'ken')) AS holey,
        |       simhash16(array(CAST(NULL AS STRING))) AS allnull""".stripMargin).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.isNullAt(2))
  }

  test("two simhash16 calls over non-nullable children codegen in one projection") {
    // non-nullable children → nullSafeCodeGen emits both snippets into one
    // scope; a fixed local name would be a janino duplicate declaration
    // fallback off: a janino compile error (duplicate local) THROWS here
    // instead of silently reverting to interpreted evaluation
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(3).selectExpr(
        "simhash16(array(concat('a', CAST(id AS STRING)))) AS h1",
        "simhash16(array(concat('b', CAST(id AS STRING)))) AS h2")
      val got = df.collect()
      assert(got.length === 3)
      assert(got.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), s"expected a codegen'd projection, got:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("vec_decimal_mean emits null for zero-count dimensions") {
    import spark.implicits._
    val df = Seq(
      (1, Array[java.lang.Double](null, 2.0)),
      (1, Array[java.lang.Double](null, 4.0))).toDF("g", "v")
    val r = df.groupBy("g").agg(expr("vec_decimal_mean(v)").as("m"))
      .head().getSeq[Any](1)
    assert(r(0) === null, "dimension with zero non-null inputs must be NULL, not NaN")
    assert(r(1) === 3.0)
  }

  test("vec_decimal_mean ragged inputs: short vectors leave trailing dims partial") {
    import spark.implicits._
    val df = Seq((1, Array(1.0)), (1, Array(3.0, 8.0))).toDF("g", "v")
    val r = df.groupBy("g").agg(expr("vec_decimal_mean(v)").as("m"))
      .head().getSeq[Any](1)
    assert(r(0) === 2.0)
    assert(r(1) === 8.0) // count 1, not divided by the group size
  }

  private def gj(json: String): Array[Byte] =
    graft.sources.GeoJson.geoJsonToWkb(json)
  private def meas(json: String): Seq[Double] =
    graft.functions.GeoMeasure.measures(gj(json)).toDoubleArray().toSeq

  test("wkb_measures: orientation-normalized shoelace, holes subtract, multi sums") {
    // CCW unit square at origin
    val ccw = """{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}"""
    assert(meas(ccw) === Seq(4.0, 8.0, 1.0, 1.0))
    // same square wound CW: identical measures (orientation normalized)
    val cw = """{"type":"Polygon","coordinates":[[[0,0],[0,2],[2,2],[2,0],[0,0]]]}"""
    assert(meas(cw) === Seq(4.0, 8.0, 1.0, 1.0))
    // concentric 1x1 hole: area subtracts, perimeter includes the hole
    // ring (GEOS ST_Perimeter convention), centroid stays at the center
    val holed = """{"type":"Polygon","coordinates":[
      [[0,0],[4,0],[4,4],[0,4],[0,0]],
      [[1.5,1.5],[2.5,1.5],[2.5,2.5],[1.5,2.5],[1.5,1.5]]]}"""
    assert(meas(holed) === Seq(15.0, 20.0, 2.0, 2.0))
    // two disjoint unit squares: areas sum, centroid is the area-weighted
    // midpoint
    val multi = """{"type":"MultiPolygon","coordinates":[
      [[[0,0],[1,0],[1,1],[0,1],[0,0]]],
      [[[4,0],[5,0],[5,1],[4,1],[4,0]]]]}"""
    assert(meas(multi) === Seq(2.0, 8.0, 2.5, 0.5))
    // point: zero measures, centroid is the point
    assert(meas("""{"type":"Point","coordinates":[3.5,-2]}""") === Seq(0.0, 0.0, 3.5, -2.0))
  }

  test("wkb_contains_point: holes exclude, multi covers, wrong kinds reject") {
    def cp(poly: String, pt: String): Boolean =
      graft.functions.GeoMeasure.containsPoint(gj(poly), gj(pt))
    val holed = """{"type":"Polygon","coordinates":[
      [[0,0],[4,0],[4,4],[0,4],[0,0]],
      [[1.5,1.5],[2.5,1.5],[2.5,2.5],[1.5,2.5],[1.5,1.5]]]}"""
    assert(cp(holed, """{"type":"Point","coordinates":[1,1]}"""))
    assert(!cp(holed, """{"type":"Point","coordinates":[2,2]}""")) // inside the hole
    assert(!cp(holed, """{"type":"Point","coordinates":[5,1]}"""))
    val multi = """{"type":"MultiPolygon","coordinates":[
      [[[0,0],[1,0],[1,1],[0,1],[0,0]]],
      [[[4,0],[5,0],[5,1],[4,1],[4,0]]]]}"""
    assert(cp(multi, """{"type":"Point","coordinates":[4.5,0.5]}"""))
    assert(!cp(multi, """{"type":"Point","coordinates":[2.5,0.5]}"""))
    val line = """{"type":"LineString","coordinates":[[0,0],[1,1]]}"""
    val e1 = intercept[IllegalArgumentException](
      cp(line, """{"type":"Point","coordinates":[0,0]}"""))
    assert(e1.getMessage.contains("Polygon/MultiPolygon"))
    val e2 = intercept[IllegalArgumentException](cp(holed, holed))
    assert(e2.getMessage.contains("must be a Point"))
  }

  test("wkb_contains_point: envelope fast path keeps ring-walk semantics") {
    def cp(poly: String, pt: String): Boolean =
      graft.functions.GeoMeasure.containsPoint(gj(poly), gj(pt))
    // bbox-hit-but-ring-miss: a diamond's bbox corners are inside the bbox
    // yet outside the ring — the envelope screen must NOT answer for the
    // crossing test
    val diamond = """{"type":"Polygon","coordinates":[
      [[2,0],[4,2],[2,4],[0,2],[2,0]]]}"""
    assert(!cp(diamond, """{"type":"Point","coordinates":[0.2,0.2]}"""))
    assert(!cp(diamond, """{"type":"Point","coordinates":[3.8,3.8]}"""))
    assert(cp(diamond, """{"type":"Point","coordinates":[2,2]}"""))
    // point exactly on the bbox edge is screened IN (inclusive bounds) and
    // decided by crossing parity, same as before the fast path
    assert(!cp(diamond, """{"type":"Point","coordinates":[0,0]}"""))
    // bbox miss on every ring → false without any ring walk
    assert(!cp(diamond, """{"type":"Point","coordinates":[9,9]}"""))
    // hole ring whose bbox excludes the point is dropped but the shell
    // still answers — holes keep excluding when the point is inside them
    val holed = """{"type":"Polygon","coordinates":[
      [[0,0],[10,0],[10,10],[0,10],[0,0]],
      [[1,1],[2,1],[2,2],[1,2],[1,1]]]}"""
    assert(cp(holed, """{"type":"Point","coordinates":[5,5]}"""))
    assert(!cp(holed, """{"type":"Point","coordinates":[1.5,1.5]}"""))
  }

  test("g13 spatial join broadcasts the polygon side (points never shuffle)") {
    val q = SparkEntry.queries("g13_spatial_join")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast spatial join:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("hashpartitioning"),
      "the point side got shuffled — spatial enrichment must broadcast the dim")
  }

  test("wkb_measures: lines and degenerate polygons reject loudly") {
    val line = """{"type":"LineString","coordinates":[[0,0],[1,1]]}"""
    val e1 = intercept[IllegalArgumentException](meas(line))
    assert(e1.getMessage.contains("Point/Polygon/MultiPolygon"))
    val flat = """{"type":"Polygon","coordinates":[[[0,0],[1,0],[2,0],[0,0]]]}"""
    val e2 = intercept[IllegalArgumentException](meas(flat))
    assert(e2.getMessage.contains("non-positive net area"))
  }
}
