package graft

import graft.catalog.Catalog
import graft.sources.Mif

/** Native MapInfo MIF/MID reader: header parse (typed columns, delimiter,
  * charset), geometry stream → the shared WKB codec (POINT/LINE/PLINE/
  * PLINE MULTIPLE/REGION/MULTIPOINT/NONE), order-paired .mid attributes
  * with quoting, and loud rejects for TAB, TRANSFORM, curves, row-count
  * drift and unknown records. */
class MifSpec extends SparkSpec {

  private def wkbHex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
  private def geo(json: String): String =
    wkbHex(graft.sources.GeoJson.geoJsonToWkb(json))

  private val header =
    "VERSION 300\nCharset \"Neutral\"\nDELIMITER \",\"\n" +
      "COLUMNS 2\n  id Integer\n  label Char(16)\nDATA\n"

  private def writePair(dir: java.io.File, name: String, geoms: String,
      mid: String): String = {
    writeText(dir, s"$name.mid", mid)
    writeText(dir, s"$name.mif", header + geoms)
  }

  test("every in-scope geometry maps to the shared WKB codec; attributes pair by order") {
    val dir = tempDir("mif")
    val f = writePair(dir, "g",
      "POINT 1.5 2.5\n" +
        "LINE 0 0 3 4\n" +
        "PLINE 3\n0 0\n1 1\n2 0.5\n" +
        "PLINE MULTIPLE 2\n2\n0 0\n1 0\n2\n5 5\n6 7\n" +
        "REGION 1\n4\n0 0\n0 4\n4 4\n0 0\nPEN (1,2,0)\nBRUSH (2,16777215)\nCENTER 1 1\n" +
        "MULTIPOINT 2\n1 1\n2 2\n" +
        "NONE\n",
      (1 to 7).map(i => s"""$i,"row $i"""").mkString("\n") + "\n")
    val df = Catalog.attach(spark, "mif_g1", "spatial", Map("files" -> f))
    assert(df.schema.fieldNames.toSeq === Seq("id", "label", "geom"))
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      (1 to 7).map(i => (i, s"row $i")))
    def hexOf(i: Int): String =
      Option(rows(i).getAs[Array[Byte]]("geom")).map(wkbHex).orNull
    assert(hexOf(0) === geo("""{"type":"Point","coordinates":[1.5,2.5]}"""))
    assert(hexOf(1) === geo("""{"type":"LineString","coordinates":[[0,0],[3,4]]}"""))
    assert(hexOf(2) === geo("""{"type":"LineString","coordinates":[[0,0],[1,1],[2,0.5]]}"""))
    assert(hexOf(3) === geo(
      """{"type":"MultiLineString","coordinates":[[[0,0],[1,0]],[[5,5],[6,7]]]}"""))
    // open REGION ring closes itself; (0,0)→(0,4)→(4,4) is CW in y-up
    assert(hexOf(4) === geo(
      """{"type":"Polygon","coordinates":[[[0,0],[0,4],[4,4],[0,0]]]}"""))
    assert(hexOf(5) === geo("""{"type":"MultiPoint","coordinates":[[1,1],[2,2]]}"""))
    assert(hexOf(6) === null) // NONE
  }

  test("REGION with a hole groups by containment (orientation-independent)") {
    val dir = tempDir("mif")
    val f = writePair(dir, "h",
      // outer CW ring then CCW hole — one polygon, two rings
      "REGION 2\n4\n0 0\n0 10\n10 10\n10 0\n4\n2 2\n6 2\n6 6\n2 6\n",
      "1,\"only\"\n")
    val df = Catalog.attach(spark, "mif_h1", "spatial", Map("files" -> f))
    val g = wkbHex(df.collect().head.getAs[Array[Byte]]("geom"))
    assert(g === geo(
      """{"type":"Polygon","coordinates":[
           [[0,0],[0,10],[10,10],[10,0],[0,0]],
           [[2,2],[6,2],[6,6],[2,6],[2,2]]]}""".replaceAll("\\s+", "")))
  }

  test("REGION hole with the SAME winding as its shell still decodes as a hole") {
    val dir = tempDir("mif")
    // MIF does not mandate ring orientation: both rings CW here — the
    // shapefile convention would mis-read the hole as a second solid
    // polygon; containment grouping must not
    val f = writePair(dir, "hcw",
      "REGION 2\n4\n0 0\n0 10\n10 10\n10 0\n4\n2 2\n2 6\n6 6\n6 2\n",
      "1,\"only\"\n")
    val df = Catalog.attach(spark, "mif_hcw", "spatial", Map("files" -> f))
    val g = wkbHex(df.collect().head.getAs[Array[Byte]]("geom"))
    assert(g === geo(
      """{"type":"Polygon","coordinates":[
           [[0,0],[0,10],[10,10],[10,0],[0,0]],
           [[2,2],[2,6],[6,6],[6,2],[2,2]]]}""".replaceAll("\\s+", "")))
  }

  test("REGION island inside a hole is its own polygon (depth-2 nesting)") {
    val dir = tempDir("mif")
    val f = writePair(dir, "isl",
      "REGION 3\n4\n0 0\n0 10\n10 10\n10 0\n4\n2 2\n6 2\n6 6\n2 6\n" +
        "4\n3 3\n5 3\n5 5\n3 5\n",
      "1,\"only\"\n")
    val df = Catalog.attach(spark, "mif_isl", "spatial", Map("files" -> f))
    val g = wkbHex(df.collect().head.getAs[Array[Byte]]("geom"))
    assert(g === geo(
      """{"type":"MultiPolygon","coordinates":[
           [[[0,0],[0,10],[10,10],[10,0],[0,0]],
            [[2,2],[6,2],[6,6],[2,6],[2,2]]],
           [[[3,3],[5,3],[5,5],[3,5],[3,3]]]]}""".replaceAll("\\s+", "")))
  }

  test("an entirely-empty MID row is a legitimate single-Char-column row") {
    val dir = tempDir("mif")
    writeText(dir, "e.mid", "\"a\"\n\n")
    val f = writeText(dir, "e.mif",
      "VERSION 300\nDELIMITER \",\"\nCOLUMNS 1\n  s Char(4)\nDATA\n" +
        "POINT 0 0\nPOINT 1 1\n")
    val df = Catalog.attach(spark, "mif_e1", "spatial", Map("files" -> f))
    val vals = df.collect().map(_.getString(0)).toSet
    // the empty interior line is row 2 (empty Char value), only the
    // final newline's trailing empty is trimmed
    assert(vals === Set("a", ""))
  }

  test("stray trailing blank lines after the last record are not rows") {
    val dir = tempDir("mif")
    // file ends "...\n\n\n" — two stray blank lines beyond the 2 records;
    // the geometry count resolves the ambiguity (trim down to nGeoms)
    writeText(dir, "tb.mid", "\"a\"\n\"b\"\n\n\n")
    val f = writeText(dir, "tb.mif",
      "VERSION 300\nDELIMITER \",\"\nCOLUMNS 1\n  s Char(4)\nDATA\n" +
        "POINT 0 0\nPOINT 1 1\n")
    val df = Catalog.attach(spark, "mif_tb", "spatial", Map("files" -> f))
    assert(df.collect().map(_.getString(0)).toSet === Set("a", "b"))
  }

  test("a trailing blank line that IS the last record survives the trim") {
    val dir = tempDir("mif")
    // "a\n\n\n": 3 lines after split-trim candidates, 3 geometries — rows
    // 2 and 3 are legitimate empty Char values, nothing to drop
    writeText(dir, "tb2.mid", "\"a\"\n\n\n")
    val f = writeText(dir, "tb2.mif",
      "VERSION 300\nDELIMITER \",\"\nCOLUMNS 1\n  s Char(4)\nDATA\n" +
        "POINT 0 0\nPOINT 1 1\nPOINT 2 2\n")
    val df = Catalog.attach(spark, "mif_tb2", "spatial", Map("files" -> f))
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("", "", "a"))
  }

  test("typed columns: Float/Decimal→double, Logical→boolean, Date→string, empty→NULL") {
    val dir = tempDir("mif")
    writeText(dir, "t.mid", "1,2.5,3.75,T,20240131,\"x\"\n2,,,F,,\"\"\n")
    val f = writeText(dir, "t.mif",
      "VERSION 300\nDELIMITER \",\"\nCOLUMNS 6\n  a Integer\n  b Float\n" +
        "  c Decimal(10,2)\n  d Logical\n  e Date\n  s Char(4)\nDATA\n" +
        "POINT 0 0\nPOINT 1 1\n")
    val df = Catalog.attach(spark, "mif_t1", "spatial", Map("files" -> f))
    val r = df.collect().sortBy(_.getInt(0))
    assert(r(0).getDouble(1) === 2.5 && r(0).getDouble(2) === 3.75)
    assert(r(0).getBoolean(3) === true && r(0).getString(4) === "20240131")
    assert(r(1).isNullAt(1) && r(1).isNullAt(2) && r(1).getBoolean(3) === false)
    assert(r(1).isNullAt(4) && r(1).getString(5) === "")
  }

  test("out-of-scope constructs and drifted pairs reject loudly") {
    val dir = tempDir("mif")
    def rejects(mif: String, mid: String, needle: String, tag: String): Unit = {
      writeText(dir, s"$tag.mid", mid)
      val f = writeText(dir, s"$tag.mif", mif)
      val e = intercept[Exception] {
        Catalog.attach(spark, s"mif_rej_$tag", "spatial", Map("files" -> f)).collect()
      }
      def all(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ all(x.getCause))
      assert(all(e).exists(_.contains(needle)), s"$tag got: ${all(e).mkString(" | ")}")
    }
    rejects(header + "ARC 0 0 4 4 0 90\n", "1,\"a\"\n", "outside this native reader's scope", "arc")
    rejects("VERSION 300\nTRANSFORM 2,2,0,0\n" + header.drop(12), "1,\"a\"\n",
      "TRANSFORM", "tr")
    rejects(header + "POINT 0 0\nPOINT 1 1\n", "1,\"a\"\n", "geometry records", "drift")
    rejects(header + "BLOB 1 2\n", "1,\"a\"\n", "unknown MIF record", "unk")
    rejects("VERSION 300\nCharset \"MacRoman\"\n" + header.drop(12), "1,\"a\"\n",
      "codepage", "cs")
    // binary TAB rejects at attach time with remediation
    val tab = writeText(dir, "b.tab", "binary")
    val e = intercept[Exception] {
      Catalog.attach(spark, "mif_rej_tab", "spatial", Map("files" -> tab))
    }
    assert(e.getMessage.contains("MIF/MID"))
  }
}
