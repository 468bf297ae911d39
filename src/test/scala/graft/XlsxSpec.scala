package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Catalog
import graft.sources.Xlsx

/** Native XLSX driver: the OOXML package model (workbook → rels →
  * worksheet parts, sharedStrings interning) and the SpreadsheetML cell
  * kinds — tested by writing with our spec-subset writer AND by
  * hand-building package XML from the PUBLIC ECMA-376 text, so reader and
  * writer cannot share a correlated misunderstanding silently. */
class XlsxSpec extends SparkSpec {

  private def sampleDf = {
    val rows = (1 to 5).map(i => org.apache.spark.sql.Row(
      i.toLong * 10, s"name_$i", i / 2.0, i % 2 == 0,
      if (i == 3) null else s"note $i"))
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType),
      StructField("note", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("xlsx: write→attach round-trips every cell kind including missing cells") {
    val dir = tempDir("xlsx")
    val f = new File(dir, "sample.xlsx")
    Xlsx.write(sampleDf, f.getAbsolutePath, Map.empty)
    val back = Catalog.attach(spark, "xlsx_rt", "spatial",
      Map("files" -> f.getAbsolutePath))
    assert(back.schema == StructType(Seq(
      StructField("key", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType),
      StructField("note", StringType))))
    val got = back.orderBy("key").collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 40L, 50L))
    assert(got.map(_.getString(1)).toSeq == (1 to 5).map(i => s"name_$i"))
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.5, 1.0, 1.5, 2.0, 2.5))
    assert(got.map(_.getBoolean(3)).toSeq == Seq(false, true, false, true, false))
    assert(got(2).isNullAt(4) && got(0).getString(4) == "note 1")
  }

  test("xlsx: writer emits a package other tools would accept (zip parts, sst)") {
    val dir = tempDir("xlsx")
    val f = new File(dir, "sample.xlsx")
    Xlsx.write(sampleDf, f.getAbsolutePath, Map("layer" -> "mysheet"))
    val zf = new java.util.zip.ZipFile(f)
    try {
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result().toSet
      }
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
        "xl/sharedStrings.xml").subsetOf(names))
      def slurp(n: String): String = {
        val in = zf.getInputStream(zf.getEntry(n))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      val wb = slurp("xl/workbook.xml")
      assert(wb.contains("""name="mysheet"""") && wb.contains("sheetId=\"1\""))
      val sst = slurp("xl/sharedStrings.xml")
      assert(sst.contains("<si><t>name_1</t></si>"))
      val sheet = slurp("xl/worksheets/sheet1.xml")
      // header row interned through the sst; booleans inline as t="b" 0/1
      assert(sheet.contains("""<c r="A1" t="s">"""))
      assert(sheet.contains("""t="b"><v>1</v>"""))
      // row 4 (i=3) has no E cell — the null wrote a SPARSE row
      assert(!sheet.contains("""<c r="E4""""))
    } finally zf.close()
  }

  test("xlsx: layer model — multi-sheet rejects loudly, layer= selects, missing rejects") {
    val dir = tempDir("xlsx")
    val f = new File(dir, "two.xlsx")
    // hand-built two-sheet workbook straight from the ECMA-376 text
    writeTwoSheet(f)
    val multi = intercept[Xlsx.XlsxException] {
      Catalog.attach(spark, "xlsx_two", "spatial", Map("files" -> f.getAbsolutePath))
    }
    assert(multi.getMessage.contains("2 sheets") && multi.getMessage.contains("alpha"))
    val sel = Catalog.attach(spark, "xlsx_two_b", "spatial",
      Map("files" -> f.getAbsolutePath, "layer" -> "beta"))
    assert(sel.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
    val missing = intercept[Xlsx.XlsxException] {
      Catalog.attach(spark, "xlsx_two_c", "spatial",
        Map("files" -> f.getAbsolutePath, "layer" -> "gamma"))
    }
    assert(missing.getMessage.contains("no sheet `gamma`"))
  }

  test("xlsx: HEADERS and FIELD_TYPES open_options are honored; junk rejects") {
    val dir = tempDir("xlsx")
    val f = new File(dir, "h.xlsx")
    Xlsx.write(sampleDf, f.getAbsolutePath, Map.empty)
    // DISABLE: the header row reads back as DATA and columns are positional
    val raw = Catalog.attach(spark, "xlsx_h1", "spatial",
      Map("files" -> f.getAbsolutePath, "open_options" -> "HEADERS=DISABLE"))
    // attach folds identifiers to lowercase (the PG convention)
    assert(raw.schema.fieldNames.toSeq == (1 to 5).map(i => s"field$i"))
    assert(raw.count() == 6) // 5 data rows + the header row as data
    // header text mixes with longs → the column degrades to string
    assert(raw.schema("field1").dataType == StringType)
    // FIELD_TYPES=STRING pins every column to string
    val strs = Catalog.attach(spark, "xlsx_h2", "spatial",
      Map("files" -> f.getAbsolutePath,
        "open_options" -> "HEADERS=FORCE, FIELD_TYPES=STRING"))
    assert(strs.schema.fields.forall(_.dataType == StringType))
    assert(strs.count() == 5)
    val bad = intercept[Xlsx.XlsxException] {
      Catalog.attach(spark, "xlsx_h3", "spatial",
        Map("files" -> f.getAbsolutePath, "open_options" -> "GDAL_MAGIC=1"))
    }
    assert(bad.getMessage.contains("GDAL_MAGIC"))
  }

  test("xlsx: inline strings, gaps in refs, and formula strings parse per the spec") {
    val dir = tempDir("xlsx")
    val f = new File(dir, "inline.xlsx")
    // sheet with t="inlineStr", a skipped B cell, a t="str" formula cache,
    // and an out-of-order ref — all legal SpreadsheetML
    writePackage(f, Map(
      "xl/worksheets/sheet1.xml" ->
        ("""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>v</t></is></c><c r="C1" t="inlineStr"><is><t>s</t></is></c></row>""" +
          """<row r="2"><c r="C2" t="str"><v>computed</v></c><c r="A2"><v>1</v></c></row>""" +
          """<row r="3"><c r="A3"><v>2</v></c><c r="B3"><v>9.5</v></c></row>""" +
          """</sheetData></worksheet>""")),
      sheets = Seq("data"))
    val df = Catalog.attach(spark, "xlsx_inline", "spatial",
      Map("files" -> f.getAbsolutePath))
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "s"))
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("v").dataType == DoubleType)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(1) && rows(0).getString(2) == "computed")
    assert(rows(1).getLong(0) == 2L && rows(1).getDouble(1) == 9.5 && rows(1).isNullAt(2))
  }

  test("xlsx: guards — not-a-zip, row cap, mixed attach, geometry options reject") {
    val dir = tempDir("xlsx")
    val junk = new File(dir, "junk.xlsx")
    java.nio.file.Files.write(junk.toPath, "not a zip at all".getBytes)
    val nz = intercept[Xlsx.XlsxException] {
      Catalog.attach(spark, "xlsx_junk", "spatial", Map("files" -> junk.getAbsolutePath))
    }
    assert(nz.getMessage.contains("PK magic"))
    val cap = intercept[Xlsx.XlsxException] {
      Xlsx.write(sampleDf, new File(dir, "cap.xlsx").getAbsolutePath,
        Map("max_rows" -> "3"))
    }
    assert(cap.getMessage.contains("exceed the sheet cap"))
    val good = new File(dir, "ok.xlsx")
    Xlsx.write(sampleDf, good.getAbsolutePath, Map.empty)
    val geo = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "xlsx_geo", "spatial",
        Map("files" -> good.getAbsolutePath, "spatial_filter_box" -> "0,0,1,1"))
    }
    assert(geo.getMessage.contains("attribute-only"))
    // a directory mixing a workbook with a geojson layer rejects up front
    val gj = new File(dir, "pts.geojson")
    java.nio.file.Files.write(gj.toPath,
      """{"type":"FeatureCollection","features":[{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"a":1}}]}""".getBytes)
    val mixed = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "xlsx_mixed", "spatial", Map("files" -> dir.getAbsolutePath))
    }
    assert(mixed.getMessage.contains("container formats"))
  }

  test("xlsx: allowed_drivers gates the XLSX driver like GDAL's list") {
    val dir = tempDir("xlsx")
    val f = new File(dir, "adv.xlsx")
    Xlsx.write(sampleDf, f.getAbsolutePath, Map.empty)
    val denied = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "xlsx_adv", "spatial",
        Map("files" -> f.getAbsolutePath, "allowed_drivers" -> "GeoJSON"))
    }
    assert(denied.getMessage.contains("XLSX"))
    val ok = Catalog.attach(spark, "xlsx_adv2", "spatial",
      Map("files" -> f.getAbsolutePath, "allowed_drivers" -> "XLSX"))
    assert(ok.count() == 5)
  }

  test("xlsx: COPY TO through the SQL surface writes a readable workbook") {
    val dir = tempDir("xlsx")
    val out = new File(dir, "copy_out.xlsx")
    sampleDf.createOrReplaceTempView("xlsx_copy_src")
    graft.sqlapi.SqlApi.executePg(spark,
      s"COPY (SELECT key, name FROM xlsx_copy_src) TO '${out.getAbsolutePath}' (FORMAT xlsx)")
    val back = Catalog.attach(spark, "xlsx_copy_rt", "spatial",
      Map("files" -> out.getAbsolutePath))
    assert(back.count() == 5 && back.schema.fieldNames.toSeq == Seq("key", "name"))
  }

  // ---- hand-built fixtures straight from the public package spec ----

  private def writePackage(f: File, parts: Map[String, String],
      sheets: Seq[String]): Unit = {
    val sheetTags = sheets.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="$n" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val relTags = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val base = Map(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        (s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetTags</sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        (s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$relTags</Relationships>"""))
    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    try (base ++ parts).foreach { case (n, c) =>
      zip.putNextEntry(new java.util.zip.ZipEntry(n))
      zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    } finally zip.close()
  }

  private def writeTwoSheet(f: File): Unit = writePackage(f, Map(
    "xl/worksheets/sheet1.xml" ->
      ("""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c></row>""" +
        """</sheetData></worksheet>"""),
    "xl/worksheets/sheet2.xml" ->
      ("""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>""" +
        """<row r="2"><c r="A2"><v>7</v></c></row>""" +
        """<row r="3"><c r="A3"><v>8</v></c></row>""" +
        """</sheetData></worksheet>""")),
    sheets = Seq("alpha", "beta"))
}
