package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native XLSX (OOXML SpreadsheetML) driver — `.xlsx` worksheets →
  * DataFrame, one sheet = one layer. Built from the PUBLIC ECMA-376 /
  * ISO-29500 package model (a zip of XML parts: `xl/workbook.xml` names
  * the sheets, `xl/_rels/workbook.xml.rels` maps them to
  * `xl/worksheets/sheetN.xml`, `xl/sharedStrings.xml` interns cell text);
  * the reference reaches `.xlsx` through GDAL's XLSX driver surface
  * (src/duckdb/spatial.rs:29-82 — st_read's driver list; the README's
  * "Excel" row). No GDAL or POI code exists here to copy — the parse is a
  * first-principles JDK `java.util.zip` + StAX walk.
  *
  * Layer model (the GeoPackage arrangement): sheets live INSIDE the file,
  * `layer=<sheet>` selects one, a multi-sheet workbook without `layer`
  * rejects loudly listing the names. GDAL XLSX driver open_options are
  * honored where the native reader has real equivalents: `HEADERS=
  * FORCE|DISABLE|AUTO` (default AUTO) and `FIELD_TYPES=AUTO|STRING`.
  *
  * Cell semantics per the spec: `t="s"` indexes sharedStrings, `t="str"`
  * is a formula's cached string, `t="inlineStr"` carries `<is><t>`,
  * `t="b"` is boolean 0/1, `t="e"` (error) reads as null, no `t` is a
  * number. Numbers whose column probe all parse as integers surface as
  * LONG, otherwise DOUBLE; excel date serials are numbers with a style —
  * style-table number formats are NOT interpreted (dates surface as their
  * serial numbers, the documented GDAL behavior without autodetect).
  *
  * Scale shape: one workbook = one task (the zip has no record-level
  * split point), many files parallelize — the GeoPackage contract. The
  * driver reads only the FIRST file (schema probe); full row parsing runs
  * in executors. A per-file byte guard rejects monoliths loudly.
  */
object Xlsx {

  final case class XlsxException(msg: String) extends IllegalArgumentException(msg)

  /** Spec row cap per worksheet (ECMA-376 §18.3.1.73: max row 1048576). */
  val MaxRows: Int = 1048576
  /** Per-file read guard: a workbook is parsed whole in one task. */
  val MaxBytes: Long = 256L * 1024 * 1024

  // ------------------------------------------------------------------ read

  def read(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw XlsxException("xlsx attach needs at least one .xlsx path")
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[String] = paths.flatMap { p =>
      if (p.exists("*?[{".contains(_))) {
        val hp = new Path(p)
        val matched = Option(hp.getFileSystem(conf).globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw XlsxException(s"glob `$p` matches no workbooks")
        matched.map(_.getPath.toString)
      } else Seq(p)
    }
    val (headers, fieldTypes) = parseOpenOptions(options.get("open_options"))
    // schema from the FIRST file (bounded driver read); every other file is
    // checked against it in its executor task — union-by-position over
    // diverging sheets would silently misalign columns
    val wb0 = openWorkbook(conf, files.head)
    val layer = resolveLayer(wb0, options.get("layer"), files.head)
    val (schema, _) = sheetSchema(wb0, layer, headers, fieldTypes, files.head)

    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val layerName = layer
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        val wb = openWorkbook(c, f)
        val (sch, dataRows) = sheetSchema(wb, layerName, headers, fieldTypes, f)
        if (sch != schema) throw XlsxException(
          s"workbook `$f` sheet `$layerName` has a different schema; attach it separately")
        dataRows
      }
    spark.createDataFrame(rows, schema)
  }

  /** GDAL XLSX driver open_options this native reader honors. */
  private def parseOpenOptions(oo: Option[String]): (String, String) = {
    var headers = "AUTO"
    var fieldTypes = "AUTO"
    oo.map(_.trim).filter(_.nonEmpty).foreach { s =>
      s.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.equalsIgnoreCase("HEADERS") =>
            val u = v.trim.toUpperCase
            if (!Set("FORCE", "DISABLE", "AUTO").contains(u)) throw XlsxException(
              s"xlsx open_options HEADERS must be FORCE, DISABLE or AUTO, got `$v`")
            headers = u
          case Array(k, v) if k.trim.equalsIgnoreCase("FIELD_TYPES") =>
            val u = v.trim.toUpperCase
            if (!Set("AUTO", "STRING").contains(u)) throw XlsxException(
              s"xlsx open_options FIELD_TYPES must be AUTO or STRING, got `$v`")
            fieldTypes = u
          case other => throw XlsxException(
            s"xlsx open_options entry `$kv` is not supported by this native " +
              "reader (HEADERS=FORCE|DISABLE|AUTO, FIELD_TYPES=AUTO|STRING)")
        }
      }
    }
    (headers, fieldTypes)
  }

  /** The parsed workbook: sheet name → worksheet part bytes, plus the
    * shared-strings table. */
  private final case class Workbook(sheets: Seq[(String, Array[Byte])],
    shared: IndexedSeq[String])

  private def openWorkbook(conf: Configuration, path: String): Workbook = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw XlsxException(s"workbook `$path` does not exist")
    val len = fs.getFileStatus(p).getLen
    if (len > MaxBytes) throw XlsxException(
      s"workbook `$path` is $len bytes — a .xlsx is parsed whole in one task; " +
        s"the guard is $MaxBytes bytes (use csv/parquet for data this size)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    if (bytes.length < 4 || bytes(0) != 'P' || bytes(1) != 'K')
      throw XlsxException(s"`$path` is not a zip archive (no PK magic) — not an .xlsx")
    val parts = mutable.Map.empty[String, Array[Byte]]
    val z = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = z.getNextEntry
      while (e != null) {
        val name = e.getName.stripPrefix("/")
        if (name == "xl/workbook.xml" || name == "xl/_rels/workbook.xml.rels" ||
          name == "xl/sharedStrings.xml" || name.startsWith("xl/worksheets/")) {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = z.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = z.read(tmp) }
          parts(name) = buf.toByteArray
        }
        z.closeEntry()
        e = z.getNextEntry
      }
    } finally z.close()
    val wbXml = parts.getOrElse("xl/workbook.xml",
      throw XlsxException(s"`$path` has no xl/workbook.xml — not an .xlsx workbook"))
    // sheet name → r:id, in workbook order
    val sheetIds = Seq.newBuilder[(String, String)]
    foreachElement(wbXml) { (name, attrs) =>
      if (name == "sheet")
        sheetIds += ((attrs.getOrElse("name",
          throw XlsxException(s"`$path`: <sheet> without a name")),
          attrs.getOrElse("id", attrs.getOrElse("r:id",
            throw XlsxException(s"`$path`: <sheet> without r:id")))))
    }
    // r:id → part path (targets are relative to xl/ unless rooted)
    val rels = mutable.Map.empty[String, String]
    parts.get("xl/_rels/workbook.xml.rels").foreach { relXml =>
      foreachElement(relXml) { (name, attrs) =>
        if (name == "Relationship")
          for (id <- attrs.get("Id"); t <- attrs.get("Target"))
            rels(id) = if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t"
      }
    }
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheets = sheetIds.result().map { case (nm, rid) =>
      val part = rels.getOrElse(rid, throw XlsxException(
        s"`$path`: sheet `$nm` relationship `$rid` unresolved"))
      val bytesPart = parts.getOrElse(part, throw XlsxException(
        s"`$path`: sheet `$nm` part `$part` missing from the package"))
      (nm, bytesPart)
    }
    if (sheets.isEmpty) throw XlsxException(s"`$path` declares no worksheets")
    Workbook(sheets, shared)
  }

  private def resolveLayer(wb: Workbook, layer: Option[String], path: String): String =
    layer match {
      case Some(l) =>
        if (!wb.sheets.exists(_._1 == l)) throw XlsxException(
          s"workbook `$path` has no sheet `$l`; available: " +
            wb.sheets.map(_._1).mkString(", "))
        l
      case None =>
        if (wb.sheets.size > 1) throw XlsxException(
          s"workbook `$path` holds ${wb.sheets.size} sheets (" +
            wb.sheets.map(_._1).mkString(", ") +
            "); select one with layer=<name>")
        wb.sheets.head._1
    }

  /** One parsed cell: the raw text and its spec kind. */
  private final case class Cell(kind: Char, text: String) // 's'tr 'n'um 'b'ool

  /** Worksheet XML → (row index, col index → Cell); sparse per the spec. */
  private def parseSheetCells(xml: Array[Byte], shared: IndexedSeq[String],
      path: String): Seq[Map[Int, Cell]] = {
    val rows = mutable.ArrayBuffer.empty[Map[Int, Cell]]
    val f = secureInputFactory()
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      var inV = false; var inIsT = false
      var cellT = ""; var cellCol = -1
      var text = new java.lang.StringBuilder
      var cur: mutable.Map[Int, Cell] = null
      var sawValue = false
      def flushCell(): Unit = if (cellCol >= 0 && sawValue) {
        val s = text.toString
        val cell = cellT match {
          case "s" =>
            val i = s.trim.toInt
            if (i < 0 || i >= shared.length) throw XlsxException(
              s"`$path`: shared-string index $i out of range (${shared.length})")
            Cell('s', shared(i))
          case "str" | "inlineStr" => Cell('s', s)
          case "b" => Cell('b', if (s.trim == "1" || s.trim.equalsIgnoreCase("true")) "true" else "false")
          case "e" => null // cached formula error → null
          case _ => Cell('n', s.trim)
        }
        if (cell != null && cur != null) cur(cellCol) = cell
      }
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cur = mutable.Map.empty[Int, Cell]
              case "c" =>
                cellT = Option(r.getAttributeValue(null, "t")).getOrElse("")
                cellCol = Option(r.getAttributeValue(null, "r"))
                  .map(colOf).getOrElse(if (cur == null) -1 else cur.size)
                text = new java.lang.StringBuilder; sawValue = false
              case "v" => inV = true; sawValue = true
              case "t" if cellT == "inlineStr" => inIsT = true; sawValue = true
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS
            | javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inV || inIsT) text.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" => flushCell(); cellCol = -1
              case "row" => if (cur != null) { rows += cur.toMap; cur = null }
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    rows.toSeq
  }

  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val f = secureInputFactory()
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      var depthSi = 0; var inT = false
      var text = new java.lang.StringBuilder
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => depthSi += 1; text = new java.lang.StringBuilder
              case "t" if depthSi > 0 => inT = true // rich-text runs concatenate
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS
            | javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT) text.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => depthSi -= 1; out += text.toString
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** XXE-hardened StAX factory: DTDs and external entities off. */
  private def secureInputFactory(): javax.xml.stream.XMLInputFactory = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Minimal attribute walk for the flat workbook/rels parts. */
  private def foreachElement(xml: Array[Byte])(
      fn: (String, Map[String, String]) => Unit): Unit = {
    val f = secureInputFactory()
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    try while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT) {
        val attrs = (0 until r.getAttributeCount).map { i =>
          r.getAttributeLocalName(i) -> r.getAttributeValue(i)
        }.toMap
        fn(r.getLocalName, attrs)
      }
    } finally r.close()
  }

  /** "BC7" → 0-based column index 54. */
  private def colOf(ref: String): Int = {
    var i = 0; var v = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      v = v * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    if (v == 0) throw XlsxException(s"cell ref `$ref` has no column letters")
    v - 1
  }

  /** 0-based column index → "A".."XFD". */
  private[sources] def colName(i: Int): String = {
    var v = i + 1; val sb = new StringBuilder
    while (v > 0) { val r = (v - 1) % 26; sb.insert(0, ('A' + r).toChar); v = (v - 1) / 26 }
    sb.toString
  }

  private val intRe = """[+-]?\d{1,18}""".r

  /** Parse + infer: (schema, typed rows) for one sheet of one file. Header
    * policy AUTO = header when every first-row cell is a string and the
    * sheet has more than one row (the GDAL XLSX heuristic's core). */
  private def sheetSchema(wb: Workbook, layer: String, headers: String,
      fieldTypes: String, path: String): (StructType, Seq[Row]) = {
    val xml = wb.sheets.find(_._1 == layer).getOrElse(throw XlsxException(
      s"workbook `$path` has no sheet `$layer`; available: " +
        wb.sheets.map(_._1).mkString(", ")))._2
    val cells = parseSheetCells(xml, wb.shared, path)
    if (cells.isEmpty) throw XlsxException(
      s"workbook `$path` sheet `$layer` is empty — nothing to attach")
    val width = cells.iterator.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
    if (width == 0) throw XlsxException(
      s"workbook `$path` sheet `$layer` has no populated cells")
    val useHeader = headers match {
      case "FORCE" => true
      case "DISABLE" => false
      case _ => cells.length > 1 &&
        (0 until width).forall(c => cells.head.get(c).exists(_.kind == 's'))
    }
    val names: Seq[String] =
      if (useHeader) (0 until width).map { c =>
        cells.head.get(c).map(_.text).filter(_.nonEmpty).getOrElse(s"Field${c + 1}")
      } else (0 until width).map(c => s"Field${c + 1}")
    val dup = names.groupBy(identity).collectFirst { case (n, g) if g.size > 1 => n }
    dup.foreach(n => throw XlsxException(
      s"workbook `$path` sheet `$layer` has duplicate header `$n`; " +
        "HEADERS=DISABLE reads positional Field1..N"))
    val data = if (useHeader) cells.tail else cells
    // per-column type: bool if all bool; long if all numeric-integer;
    // double if all numeric; else string (FIELD_TYPES=STRING pins string)
    val types: Seq[DataType] = (0 until width).map { c =>
      if (fieldTypes == "STRING") StringType
      else {
        val vs = data.flatMap(_.get(c))
        if (vs.isEmpty) StringType
        else if (vs.forall(_.kind == 'b')) BooleanType
        else if (vs.forall(_.kind == 'n')) {
          if (vs.forall(v => intRe.pattern.matcher(v.text).matches())) LongType
          else DoubleType
        } else StringType
      }
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val rows: Seq[Row] = data.map { m =>
      Row.fromSeq((0 until width).map { c =>
        m.get(c) match {
          case None => null
          case Some(cell) => types(c) match {
            case BooleanType => cell.text == "true"
            case LongType =>
              // numeric cells may render integers as "42" or "4.2E1"
              if (intRe.pattern.matcher(cell.text).matches()) cell.text.toLong
              else cell.text.toDouble.toLong
            case DoubleType => cell.text.toDouble
            case _ => cell.text
          }
        }
      })
    }
    (schema, rows)
  }

  // ----------------------------------------------------------------- write

  /** COPY ... TO 'x.xlsx' — one worksheet per file, written driver-side
    * with a loud row guard (the spec caps a sheet at [[MaxRows]] rows; a
    * workbook is ONE zip, there is no distributed write). Strings intern
    * through sharedStrings (the standard Excel arrangement, exercising the
    * reader's sst path); numbers/booleans inline. */
  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    val known = Set("layer", "max_rows", "overwrite")
    options.keys.find(k => !known.contains(k.toLowerCase)).foreach { k =>
      throw XlsxException(
        s"invalid xlsx COPY option `$k`; valid options: ${known.toSeq.sorted.mkString(", ")}")
    }
    val fileName = new Path(path).getName
    val layer = options.getOrElse("layer",
      fileName.stripSuffix(".xlsx").stripSuffix(".XLSX"))
    if (layer.isEmpty || layer.length > 31 || layer.exists("[]*?:/\\".contains(_)))
      throw XlsxException(
        s"xlsx COPY: sheet name `$layer` is invalid (1-31 chars, no []*?:/\\)")
    val maxRows = options.get("max_rows").map(_.toLong).getOrElse(MaxRows.toLong - 1)
    val schema = df.schema
    schema.fields.foreach { f =>
      f.dataType match {
        case StringType | LongType | IntegerType | ShortType | ByteType |
          DoubleType | FloatType | BooleanType | DateType | TimestampType => ()
        case other => throw XlsxException(
          s"xlsx COPY: column `${f.name}` has type ${other.simpleString} " +
            "SpreadsheetML does not define; cast it first")
      }
    }
    val n = df.count()
    if (n > math.min(maxRows, MaxRows.toLong - 1)) throw XlsxException(
      s"xlsx COPY: $n rows exceed the sheet cap (${math.min(maxRows, MaxRows.toLong - 1)}) — " +
        "a worksheet holds at most 1048575 data rows; use csv/parquet for results this size")
    val collected = df.collect()

    val sst = mutable.LinkedHashMap.empty[String, Int]
    def intern(s: String): Int = sst.getOrElseUpdate(s, sst.size)
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }
    val tsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val sheetSb = new java.lang.StringBuilder
    sheetSb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheetSb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def appendRow(ri: Int, vals: Seq[(Int, String, Char)]): Unit = {
      sheetSb.append(s"""<row r="$ri">""")
      vals.foreach { case (ci, body, kind) =>
        val ref = s"${colName(ci)}$ri"
        kind match {
          case 's' => sheetSb.append(s"""<c r="$ref" t="s"><v>$body</v></c>""")
          case 'b' => sheetSb.append(s"""<c r="$ref" t="b"><v>$body</v></c>""")
          case _ => sheetSb.append(s"""<c r="$ref"><v>$body</v></c>""")
        }
      }
      sheetSb.append("</row>")
    }
    appendRow(1, schema.fieldNames.toSeq.zipWithIndex.map { case (nm, ci) =>
      (ci, intern(nm).toString, 's')
    })
    collected.zipWithIndex.foreach { case (r, i) =>
      val vals = schema.fields.toSeq.zipWithIndex.flatMap { case (f, ci) =>
        val v = r.get(ci)
        if (v == null) None
        else Some(f.dataType match {
          case StringType => (ci, intern(v.asInstanceOf[String]).toString, 's')
          case BooleanType => (ci, if (v.asInstanceOf[Boolean]) "1" else "0", 'b')
          case LongType | IntegerType | ShortType | ByteType =>
            (ci, v.toString, 'n')
          case DoubleType | FloatType => (ci, v.toString, 'n')
          case DateType => (ci, intern(v.toString).toString, 's')
          case TimestampType =>
            (ci, intern(tsFmt.format(v.asInstanceOf[java.sql.Timestamp].toInstant)).toString, 's')
          case _ => (ci, intern(v.toString).toString, 's')
        })
      }
      appendRow(i + 2, vals)
    }
    sheetSb.append("</sheetData></worksheet>")

    val sstXml = {
      val sb = new java.lang.StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">""")
      sst.keys.foreach { s =>
        val preserve = s != s.trim
        sb.append(if (preserve) s"""<si><t xml:space="preserve">${esc(s)}</t></si>"""
        else s"<si><t>${esc(s)}</t></si>")
      }
      sb.append("</sst>"); sb.toString
    }
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${esc(layer)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
        """</Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        """</Types>"""

    val target = new Path(path)
    val fs = target.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(target) && !options.get("overwrite").exists(_.toBoolean))
      throw XlsxException(s"`$path` exists; pass overwrite=true to replace it")
    val out = fs.create(target, true)
    val zip = new ZipOutputStream(out)
    try {
      def put(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes("UTF-8"))
        zip.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/worksheets/sheet1.xml", sheetSb.toString)
      put("xl/sharedStrings.xml", sstXml)
    } finally zip.close()
  }
}
