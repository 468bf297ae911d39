package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native MapInfo MIF/MID reader — the `st_read` "MapInfo File" driver
  * surface (reference src/duckdb/spatial.rs:29-82 reaches it via GDAL;
  * this is a from-scratch parse of the PUBLIC MIF interchange format):
  * the shapefile sibling pattern — PAIRED files (`.mif` header + geometry
  * stream, sibling `.mid` delimited attribute rows, one per geometry
  * record, paired by order), typed attribute columns declared in the
  * header, geometry through the SAME OGC WKB codec as every spatial
  * driver here.
  *
  * Header keywords honored: VERSION, CHARSET (UTF-8/Neutral/WindowsLatin1
  * subset — anything else rejects), DELIMITER, COLUMNS n (+ n typed
  * declarations), DATA; COORDSYS is CRS metadata and carries through
  * unused, but a TRANSFORM clause RESCALES coordinates — out of scope,
  * loud reject (silently un-transformed geometry would be corrupt).
  * Column types: Char(n)→string, Integer/Smallint→int, Float and
  * Decimal(w,p)→double, Date→string (yyyymmdd as written), Logical→
  * boolean. Geometry records in scope:
  *
  *   NONE                         → NULL geom
  *   POINT x y                    → Point
  *   LINE x1 y1 x2 y2             → LineString(2)
  *   PLINE [MULTIPLE n] …         → LineString | MultiLineString
  *   REGION n (rings)             → Polygon | MultiPolygon (rings grouped
  *                                  by CONTAINMENT — even nesting depth =
  *                                  outer shell, odd = hole of its innermost
  *                                  shell, the GDAL organizePolygons rule —
  *                                  because MIF, unlike shapefile, does NOT
  *                                  mandate ring orientation)
  *   MULTIPOINT n x y …           → MultiPoint
  *
  * Styling clauses (PEN/BRUSH/SYMBOL/SMOOTH/CENTER) are skipped — they
  * carry no geometry. Out-of-scope constructs reject LOUDLY naming the
  * file: ARC/TEXT/RECT/ROUNDRECT/ELLIPSE/COLLECTION (curves and cosmetic
  * shapes have no rendering in the WKB contract), and the binary `.tab`
  * flavor (attach the MIF export, or use a GDAL deployment). A `.mid`
  * row-count that disagrees with the geometry stream rejects — pairing
  * by order is the format's only row identity, so a silent zip would
  * mis-attribute every later row.
  *
  * Schema comes from the header, so files parse in EXECUTORS one task per
  * pair after a one-file header probe (the shapefile arrangement); the
  * basename-=-layer model applies. */
object Mif {

  final case class MifException(msg: String) extends IllegalArgumentException(msg)

  def read(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw MifException("MIF attach needs at least one .mif path")
    paths.find(_.toLowerCase.endsWith(".tab")).foreach { t =>
      throw MifException(
        s"`$t`: binary MapInfo TAB is outside this native reader's scope; " +
          "export the interchange MIF/MID pair or use a GDAL deployment")
    }
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[String] = paths.flatMap { p =>
      if (p.exists("*?[{".contains(_))) {
        val hp = new Path(p)
        val matched = Option(hp.getFileSystem(conf).globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw MifException(s"glob `$p` matches no .mif files")
        matched.map(_.getPath.toString)
      } else Seq(p)
    }
    // one-file header probe pins the schema; every other file must agree
    // (the multi-file attach contract all drivers here share)
    val probe = parseHeader(lines(conf, files.head), files.head)
    val schema = StructType(probe.cols.map { case (n, dt, _) =>
      StructField(n, dt, nullable = true)
    } :+ StructField("geom", BinaryType, nullable = true))
    import scala.jdk.CollectionConverters._
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val expectCols = probe.cols
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        parseOne(c, f, expectCols)
      }
    spark.createDataFrame(rows, schema)
  }

  // ------------------------------------------------------------- header

  /** (name, spark type, declared MIF type) — the declared type drives
    * empty-field semantics (an empty Date/Integer field is NULL; an empty
    * Char field is the empty string). */
  private case class Header(cols: Seq[(String, DataType, String)], delimiter: Char,
    dataAt: Int)

  private def lines(conf: Configuration, f: String): Array[String] = {
    val p = new Path(f)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw MifException(s"`$f`: file does not exist")
    val lenL = fs.getFileStatus(p).getLen
    if (lenL > Int.MaxValue - 16) throw MifException(
      s"`$f`: $lenL bytes — this text-interchange reader loads whole files " +
        "and a >2 GB MIF/MID is outside its scope; split the export or use " +
        "a GDAL deployment")
    val in = fs.open(p)
    val bytes = try {
      val len = lenL.toInt
      val a = new Array[Byte](len); in.readFully(0, a); a
    } finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8).split("\r?\n", -1)
  }

  private def parseHeader(ls: Array[String], f: String): Header = {
    var delimiter = '\t'
    var cols = Seq.empty[(String, DataType, String)]
    var i = 0
    var dataAt = -1
    while (i < ls.length && dataAt < 0) {
      val t = ls(i).trim
      val up = t.toUpperCase
      if (up.startsWith("VERSION")) ()
      else if (up.startsWith("CHARSET")) {
        val cs = t.drop(7).trim.stripPrefix("\"").stripSuffix("\"")
        if (!Set("NEUTRAL", "UTF-8", "UTF8", "WINDOWSLATIN1").contains(cs.toUpperCase))
          throw MifException(
            s"`$f`: charset `$cs` needs a codepage table this native reader " +
              "does not carry; re-export as UTF-8/Neutral or use a GDAL deployment")
      } else if (up.startsWith("DELIMITER")) {
        val d = t.drop(9).trim.stripPrefix("\"").stripSuffix("\"")
        if (d.length != 1) throw MifException(s"`$f`: DELIMITER `$d` is not one character")
        delimiter = d.head
      } else if (up.startsWith("COORDSYS")) () // CRS metadata — geometry values as written
      else if (up.startsWith("TRANSFORM")) throw MifException(
        s"`$f`: TRANSFORM clause rescales coordinates — out of this native " +
          "reader's scope; bake the transform in on export or use a GDAL deployment")
      else if (up.startsWith("UNIQUE") || up.startsWith("INDEX")) ()
      else if (up.startsWith("COLUMNS")) {
        val n = t.drop(7).trim.toInt
        cols = (1 to n).map { j =>
          if (i + j >= ls.length) throw MifException(s"`$f`: COLUMNS $n declared, file ends early")
          val decl = ls(i + j).trim.split("\\s+", 2)
          if (decl.length != 2) throw MifException(s"`$f`: malformed column declaration `${ls(i + j).trim}`")
          (decl(0), mifType(decl(1).trim, f), decl(1).trim.toUpperCase.takeWhile(_.isLetter))
        }
        i += n
      } else if (up == "DATA") dataAt = i
      else if (t.nonEmpty) throw MifException(
        s"`$f`: unknown MIF header keyword `${t.split("\\s+").head}` — " +
          "skipping silently could mis-read the data section")
      i += 1
    }
    if (dataAt < 0) throw MifException(s"`$f`: no DATA section — not a MIF file?")
    Header(cols, delimiter, dataAt)
  }

  private def mifType(decl: String, f: String): DataType = {
    val up = decl.toUpperCase
    if (up.startsWith("CHAR")) StringType
    else if (up == "INTEGER" || up == "SMALLINT") IntegerType
    else if (up == "FLOAT" || up.startsWith("DECIMAL")) DoubleType
    else if (up == "DATE") StringType
    else if (up == "LOGICAL") BooleanType
    else throw MifException(s"`$f`: column type `$decl` is outside this " +
      "native reader's scope (Char/Integer/Smallint/Float/Decimal/Date/Logical)")
  }

  // ----------------------------------------------------------- geometry

  private def parseOne(conf: Configuration, f: String,
      expect: Seq[(String, DataType, String)]): Iterator[Row] = {
    if (f.toLowerCase.endsWith(".tab")) throw MifException(
      s"`$f`: binary MapInfo TAB is outside this native reader's scope; " +
        "export the interchange MIF/MID pair or use a GDAL deployment")
    val ls = lines(conf, f)
    val h = parseHeader(ls, f)
    if (h.cols != expect) throw MifException(
      s"`$f`: column declarations differ from the attach's first file — " +
        "multi-file attaches must share one schema")
    import Shapefile.{wkbHeader, leInt, le16, lineString}
    var i = h.dataAt + 1
    def nextNonEmpty(): Option[String] = {
      while (i < ls.length && ls(i).trim.isEmpty) i += 1
      if (i < ls.length) Some(ls(i).trim) else None
    }
    def xy(line: String, what: String): (Double, Double) = {
      val p = line.trim.split("\\s+")
      if (p.length != 2) throw MifException(s"`$f`: $what expects `x y`, got `$line`")
      (p(0).toDouble, p(1).toDouble)
    }
    def takePoints(n: Int, what: String): Array[(Double, Double)] = {
      if (n < 2 && what != "MULTIPOINT") throw MifException(
        s"`$f`: $what declares $n points — a degenerate geometry is data corruption, not data")
      Array.fill(n) {
        i += 1
        if (i >= ls.length) throw MifException(s"`$f`: $what point list ends early")
        xy(ls(i), what)
      }
    }
    val geoms = Seq.newBuilder[Array[Byte]]
    var done = false
    while (!done) nextNonEmpty() match {
      case None => done = true
      case Some(line) =>
        val toks = line.split("\\s+")
        val kw = toks.head.toUpperCase
        kw match {
          case "NONE" => geoms += null
          case "POINT" =>
            if (toks.length != 3) throw MifException(s"`$f`: POINT expects `POINT x y`, got `$line`")
            geoms += wkbHeader(1) ++ le16(toks(1).toDouble, toks(2).toDouble)
          case "LINE" =>
            if (toks.length != 5) throw MifException(s"`$f`: LINE expects 4 coordinates, got `$line`")
            geoms += wkbHeader(2) ++ lineString(Array(
              (toks(1).toDouble, toks(2).toDouble), (toks(3).toDouble, toks(4).toDouble)))
          case "PLINE" =>
            val sections =
              if (toks.length >= 3 && toks(1).toUpperCase == "MULTIPLE") {
                val n = toks(2).toInt
                (1 to n).map { _ =>
                  i += 1
                  val cnt = ls(i).trim.toInt
                  takePoints(cnt, "PLINE")
                }
              } else {
                val cnt =
                  if (toks.length == 2) toks(1).toInt
                  else { i += 1; ls(i).trim.toInt }
                Seq(takePoints(cnt, "PLINE"))
              }
            geoms += (if (sections.length == 1) wkbHeader(2) ++ lineString(sections.head)
              else wkbHeader(5) ++ leInt(sections.length) ++
                sections.flatMap(s => wkbHeader(2) ++ lineString(s)))
          case "REGION" =>
            val n = toks(1).toInt
            if (n < 1) throw MifException(s"`$f`: REGION declares $n rings")
            val rings = (1 to n).map { _ =>
              i += 1
              val cnt = ls(i).trim.toInt
              val pts = takePoints(cnt, "REGION")
              // MIF rings are open; WKB linear rings close explicitly
              if (pts.head == pts.last) pts else pts :+ pts.head
            }
            val grouped = groupRingsByContainment(rings, f)
            geoms += (if (grouped.length == 1)
                wkbHeader(3) ++ leInt(grouped.head.length) ++ grouped.head.flatMap(lineString)
              else wkbHeader(6) ++ leInt(grouped.length) ++ grouped.flatMap { poly =>
                wkbHeader(3) ++ leInt(poly.length) ++ poly.flatMap(lineString)
              })
          case "MULTIPOINT" =>
            val n = toks(1).toInt
            val pts = takePoints(n, "MULTIPOINT")
            geoms += wkbHeader(4) ++ leInt(pts.length) ++
              pts.flatMap { case (x, y) => wkbHeader(1) ++ le16(x, y) }
          case "PEN" | "BRUSH" | "SYMBOL" | "SMOOTH" | "CENTER" => () // styling — no geometry
          case curve @ ("ARC" | "ELLIPSE" | "RECT" | "ROUNDRECT" | "TEXT" | "COLLECTION") =>
            throw MifException(
              s"`$f`: $curve geometry is outside this native reader's scope " +
                "(no curve/cosmetic types in the WKB contract); use a GDAL deployment")
          case other => throw MifException(
            s"`$f`: unknown MIF record `$other` — skipping silently would drop data")
        }
        i += 1
    }
    val gs = geoms.result()
    val attrs = midRows(conf, f, h, gs.length)
    gs.iterator.zip(attrs.iterator).map { case (g, a) => Row.fromSeq(a :+ g) }
  }

  // ------------------------------------------------------- ring grouping

  /** Even-odd ray cast; `ring` is closed (first == last) but the test
    * works either way. Boundary points are ambiguous by nature — MIF ring
    * sets with coincident ring edges are invalid data, not a case this
    * classifier must resolve. */
  private def pointInRing(x: Double, y: Double, ring: Array[(Double, Double)]): Boolean = {
    var inside = false
    var a = 0
    var b = ring.length - 1
    while (a < ring.length) {
      val (xa, ya) = ring(a); val (xb, yb) = ring(b)
      if ((ya > y) != (yb > y) && x < (xb - xa) * (y - ya) / (yb - ya) + xa)
        inside = !inside
      b = a; a += 1
    }
    inside
  }

  /** Group a REGION's rings into polygons by CONTAINMENT (the GDAL
    * organizePolygons rule): a ring nested inside an even number of other
    * rings is an outer shell, odd-depth rings are holes of their INNERMOST
    * containing shell. MIF does not mandate ring orientation (unlike
    * shapefile, whose CW-outer convention Shapefile.groupRings encodes),
    * so a file whose holes are clockwise must still decode as holes — the
    * orientation convention would silently read them as separate solid
    * polygons. O(rings²) point-in-ring tests per record, fine at the
    * tens-of-rings scale one REGION record carries. */
  private def groupRingsByContainment(rings: Seq[Array[(Double, Double)]],
      f: String): Seq[Seq[Array[(Double, Double)]]] = {
    val n = rings.length
    if (n == 1) return Seq(Seq(rings.head))
    val depth = Array.tabulate(n) { j =>
      val (x, y) = rings(j).head
      rings.indices.count(k => k != j && pointInRing(x, y, rings(k)))
    }
    val shells = rings.indices.filter(depth(_) % 2 == 0)
    val holes = scala.collection.mutable.Map.empty[Int, Vector[Int]]
    rings.indices.filter(depth(_) % 2 == 1).foreach { hj =>
      val (x, y) = rings(hj).head
      // the innermost containing even-depth ring is the hole's shell
      val parent = shells.filter(s => pointInRing(x, y, rings(s)))
        .sortBy(s => -depth(s)).headOption.getOrElse(throw MifException(
          s"`$f`: REGION hole ring nests in no outer shell — corrupt ring set"))
      holes(parent) = holes.getOrElse(parent, Vector.empty) :+ hj
    }
    shells.map(s => rings(s) +: holes.getOrElse(s, Vector.empty).map(rings(_)))
  }

  // ---------------------------------------------------------------- MID

  private def midRows(conf: Configuration, mif: String, h: Header,
      nGeoms: Int): Seq[Seq[Any]] = {
    if (h.cols.isEmpty) return Seq.fill(nGeoms)(Seq.empty)
    val base = mif.replaceAll("(?i)\\.mif$", "")
    val p = new Path(base + ".mid")
    val fs = p.getFileSystem(conf)
    val mid = if (fs.exists(p)) p else {
      val up = new Path(base + ".MID")
      if (fs.exists(up)) up else throw MifException(
        s"`$mif`: header declares ${h.cols.length} columns but no sibling " +
          ".mid attribute file exists")
    }
    // trailing empty lines are ambiguous: the terminal-newline split
    // artifact and stray blank lines at EOF carry no record, but an empty
    // LINE is a legitimate row when a single Char column's value is empty.
    // Resolve against nGeoms — the geometry count is the ground truth for
    // how many attribute rows exist: trim trailing empties, but never
    // below nGeoms (so "a\n\n" with 2 geometries keeps its empty last
    // row, while "a\nb\n\n" with 2 geometries drops the stray blank).
    // Interior empties always stay (multi-column files fail the
    // field-count check loudly instead of mis-zipping the rest).
    val all0raw = lines(conf, mid.toString).toSeq
    // the -1 split always yields one final "" when the text ends with \n
    // — that artifact is never a row, drop it unconditionally first
    val all0 = if (all0raw.nonEmpty && all0raw.last.isEmpty) all0raw.init
      else all0raw
    val trimmed = all0.reverse.dropWhile(_.isEmpty).reverse
    val rows = if (trimmed.length < nGeoms && all0.length >= nGeoms)
      all0.take(nGeoms) else trimmed
    if (rows.length != nGeoms) throw MifException(
      s"`$mid`: ${rows.length} attribute rows but ${nGeoms} geometry records " +
        "— order is the only row identity in MIF/MID, a silent zip would " +
        "mis-attribute every later row")
    rows.map { r =>
      val fields = splitMid(r, h.delimiter, mid.toString)
      if (fields.length != h.cols.length) throw MifException(
        s"`$mid`: row has ${fields.length} fields, header declares ${h.cols.length}")
      fields.zip(h.cols).map { case (v, (_, dt, declared)) =>
        if (v.isEmpty && declared != "CHAR") null
        else dt match {
          case StringType => v
          case IntegerType => java.lang.Integer.valueOf(v.trim.toInt)
          case DoubleType => java.lang.Double.valueOf(v.trim.toDouble)
          case BooleanType => java.lang.Boolean.valueOf(
            v.trim.equalsIgnoreCase("T") || v.trim.equalsIgnoreCase("true"))
          case other => throw MifException(s"unreachable MID type $other")
        }
      }
    }
  }

  /** Delimited MID row split: double-quoted fields may contain the
    * delimiter; `""` inside quotes is an escaped quote. */
  private def splitMid(row: String, delim: Char, f: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var k = 0
    while (k < row.length) {
      val c = row.charAt(k)
      if (inQ) {
        if (c == '"') {
          if (k + 1 < row.length && row.charAt(k + 1) == '"') { cur.append('"'); k += 1 }
          else inQ = false
        } else cur.append(c)
      } else if (c == '"') inQ = true
      else if (c == delim) { out += cur.toString; cur.clear() }
      else cur.append(c)
      k += 1
    }
    if (inQ) throw MifException(s"`$f`: unterminated quoted field in `$row`")
    out += cur.toString
    out.result()
  }
}
