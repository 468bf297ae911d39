package graft.sqlapi

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets

/** CSV dialect detection (reference: sniff_csv(), src/api/csv.rs:41-95):
  * sample the file head, score candidate delimiters by per-line field-count
  * consistency, detect quote/header/newline, then let Spark infer column
  * types on the sample. Spark has no built-in sniffer — this is custom code
  * (SURVEY §2.1 #29), driver-side by design: it reads a bounded prefix
  * (default 20 KiB) regardless of file size, so it is O(1) at 100 TB.
  */
object SniffCsv {

  final case class Dialect(
      delimiter: String, quote: String, escape: String, newLine: String,
      skipRows: Int, hasHeader: Boolean, columns: Seq[(String, String)],
      dateFormat: String, timestampFormat: String)

  private val candidateDelims = Seq(",", ";", "|", "\t")

  def sniff(spark: SparkSession, path: String, sampleBytes: Int = 20480): Dialect = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val buf = new Array[Byte](sampleBytes)
    val n = try in.read(buf, 0, sampleBytes) finally in.close()
    val sample = new String(buf, 0, math.max(n, 0), StandardCharsets.UTF_8)

    val newLine = if (sample.contains("\r\n")) "\r\n" else "\n"
    val lines = sample.split("\r?\n").toSeq.filter(_.nonEmpty)
    // a sampled last line may be truncated mid-record; drop it when the
    // sample filled the buffer
    val whole = if (n == sampleBytes && lines.size > 1) lines.dropRight(1) else lines

    val delimiter = candidateDelims.maxBy { d =>
      val counts = whole.map(l => splitOutsideQuotes(l, d, '"').length)
      if (counts.isEmpty || counts.max == 1) -1.0
      else {
        // consistency score: fraction of lines agreeing with the modal count
        val modal = counts.groupBy(identity).maxBy(_._2.size)._1
        if (modal == 1) -1.0 else counts.count(_ == modal).toDouble / counts.size * modal
      }
    }
    // skip_rows: leading preamble lines whose field count disagrees with the
    // modal table width (reference returns it from DuckDB's sniffer,
    // src/api/csv.rs:60-66; previously hardcoded 0)
    val counts = whole.map(l => splitOutsideQuotes(l, delimiter, '"').length)
    val modal = if (counts.isEmpty) 1 else counts.groupBy(identity).maxBy(_._2.size)._1
    val skipRows = counts.takeWhile(_ != modal).length
    val body = whole.drop(skipRows)

    val quote = if (sample.contains("\"")) "\"" else ""
    val header = body.headOption.exists { h =>
      val hf = splitOutsideQuotes(h, delimiter, '"')
      val df = body.drop(1).headOption.map(splitOutsideQuotes(_, delimiter, '"'))
      hf.forall(f => parseAs(f.trim.stripPrefix("\"").stripSuffix("\"")) == "VARCHAR") &&
        df.exists(_.exists(f => parseAs(f.trim) != "VARCHAR"))
    }
    // column name/types from Spark's own inference over the (preamble-free)
    // sampled body — no second file read
    import spark.implicits._
    val inferred = spark.read
      .option("header", header.toString).option("sep", delimiter)
      .option("inferSchema", "true")
      .csv(spark.createDataset(body))
      .schema
    // date/timestamp formats detected from the sampled data values
    // (previously hardcoded; reference surfaces DuckDB's detection)
    val dataFields = body.drop(if (header) 1 else 0)
      .flatMap(splitOutsideQuotes(_, delimiter, '"')).map(_.trim)
    val dateFormat = detectDateFormat(dataFields).getOrElse("%Y-%m-%d")
    val tsFormat = detectTimestampFormat(dataFields).getOrElse("%Y-%m-%dT%H:%M:%S.%f")
    Dialect(delimiter, quote, if (quote.nonEmpty) "\"" else "", newLine, skipRows, header,
      inferred.fields.toSeq.map(f => f.name -> duckName(f.dataType)),
      dateFormat, tsFormat)
  }

  private[graft] def detectDateFormat(values: Seq[String]): Option[String] = {
    val iso = values.filter(_.matches("""\d{4}-\d{2}-\d{2}"""))
    if (iso.nonEmpty) return Some("%Y-%m-%d")
    val slash = values.filter(_.matches("""\d{1,2}/\d{1,2}/\d{4}"""))
    if (slash.nonEmpty) {
      // first component above 12 disambiguates day-first
      val dayFirst = slash.exists(_.split('/')(0).toInt > 12)
      return Some(if (dayFirst) "%d/%m/%Y" else "%m/%d/%Y")
    }
    None
  }

  private[graft] def detectTimestampFormat(values: Seq[String]): Option[String] =
    values.collectFirst {
      case v if v.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+""") => "%Y-%m-%dT%H:%M:%S.%f"
      case v if v.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}""") => "%Y-%m-%dT%H:%M:%S"
      case v if v.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+""") => "%Y-%m-%d %H:%M:%S.%f"
      case v if v.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}""") => "%Y-%m-%d %H:%M:%S"
    }

  /** sniff_csv as a one-row DataFrame in the reference's column shape. */
  def sniffDf(spark: SparkSession, path: String, sampleBytes: Int = 20480): DataFrame = {
    val d = sniff(spark, path, sampleBytes)
    val cols = d.columns.map { case (n, t) => s"'$n': '$t'" }.mkString("{", ", ", "}")
    val args = s"delim='${d.delimiter}', quote='${d.quote}', escape='${d.escape}', " +
      s"new_line='${if (d.newLine == "\r\n") "\\r\\n" else "\\n"}', skip=${d.skipRows}, " +
      s"header=${d.hasHeader}, columns=$cols"
    val rows = Seq(Row(d.delimiter, d.quote, d.escape,
      if (d.newLine == "\r\n") "\\r\\n" else "\\n", d.skipRows.toLong, d.hasHeader,
      cols, d.dateFormat, d.timestampFormat, args))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("delimiter", StringType), StructField("quote", StringType),
        StructField("escape", StringType), StructField("new_line_delimiter", StringType),
        StructField("skip_rows", LongType), StructField("has_header", BooleanType),
        StructField("columns", StringType), StructField("date_format", StringType),
        StructField("timestamp_format", StringType), StructField("user_arguments", StringType))))
  }

  private def splitOutsideQuotes(line: String, delim: String, quote: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == quote) { inQ = !inQ; cur.append(c) }
      else if (!inQ && line.startsWith(delim, i)) { out += cur.toString; cur.clear(); i += delim.length - 1 }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toSeq
  }

  private def parseAs(v: String): String =
    if (v.isEmpty) "VARCHAR"
    else if (v.matches("[+-]?\\d+")) "BIGINT"
    else if (v.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) "DOUBLE"
    else if (v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")) "BOOLEAN"
    else "VARCHAR"

  private def duckName(dt: DataType): String = dt match {
    case IntegerType | LongType => "BIGINT"
    case DoubleType | FloatType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case _ => "VARCHAR"
  }
}
