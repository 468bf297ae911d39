package graft.sources

import java.io.{BufferedInputStream, InputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native WARC (Web ARChive, ISO 28500) source + sink — the container
  * format web crawls ship in (Common Crawl segments are WARC), i.e. the
  * byte-zero input of a real web-scale training pipeline. Beyond the
  * reference surface (it reads no archive formats); built from the public
  * WARC 1.0/1.1 specification: records are `WARC/1.x` + CRLF header block
  * + `Content-Length` payload + CRLF CRLF. `response` records carrying
  * `application/http` get their HTTP message parsed too (status,
  * Content-Type, body after the header block).
  *
  * Scale shape: files are the parallelism unit (one task per WARC file —
  * crawl segments ship as many ~1 GiB files), each parsed STREAMING in
  * executors with memory bounded by one record; records skipped by the
  * `record_type` filter are skip()ed, never buffered. `max_payload_bytes`
  * guards a hostile length declaration — oversize rejects loudly rather
  * than OOMing a task. Per-record-gzip `.warc.gz` members reject loudly —
  * transparent member-stitching is a connector-grade feature; store
  * uncompressed or unpack first.
  */
object Warc {

  final case class WarcException(msg: String) extends IllegalArgumentException(msg)

  val validReadOptions: Set[String] = Set("files", "record_type", "max_payload_bytes")
  val validWriteOptions: Set[String] = Set("overwrite")

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", TimestampType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType),
    StructField("http_body", BinaryType),
    StructField("warc_file", StringType),
    StructField("warc_offset", LongType)))

  // ----------------------------------------------------------- reader
  def read(spark: SparkSession, paths: Seq[String],
      options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw WarcException("warc attach needs at least one path")
    paths.find(_.toLowerCase.endsWith(".gz")).foreach { f =>
      throw WarcException(s"`$f`: gzipped WARC members are not supported by " +
        "this native reader — store uncompressed (or unpack first)")
    }
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[String] = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      if (p.exists("*?[{".contains(_))) {
        val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw WarcException(s"glob `$p` matches no warc files")
        matched.map(_.getPath.toString)
      } else if (fs.getFileStatus(hp).isDirectory) {
        val kids = fs.listStatus(hp).toSeq.filter(_.isFile)
          .map(_.getPath).filter(_.getName.toLowerCase.endsWith(".warc"))
        if (kids.isEmpty) throw WarcException(s"`$p`: directory holds no .warc files")
        kids.map(_.toString)
      } else Seq(p)
    }
    files.find(_.toLowerCase.endsWith(".gz")).foreach { f =>
      throw WarcException(s"`$f`: gzipped WARC members are not supported by " +
        "this native reader — store uncompressed (or unpack first)")
    }
    val typeFilter = options.get("record_type").map(_.toLowerCase)
    val maxPayload = options.get("max_payload_bytes").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
    if (maxPayload > Int.MaxValue) throw WarcException(
      s"max_payload_bytes=$maxPayload exceeds a single array's 2 GiB bound")
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        parseFile(c, f, typeFilter, maxPayload)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Byte-position-tracking wrapper so `warc_offset` is exact. */
  private final class CountingInputStream(in: InputStream) extends InputStream {
    var count: Long = 0L
    override def read(): Int = {
      val b = in.read(); if (b >= 0) count += 1; b
    }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(buf, off, len); if (r > 0) count += r; r
    }
    override def skip(n: Long): Long = {
      val s = in.skip(n); if (s > 0) count += s; s
    }
    override def close(): Unit = in.close()
  }

  /** One CRLF-terminated header line; null at EOF. Tolerates bare LF. */
  private def readLine(in: InputStream): String = {
    var b = in.read()
    if (b < 0) return null
    val sb = new StringBuilder
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
    val s = sb.toString
    if (s.endsWith("\r")) s.dropRight(1) else s
  }

  private def readFully(in: InputStream, n: Int, where: String): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw WarcException(s"$where: truncated record payload " +
        s"(wanted $n bytes, got $off)")
      off += r
    }
    buf
  }

  private def parseFile(conf: Configuration, file: String,
      typeFilter: Option[String], maxPayload: Long): Iterator[Row] = {
    val p = new Path(file)
    val in = new CountingInputStream(
      new BufferedInputStream(p.getFileSystem(conf).open(p), 1 << 16))
    val out = Seq.newBuilder[Row]
    try {
      var recOffset = 0L
      var l = readLine(in)
      while (l != null) {
        if (l.isEmpty) { recOffset = in.count; l = readLine(in) }
        else {
          if (!l.startsWith("WARC/")) throw WarcException(
            s"`$file`: expected a WARC/1.x version line at record start, " +
              s"got `${l.take(40)}`")
          val headers = scala.collection.mutable.LinkedHashMap[String, String]()
          var h = readLine(in)
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i <= 0) throw WarcException(
              s"`$file`: malformed WARC header `${h.take(60)}`")
            headers(h.take(i).trim.toLowerCase) = h.drop(i + 1).trim
            h = readLine(in)
          }
          if (h == null) throw WarcException(
            s"`$file`: EOF inside a WARC header block")
          val len = headers.getOrElse("content-length", throw WarcException(
            s"`$file`: record without Content-Length")).toLong
          if (len > maxPayload) throw WarcException(
            s"`$file`: record payload $len bytes exceeds max_payload_bytes=$maxPayload")
          val warcType = headers.getOrElse("warc-type", "")
          val keep = typeFilter.forall(_ == warcType.toLowerCase)
          val payload =
            if (keep) readFully(in, len.toInt, s"`$file`")
            else { // filtered records are skipped, never buffered
              var left = len
              while (left > 0) {
                val skipped = in.skip(left)
                if (skipped <= 0) throw WarcException(s"`$file`: truncated record payload")
                left -= skipped
              }
              null
            }
          if (keep) {
            val contentType = headers.getOrElse("content-type", null)
            val isHttp = contentType != null &&
              contentType.toLowerCase.startsWith("application/http")
            var httpStatus: Integer = null
            var httpCt: String = null
            var body: Array[Byte] = null
            if (isHttp) {
              val sep = indexOfCrlfCrlf(payload)
              if (sep >= 0) {
                val head = new String(payload, 0, sep, "ISO-8859-1")
                val statusRe = """HTTP/\d\.\d (\d{3}).*""".r
                val lines = head.linesIterator.toSeq
                lines.headOption.foreach {
                  case statusRe(code) => httpStatus = code.toInt
                  case _ => ()
                }
                httpCt = lines.drop(1).map(_.trim)
                  .find(_.toLowerCase.startsWith("content-type:"))
                  .map(_.drop("content-type:".length).trim).orNull
                body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
              }
            }
            val ts = headers.get("warc-date")
              .map(d => java.sql.Timestamp.from(java.time.Instant.parse(d))).orNull
            out += Row(
              warcType,
              headers.getOrElse("warc-record-id", null),
              headers.getOrElse("warc-target-uri", null),
              ts, contentType, len, httpStatus, httpCt, payload, body,
              file, recOffset)
          }
          // record terminator: two CRLF
          val t1 = readLine(in)
          val t2 = if (t1 != null && t1.isEmpty) readLine(in) else t1
          if (t1 == null || t1.nonEmpty || t2 == null || t2.nonEmpty)
            throw WarcException(
              s"`$file`: record not followed by the CRLF CRLF terminator")
          recOffset = in.count
          l = readLine(in)
        }
      }
    } finally in.close()
    out.result().iterator
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ----------------------------------------------------------- writer
  /** `COPY ... TO (FORMAT warc)`: each row becomes one `response` record
    * whose payload is an HTTP/1.1 200 message carrying `body`. Frame
    * contract (loud reject otherwise): `target_uri` string, `warc_date`
    * timestamp, `content_type` string, `body` binary-or-string. One
    * `.warc` file per partition (executor-side, distributed), each led by
    * a `warcinfo` record; record ids derive from md5(uri, date) so output
    * is rerun-deterministic. */
  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    options.keys.find(k => !validWriteOptions.contains(k.toLowerCase)).foreach { k =>
      throw WarcException(s"invalid COPY option `$k` for format `warc`; " +
        s"valid options: ${validWriteOptions.toSeq.sorted.mkString(", ")}")
    }
    val need = Seq("target_uri", "warc_date", "content_type", "body")
    need.find(c => !df.schema.fieldNames.contains(c)).foreach { c =>
      throw WarcException(s"FORMAT warc needs column `$c` " +
        s"(contract: ${need.mkString(", ")})")
    }
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val outPath = new Path(path)
    val fs = outPath.getFileSystem(conf)
    if (fs.exists(outPath)) {
      if (options.get("overwrite").exists(_.toBoolean)) fs.delete(outPath, true)
      else throw WarcException(s"`$path` exists; pass overwrite=true to replace")
    }
    fs.mkdirs(outPath)
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val outStr = fs.makeQualified(outPath).toString
    import org.apache.spark.sql.functions.col
    df.select(col("target_uri").cast("string"), col("warc_date").cast("timestamp"),
      col("content_type").cast("string"), col("body").cast("binary"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val c = new Configuration(false)
          confBc.value.foreach { case (k, v) => c.set(k, v) }
          val f = new Path(outStr, f"part-$i%05d.warc")
          val os = f.getFileSystem(c).create(f, false)
          def rec(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
            val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
              .mkString("", "\r\n", "\r\n\r\n")
            os.write(head.getBytes("UTF-8")); os.write(payload)
            os.write("\r\n\r\n".getBytes("UTF-8"))
          }
          try {
            val info = "software: graft\r\n".getBytes("UTF-8")
            rec(Seq(
              "WARC-Type" -> "warcinfo",
              "WARC-Record-ID" -> s"<urn:graft:warcinfo:$i>",
              "WARC-Date" -> "2000-01-01T00:00:00Z",
              "Content-Type" -> "application/warc-fields",
              "Content-Length" -> info.length.toString), info)
            it.foreach { r =>
              val uri = r.getString(0)
              val date = java.time.Instant.ofEpochMilli(r.getTimestamp(1).getTime).toString
              val ct = r.getString(2)
              val body = r.getAs[Array[Byte]](3)
              val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++ body
              val rid = org.apache.commons.codec.digest.DigestUtils.md5Hex(
                uri + "|" + date)
              rec(Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:$rid>",
                "WARC-Date" -> date,
                "WARC-Target-URI" -> uri,
                "Content-Type" -> "application/http; msgtype=response",
                "Content-Length" -> http.length.toString), http)
            }
          } finally os.close()
          Iterator.single(1)
        }
      }.count()
    ()
  }
}
