package graft

import org.apache.spark.sql.functions._

import graft.catalog.{Catalog, Sinks}
import graft.sources.Warc

/** Native WARC writer → native WARC reader round-trips: record grammar,
  * HTTP sub-parse, type filtering, streaming skip, and the loud-reject
  * paths (truncation, gzip, oversize payloads). */
class WarcSpec extends SparkSpec {

  import spark.implicits._

  private def sampleDf = Seq(
    ("http://a.org/1", "text/plain", "hello world"),
    ("http://a.org/2", "text/html", "<b>two</b>"),
    ("http://b.org/3", "text/plain", "third doc")).toDF("target_uri", "ct", "text")
    .select(col("target_uri"),
      lit("2017-03-06T04:03:53Z").cast("timestamp").as("warc_date"),
      col("ct").as("content_type"), col("text").cast("binary").as("body"))

  test("write → read round-trip: http parse, offsets, warcinfo record") {
    val root = tempDir("warc_rt").getPath + "/archive"
    Sinks.copyTo(sampleDf.coalesce(1), root, "warc")
    val back = Catalog.attach(spark, "warc_rt", "warc", Map("files" -> root))
    // warcinfo + 3 responses
    assert(back.count() === 4L)
    assert(back.filter(col("warc_type") === "warcinfo").count() === 1L)
    val resp = back.filter(col("warc_type") === "response")
      .orderBy("target_uri")
      .select("target_uri", "http_status", "http_content_type", "http_body")
      .collect()
    assert(resp.map(_.getString(0)).toSeq
      === Seq("http://a.org/1", "http://a.org/2", "http://b.org/3"))
    assert(resp.forall(_.getInt(1) === 200))
    assert(resp.map(_.getString(2)).toSeq
      === Seq("text/plain", "text/html", "text/plain"))
    assert(resp.map(r => new String(r.getAs[Array[Byte]](3), "UTF-8")).toSeq
      === Seq("hello world", "<b>two</b>", "third doc"))
    // offsets are exact byte positions: re-reading each record's version
    // line at its recorded offset must find "WARC/"
    val f = new java.io.File(root).listFiles().find(_.getName.endsWith(".warc")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    back.select("warc_offset").as[Long].collect().foreach { off =>
      assert(new String(bytes, off.toInt, 5, "UTF-8") === "WARC/")
    }
    // dates round-trip through the ISO form
    assert(back.filter(col("warc_type") === "response")
      .select(col("warc_date").cast("string")).distinct().as[String].head()
      === "2017-03-06 04:03:53")
  }

  test("record_type filter skips without buffering; payload intact") {
    val root = tempDir("warc_filter").getPath + "/archive"
    Sinks.copyTo(sampleDf.coalesce(1), root, "warc")
    val resp = Catalog.attach(spark, "warc_filter", "warc",
      Map("files" -> root, "record_type" -> "response"))
    assert(resp.count() === 3L)
    assert(resp.select("warc_type").distinct().as[String].head() === "response")
    // raw payload = full HTTP message (headers + body)
    val raw = resp.filter(col("target_uri") === "http://a.org/1")
      .select("payload").as[Array[Byte]].head()
    val s = new String(raw, "UTF-8")
    assert(s.startsWith("HTTP/1.1 200 OK\r\n") && s.endsWith("hello world"))
  }

  test("truncated files, oversize payloads, gzip, bad columns reject loudly") {
    val root = tempDir("warc_rej").getPath + "/archive"
    Sinks.copyTo(sampleDf.coalesce(1), root, "warc")
    val f = new java.io.File(root).listFiles().find(_.getName.endsWith(".warc")).get
    // truncate mid-payload
    val cut = new java.io.File(tempDir("warc_rej2"), "cut.warc")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(cut.toPath, bytes.take(bytes.length - 30))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, Seq(cut.getPath), Map.empty).count()
    }
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("terminator"))
    // a declared length over the guard rejects before allocating
    val e2 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, Seq(f.getPath), Map("max_payload_bytes" -> "10")).count()
    }
    assert(e2.getMessage.contains("max_payload_bytes"))
    // gz rejects at attach
    intercept[Warc.WarcException] {
      Warc.read(spark, Seq("/tmp/x.warc.gz"), Map.empty)
    }
    // writer contract: missing body column
    intercept[Warc.WarcException] {
      Warc.write(Seq(("u", "t")).toDF("target_uri", "content_type"),
        tempDir("warc_rej3").getPath + "/x", Map.empty)
    }
    // unknown attach option lists the valid ones
    val e3 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "warc_bad", "warc",
        Map("files" -> root, "nope" -> "1"))
    }
    assert(e3.getMessage.contains("record_type"))
  }

  test("many partitions → many archive files, all read back in one attach") {
    val root = tempDir("warc_parts").getPath + "/archive"
    val docs = (1 to 50).map(i => (s"http://h.org/$i", s"doc $i"))
      .toDF("target_uri", "text")
      .select(col("target_uri"),
        lit("2020-01-01T00:00:00Z").cast("timestamp").as("warc_date"),
        lit("text/plain").as("content_type"), col("text").cast("binary").as("body"))
    Sinks.copyTo(docs.repartition(4), root, "warc")
    assert(new java.io.File(root).listFiles().count(_.getName.endsWith(".warc")) === 4)
    val back = Catalog.attach(spark, "warc_parts", "warc",
      Map("files" -> root, "record_type" -> "response"))
    assert(back.count() === 50L)
    assert(back.select("target_uri").distinct().count() === 50L)
  }
}
