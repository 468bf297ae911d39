package graft

import java.io.File
import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.sources.HfFileSystem

/** HTTP(S) object-store reads — the reference README's "HTTP server" row —
  * against a LOCAL JDK HttpServer (no egress needed): ranged parquet
  * footer reads, sequential csv streams, a deliberately range-less server
  * (the fallback path), read-only enforcement, and the hf:// URL rewrite
  * as a pure function. */
class HttpFsSpec extends SparkSpec {

  /** Serve a directory over HTTP; `ranges=false` ignores Range headers
    * (some servers do) to exercise the discard fallback. */
  private def serve(dir: File, ranges: Boolean): (HttpServer, Int) = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val f = new File(dir, x.getRequestURI.getPath.stripPrefix("/"))
        if (!f.isFile) { x.sendResponseHeaders(404, -1); x.close(); return }
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val range = Option(x.getRequestHeaders.getFirst("Range")).filter(_ => ranges)
        x.getResponseHeaders.set("Accept-Ranges", if (ranges) "bytes" else "none")
        range match {
          case Some(r) =>
            val m = """bytes=(\d+)-(\d*)""".r.findFirstMatchIn(r).get
            val from = m.group(1).toLong.toInt
            val to = Option(m.group(2)).filter(_.nonEmpty)
              .map(_.toLong.toInt).getOrElse(bytes.length - 1)
            val slice = bytes.slice(from, to + 1)
            x.getResponseHeaders.set("Content-Range",
              s"bytes $from-$to/${bytes.length}")
            if (x.getRequestMethod == "HEAD") x.sendResponseHeaders(206, -1)
            else { x.sendResponseHeaders(206, slice.length)
              x.getResponseBody.write(slice) }
          case None =>
            if (x.getRequestMethod == "HEAD") {
              x.getResponseHeaders.set("Content-Length", bytes.length.toString)
              x.sendResponseHeaders(200, -1)
            } else { x.sendResponseHeaders(200, bytes.length)
              x.getResponseBody.write(bytes) }
        }
        x.close()
      }
    })
    s.start()
    (s, s.getAddress.getPort)
  }

  private def fixtures(dir: File): Unit = {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")
    df.coalesce(1).write.parquet(new File(dir, "pq").getPath)
    val pq = new File(dir, "pq").listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(pq.toPath, new File(dir, "data.parquet").toPath)
    df.coalesce(1).write.option("header", "true").csv(new File(dir, "csvd").getPath)
    val cv = new File(dir, "csvd").listFiles().find(_.getName.endsWith(".csv")).get
    java.nio.file.Files.copy(cv.toPath, new File(dir, "data.csv").toPath)
  }

  test("http: ranged parquet scan with pushdown through Catalog.attach") {
    val dir = tempDir("httpfs"); fixtures(dir)
    val (s, port) = serve(dir, ranges = true)
    try {
      val df = Catalog.attach(spark, "http_pq", "parquet",
        Map("files" -> s"http://127.0.0.1:$port/data.parquet"))
      assert(df.count() === 200)
      // filter + projection push down to the ranged scan like any parquet
      val got = df.filter(col("id") <= 3).select("id", "name")
        .orderBy("id").collect()
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "name_1"), (2L, "name_2"), (3L, "name_3")))
    } finally s.stop(0)
  }

  test("http: csv scan streams sequentially; 404 is FileNotFound") {
    val dir = tempDir("httpfs"); fixtures(dir)
    val (s, port) = serve(dir, ranges = true)
    try {
      val df = Catalog.attach(spark, "http_csv", "csv",
        Map("files" -> s"http://127.0.0.1:$port/data.csv", "header" -> "true"))
      assert(df.count() === 200)
      val missing = intercept[Exception] {
        spark.read.parquet(s"http://127.0.0.1:$port/nope.parquet").count()
      }
      assert(missing.getMessage.toLowerCase.contains("path does not exist") ||
        missing.getMessage.contains("404") ||
        missing.getCause != null)
    } finally s.stop(0)
  }

  test("http: a range-less server still reads correctly (discard fallback)") {
    val dir = tempDir("httpfs"); fixtures(dir)
    val (s, port) = serve(dir, ranges = false)
    try {
      val df = spark.read.parquet(s"http://127.0.0.1:$port/data.parquet")
      assert(df.count() === 200)
      assert(df.agg(sum("id")).head().getLong(0) === 200L * 201 / 2)
    } finally s.stop(0)
  }

  test("http: csv through a range-less server uses the discard-forward fallback") {
    val dir = tempDir("httpfs"); fixtures(dir)
    val (s, port) = serve(dir, ranges = false)
    try {
      val df = spark.read.option("header", "true")
        .csv(s"http://127.0.0.1:$port/data.csv")
      assert(df.count() === 200)
      assert(df.select(sum(col("id").cast("long"))).head().getLong(0)
        === 200L * 201 / 2)
    } finally s.stop(0)
  }

  test("hf:// end-to-end: endpoint override routes csv+jsonl through the rewrite") {
    val dir = tempDir("hfstore")
    val leaf = new File(dir, "datasets/acme/corpus/resolve/main")
    leaf.mkdirs()
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"t$i")).toDF("id", "tag")
    df.coalesce(1).write.option("header", "true").csv(new File(dir, "c").getPath)
    java.nio.file.Files.copy(
      new File(dir, "c").listFiles().find(_.getName.endsWith(".csv")).get.toPath,
      new File(leaf, "data.csv").toPath)
    df.coalesce(1).write.json(new File(dir, "j").getPath)
    java.nio.file.Files.copy(
      new File(dir, "j").listFiles().find(_.getName.endsWith(".json")).get.toPath,
      new File(leaf, "data.jsonl").toPath)
    val (s, port) = serve(dir, ranges = true)
    val prev = sys.props.get("graft.hf.endpoint")
    try {
      System.setProperty("graft.hf.endpoint", s"http://127.0.0.1:$port")
      val csv = Catalog.attach(spark, "hf_e2e_csv", "csv",
        Map("files" -> "hf://datasets/acme/corpus/data.csv", "header" -> "true"))
      assert(csv.count() === 50)
      val jsonl = Catalog.attach(spark, "hf_e2e_jsonl", "json",
        Map("files" -> "hf://datasets/acme/corpus@main/data.jsonl"))
      assert(jsonl.select(sum(col("id"))).head().getLong(0) === 50L * 51 / 2)
    } finally {
      s.stop(0)
      prev match {
        case Some(v) => System.setProperty("graft.hf.endpoint", v)
        case None => System.clearProperty("graft.hf.endpoint")
      }
    }
  }

  test("http: the filesystem is read-only; writes reject loudly") {
    val dir = tempDir("httpfs"); fixtures(dir)
    val (s, port) = serve(dir, ranges = true)
    try {
      val p = new org.apache.hadoop.fs.Path(s"http://127.0.0.1:$port/out")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val e = intercept[java.io.IOException] { fs.create(p) }
      assert(e.getMessage.contains("read-only"))
      val e2 = intercept[java.io.IOException] { fs.delete(p, false) }
      assert(e2.getMessage.contains("read-only"))
    } finally s.stop(0)
  }

  test("hf:// dataset URLs rewrite to the hub's resolve endpoint (pure)") {
    assert(HfFileSystem.resolve("hf://datasets/acme/corpus/train/part-0.parquet") ===
      "https://huggingface.co/datasets/acme/corpus/resolve/main/train/part-0.parquet")
    assert(HfFileSystem.resolve("hf://datasets/acme/corpus@v2.1/data.csv") ===
      "https://huggingface.co/datasets/acme/corpus/resolve/v2.1/data.csv")
    val bad = intercept[IllegalArgumentException] {
      HfFileSystem.resolve("hf://models/acme/llm/weights.bin")
    }
    assert(bad.getMessage.contains("hf://datasets/"))
  }
}
