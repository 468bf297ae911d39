package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming over the native Delta log (delta-follow source):
  * snapshot-then-diff semantics, mid-stream commits, offset recovery. */
class DeltaFollowSpec extends SparkSpec {

  private def writePart(root: java.io.File, sub: String, df: DataFrame): Long = {
    val tmp = new java.io.File(root, s"_tmp_$sub")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val p = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(root, sub)
    java.nio.file.Files.move(p.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    dest.length()
  }

  private def addJson(sub: String, size: Long): String =
    s"""{"add":{"path":"$sub","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}"""

  private def commit(root: java.io.File, v: Long, lines: Seq[String]): Unit = {
    val log = new java.io.File(root, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(log, f"$v%020d.json").toPath, lines.mkString("", "\n", "\n"))
  }

  private def metaLines(df: DataFrame): Seq[String] = {
    val schemaJson = df.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    Seq(
      s"""{"commitInfo":{"timestamp":1700000000000}}""",
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"follow-spec","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":0}}""")
  }

  test("delta-follow: full snapshot first, then each commit's add diff") {
    import spark.implicits._
    val root = tempDir("delta-follow")
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val szA = writePart(root, "part-a.parquet", a)
    commit(root, 0L, metaLines(a) :+ addJson("part-a.parquet", szA))
    val szB = writePart(root, "part-b.parquet", Seq((4L, "d")).toDF("id", "v"))
    commit(root, 1L, Seq(addJson("part-b.parquet", szB)))

    val q = Streams.followDelta(spark, root.getPath)
      .writeStream.format("memory").queryName("follow_s1")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // initial batch: snapshot through version 1 — exactly once per row
      assert(spark.table("follow_s1").select("id").as[Long].collect().sorted
        === Array(1L, 2L, 3L, 4L))
      // mid-stream commit: only the new file's rows append
      val szC = writePart(root, "part-c.parquet",
        Seq((5L, "e"), (6L, "f")).toDF("id", "v"))
      commit(root, 2L, Seq(addJson("part-c.parquet", szC)))
      q.processAllAvailable()
      assert(spark.table("follow_s1").select("id").as[Long].collect().sorted
        === Array(1L, 2L, 3L, 4L, 5L, 6L))
      // exactly-once: no row emitted twice across snapshot + diffs
      assert(spark.table("follow_s1").groupBy("id").count()
        .filter(col("count") > 1).isEmpty)
    } finally q.stop()
  }

  test("delta-follow: a rewrite commit re-emits rewritten files only") {
    import spark.implicits._
    val root = tempDir("delta-follow-rw")
    val a = Seq((1L, 10.0), (2L, -5.0)).toDF("id", "bal")
    val szA = writePart(root, "part-a.parquet", a)
    commit(root, 0L, metaLines(a) :+ addJson("part-a.parquet", szA))
    val q = Streams.followDelta(spark, root.getPath)
      .writeStream.format("memory").queryName("follow_s2")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("follow_s2").count() === 2)
      // commit 1 rewrites part-a as part-a2 (the compaction/update shape):
      // the diff re-emits the rewritten file's rows — documented
      // whole-file granularity, never a stale double-read of part-a
      val szA2 = writePart(root, "part-a2.parquet",
        Seq((1L, 10.0)).toDF("id", "bal"))
      commit(root, 1L, Seq(
        """{"remove":{"path":"part-a.parquet","deletionTimestamp":0,"dataChange":true}}""",
        addJson("part-a2.parquet", szA2)))
      q.processAllAvailable()
      val rows = spark.table("follow_s2").select("id").as[Long].collect().sorted
      assert(rows === Array(1L, 1L, 2L)) // snapshot(1,2) + rewrite re-emit(1)
    } finally q.stop()
  }

  test("delta-follow CDF mode: per-commit change batches, cdc overrides add/remove") {
    import spark.implicits._
    val root = tempDir("delta-follow-cdf")
    val metaCdf = {
      val df = Seq((1L, "a")).toDF("id", "v")
      val schemaJson = df.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
      Seq(
        s"""{"commitInfo":{"timestamp":1000}}""",
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        s"""{"metaData":{"id":"follow-cdf","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}""")
    }
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val szA = writePart(root, "part-a.parquet", a)
    commit(root, 0L, metaCdf :+ addJson("part-a.parquet", szA))

    val q = Streams.followDeltaChanges(spark, root.getPath, startingVersion = 0L)
      .writeStream.format("memory").queryName("follow_cdf")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // feed columns present; commit 0 rows arrive as inserts
      val t0 = spark.table("follow_cdf")
      assert(t0.columns.toSeq ===
        Seq("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
      assert(t0.select("_change_type").distinct().as[String].collect().toSeq
        === Seq("insert"))
      assert(t0.count() === 2L)
      // mid-stream cdc commit: ONLY the cdc rows append, not the add/remove
      val szCdc = writePart(root, "cdc-1.parquet",
        Seq((2L, "b", "update_preimage"), (2L, "B", "update_postimage"))
          .toDF("id", "v", "_change_type"))
      val szB = writePart(root, "part-b.parquet", Seq((1L, "a"), (2L, "B")).toDF("id", "v"))
      commit(root, 1L, Seq(
        s"""{"commitInfo":{"timestamp":2000}}""",
        s"""{"cdc":{"path":"cdc-1.parquet","partitionValues":{},"size":$szCdc,"dataChange":false}}""",
        s"""{"remove":{"path":"part-a.parquet","deletionTimestamp":0,"dataChange":true}}""",
        addJson("part-b.parquet", szB)))
      q.processAllAvailable()
      val v1 = spark.table("follow_cdf").filter(col("_commit_version") === 1L)
      assert(v1.select("_change_type").as[String].collect().sorted.toSeq
        === Seq("update_postimage", "update_preimage"))
      assert(spark.table("follow_cdf").count() === 4L)
    } finally q.stop()
  }

  test("delta-follow: max_commits_per_trigger caps batch width on a backlog") {
    import spark.implicits._
    val root = tempDir("delta-follow-cap")
    val a = Seq((1L, "a")).toDF("id", "v")
    commit(root, 0L, metaLines(a) :+ addJson("part-a.parquet",
      writePart(root, "part-a.parquet", a)))
    val q = spark.readStream.format("delta-follow")
      .option("files", root.getPath)
      .option("max_commits_per_trigger", "1")
      .load()
      .writeStream.format("memory").queryName("follow_cap")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // snapshot through v0
      // backlog: three commits land while the stream sits between triggers
      (1 to 3).foreach { i =>
        commit(root, i.toLong, Seq(addJson(s"part-$i.parquet",
          writePart(root, s"part-$i.parquet", Seq((10L + i, s"x$i")).toDF("id", "v")))))
      }
      q.processAllAvailable()
      // completeness: every row arrived exactly once
      assert(spark.table("follow_cap").select("id").as[Long].collect().sorted
        === Array(1L, 11L, 12L, 13L))
      // throttling: the backlog drained in THREE one-commit batches, not one
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches === 4, // 1 snapshot + 3 capped catch-up batches
        s"expected 4 data batches, saw $dataBatches:\n" +
          q.recentProgress.map(p => s"${p.batchId}: ${p.numInputRows}").mkString("\n"))
    } finally q.stop()
    // zero/negative caps reject loudly
    val e = intercept[Exception] {
      spark.readStream.format("delta-follow")
        .option("files", root.getPath)
        .option("max_commits_per_trigger", "0").load()
        .writeStream.format("memory").queryName("follow_cap_bad")
        .outputMode("append").start().processAllAvailable()
    }
    assert(e.getMessage.contains("positive") ||
      Option(e.getCause).exists(_.getMessage.contains("positive")))
  }

  test("delta-follow: omitting the files option rejects loudly at load()") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("delta-follow").load()
    }
    assert(e.getMessage.contains("files"))
  }
  test("delta-follow: a mid-stream DV delete re-emits only the survivors") {
    import spark.implicits._
    val root = tempDir("delta-follow-dv").getPath + "/t"
    graft.catalog.DeltaSink.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), root, Map.empty)
    val q = Streams.followDelta(spark, root)
      .writeStream.format("memory").queryName("follow_dv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("follow_dv").select("id").as[Long].collect().sorted
        === Array(1L, 2L, 3L))
      // mid-stream DELETION-VECTOR delete: the commit re-adds the file
      // with a DV — whole-file granularity re-emits it, but the DV
      // anti-join must ride along, so only survivors appear again
      graft.catalog.DeltaSink.deleteWhereDv(spark, root, "id = 2")
      q.processAllAvailable()
      val counts = spark.table("follow_dv").groupBy("id").count()
        .as[(Long, Long)].collect().toMap
      assert(counts === Map(1L -> 2L, 2L -> 1L, 3L -> 2L), counts)
    } finally q.stop()
  }
}
