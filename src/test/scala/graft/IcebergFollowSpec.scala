package graft

import graft.sources.IcebergNative

/** iceberg-follow basics (the end-to-end follow semantics — snapshot,
  * mid-stream commit, exactly-once — run under the x08 oracle gate). */
class IcebergFollowSpec extends SparkSpec {

  test("iceberg-follow: omitting the files option rejects loudly at load()") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("iceberg-follow").load()
    }
    assert(e.getMessage.contains("files"))
  }

  test("iceberg-follow: max_snapshots_per_trigger caps catch-up batches") {
    import spark.implicits._
    val root = tempDir("ice-follow-cap").getPath
    graft.catalog.Sinks.copyTo(Seq((1L, "a")).toDF("id", "v"), root, "iceberg")
    val q = spark.readStream.format("iceberg-follow")
      .option("files", root)
      .option("max_snapshots_per_trigger", "1")
      .load()
      .writeStream.format("memory").queryName("ice_follow_cap")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // snapshot 1
      (2 to 4).foreach { i => // backlog of three appends between triggers
        graft.catalog.Sinks.copyTo(Seq((10L + i, s"x$i")).toDF("id", "v"),
          root, "iceberg")
      }
      q.processAllAvailable()
      assert(spark.table("ice_follow_cap").select("id").as[Long].collect().sorted
        === Array(1L, 12L, 13L, 14L))
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches === 4, // 1 snapshot + 3 capped catch-up batches
        s"expected 4 data batches, saw $dataBatches")
    } finally q.stop()
  }

  test("snapshotLog surfaces the append-only (ts, id) ledger in order") {
    val dir = tempDir("ice-log")
    val md = new java.io.File(dir, "metadata"); md.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(md, "v1.metadata.json").toPath,
      s"""{"format-version": 2, "table-uuid": "log-spec",
         |"location": "${dir.getPath}", "current-schema-id": 0,
         |"schemas": [{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"id","required":true,"type":"long"}]}],
         |"current-snapshot-id": 7,
         |"snapshot-log": [{"timestamp-ms": 1000, "snapshot-id": 3},
         |                 {"timestamp-ms": 2000, "snapshot-id": 7}],
         |"snapshots": [{"snapshot-id": 3, "manifest-list": "metadata/a.avro"},
         |              {"snapshot-id": 7, "manifest-list": "metadata/b.avro"}]}""".stripMargin)
    java.nio.file.Files.writeString(
      new java.io.File(md, "version-hint.text").toPath, "1")
    assert(IcebergNative.snapshotLog(spark, dir.getPath)
      === Seq((1000L, 3L), (2000L, 7L)))
  }
}
