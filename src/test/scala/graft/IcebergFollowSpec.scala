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
