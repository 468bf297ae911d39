package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.sources.DeltaNative

/** Native Delta CHANGE DATA FEED reader against hand-built logs (delta.io
  * PROTOCOL.md "Add CDC File") — cdc-carried changes, synthesized
  * whole-file insert/delete, version stamping, and every loud-reject path.
  * Logs are written by the spec itself, so the reader is tested against
  * the FORMAT, not against any writer. */
class DeltaChangesSpec extends SparkSpec {

  private def metaAction(schemaJson: String, conf: Map[String, String]): String = {
    val cf = conf.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"metaData":{"id":"cdf-table","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")}",""" +
      s""""partitionColumns":[],"configuration":{$cf},"createdTime":0}}"""
  }
  private val protocolV1 = """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}"""
  private val cdfConf = Map("delta.enableChangeDataFeed" -> "true")

  private def commit(dir: File, version: Long, ts: Long, lines: Seq[String]): Unit = {
    val log = new File(dir, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.writeString(
      new File(log, f"$version%020d.json").toPath,
      (s"""{"commitInfo":{"timestamp":$ts}}""" +: lines).mkString("\n") + "\n")
  }

  private val partSizes = scala.collection.mutable.Map[String, Long]()
  private def writePart(root: File, sub: String, df: org.apache.spark.sql.DataFrame): String = {
    val tmp = new File(root, s"_tmp_${sub.replace('/', '_')}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(root, sub)
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    partSizes(sub) = dest.length()
    sub
  }
  private def add(path: String, dataChange: Boolean = true): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":${partSizes(path)},"modificationTime":0,"dataChange":$dataChange}}"""
  private def remove(path: String, dataChange: Boolean = true): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":$dataChange}}"""
  private def cdcAct(path: String): String =
    s"""{"cdc":{"path":"$path","partitionValues":{},"size":${partSizes(path)},"dataChange":false}}"""

  private def df2(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  /** Standard three-commit CDF table: c0 inserts a+b, c1 cdc-updates b
    * (preimage/postimage) with a remove/add pair that must contribute no
    * rows, c2 whole-file-deletes a. */
  private def buildStandard(root: File): Unit = {
    val a = writePart(root, "a.parquet", df2(1 -> "x", 2 -> "y"))
    val b = writePart(root, "b.parquet", df2(3 -> "z"))
    val b2 = writePart(root, "b2.parquet", df2(3 -> "zz"))
    val cdc = writePart(root, "_change_data/c1.parquet",
      df2(3 -> "z").withColumn("_change_type", lit("update_preimage"))
        .unionByName(df2(3 -> "zz").withColumn("_change_type", lit("update_postimage"))))
    val schema = df2().schema.json
    commit(root, 0, 1000L, Seq(protocolV1, metaAction(schema, cdfConf), add(a), add(b)))
    commit(root, 1, 2000L, Seq(cdcAct(cdc), remove(b), add(b2)))
    commit(root, 2, 3000L, Seq(remove(a)))
  }

  test("full feed: cdc rows + synthesized inserts/deletes, stamped per commit") {
    val root = tempDir("cdf_full")
    buildStandard(root)
    val feed = DeltaNative.read(spark, root.getPath,
      Map("read_change_feed" -> "true", "starting_version" -> "0"))
    assert(feed.columns.toSeq ===
      Seq("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    val rows = feed.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getTimestamp(4).getTime)).toSet
    assert(rows === Set(
      (1, "x", "insert", 0L, 1000L),
      (2, "y", "insert", 0L, 1000L),
      (3, "z", "insert", 0L, 1000L),
      (3, "z", "update_preimage", 1L, 2000L),
      (3, "zz", "update_postimage", 1L, 2000L),
      (1, "x", "delete", 2L, 3000L),
      (2, "y", "delete", 2L, 3000L)))
  }

  test("version range bounds the feed; _commit_version prunes at plan time") {
    val root = tempDir("cdf_range")
    buildStandard(root)
    val mid = DeltaNative.read(spark, root.getPath,
      Map("read_change_feed" -> "true",
        "starting_version" -> "1", "ending_version" -> "1"))
    assert(mid.select("_change_type").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("update_postimage", "update_preimage"))
    // _commit_version is a LogFileIndex partition column: filtering on it
    // must prune the scan to that commit's files before any task runs
    val full = DeltaNative.read(spark, root.getPath,
      Map("read_change_feed" -> "true", "starting_version" -> "0"))
    val pruned = full.filter(col("_commit_version") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [(_commit_version"))
    assert(pruned.count() === 2L)
  }

  test("dataChange=false actions (compaction) contribute no feed rows") {
    val root = tempDir("cdf_compact")
    val a = writePart(root, "a.parquet", df2(1 -> "x"))
    val comp = writePart(root, "compacted.parquet", df2(1 -> "x"))
    val schema = df2().schema.json
    commit(root, 0, 1000L, Seq(protocolV1, metaAction(schema, cdfConf), add(a)))
    commit(root, 1, 2000L, Seq(remove(a, dataChange = false), add(comp, dataChange = false)))
    val feed = DeltaNative.read(spark, root.getPath,
      Map("read_change_feed" -> "true", "starting_version" -> "0"))
    assert(feed.select("_change_type").collect().map(_.getString(0)).toSeq === Seq("insert"))
  }

  test("feed over a range where CDF is not enabled rejects loudly") {
    val root = tempDir("cdf_disabled")
    val a = writePart(root, "a.parquet", df2(1 -> "x"))
    commit(root, 0, 1000L, Seq(protocolV1, metaAction(df2().schema.json, Map.empty), add(a)))
    val e = intercept[DeltaNative.DeltaReadException] {
      DeltaNative.read(spark, root.getPath,
        Map("read_change_feed" -> "true", "starting_version" -> "0"))
    }
    assert(e.getMessage.contains("enableChangeDataFeed"))
  }

  test("deletion-vector change without a cdc action rejects loudly") {
    val root = tempDir("cdf_dv")
    val a = writePart(root, "a.parquet", df2(1 -> "x", 2 -> "y"))
    val dv = """{"storageType":"i","pathOrInlineDv":"ignored","sizeInBytes":4,"cardinality":1}"""
    commit(root, 0, 1000L, Seq(protocolV1, metaAction(df2().schema.json, cdfConf), add(a)))
    commit(root, 1, 2000L, Seq(
      remove(a),
      s"""{"add":{"path":"$a","partitionValues":{},"size":${partSizes(a)},"modificationTime":0,"dataChange":true,"deletionVector":$dv}}"""))
    val e = intercept[DeltaNative.DeltaReadException] {
      DeltaNative.read(spark, root.getPath,
        Map("read_change_feed" -> "true", "starting_version" -> "0"))
    }
    assert(e.getMessage.contains("deletion vector"))
  }

  test("option validation: bad ranges and snapshot-option mixes reject") {
    val root = tempDir("cdf_opts")
    val a = writePart(root, "a.parquet", df2(1 -> "x"))
    commit(root, 0, 1000L, Seq(protocolV1, metaAction(df2().schema.json, cdfConf), add(a)))
    def feed(extra: (String, String)*) =
      DeltaNative.read(spark, root.getPath,
        Map("read_change_feed" -> "true") ++ extra)
    intercept[DeltaNative.DeltaReadException] { feed() } // no starting_version
    intercept[DeltaNative.DeltaReadException] { feed("starting_version" -> "5") }
    intercept[DeltaNative.DeltaReadException] {
      feed("starting_version" -> "1", "ending_version" -> "0")
    }
    intercept[DeltaNative.DeltaReadException] {
      feed("starting_version" -> "0", "version_as_of" -> "0")
    }
    intercept[DeltaNative.DeltaReadException] {
      DeltaNative.read(spark, root.getPath, Map("starting_version" -> "0"))
    }
  }

  test("attach through the catalog: read_change_feed option routes to the feed") {
    val root = tempDir("cdf_attach")
    buildStandard(root)
    val feed = Catalog.attach(spark, "cdf_attach_t", "delta",
      Map("files" -> root.getPath, "read_change_feed" -> "true",
        "starting_version" -> "2"))
    assert(feed.select("_change_type").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("delete"))
  }

  test("delta_history introspection: one row per commit, action counts + SQL path") {
    val root = tempDir("cdf_history")
    buildStandard(root)
    val h = DeltaNative.history(spark, root.getPath).orderBy("version").collect()
    assert(h.length === 3)
    assert(h(0).getLong(0) === 0L && h(0).getTimestamp(1).getTime === 1000L &&
      h(0).getLong(4) === 2L && h(0).getLong(5) === 0L && h(0).getLong(6) === 0L)
    assert(h(1).getLong(0) === 1L && h(1).getLong(4) === 1L &&
      h(1).getLong(5) === 1L && h(1).getLong(6) === 1L)
    assert(h(2).getLong(0) === 2L && h(2).getLong(5) === 1L)
    // SQL-callable through executePg's table-function swap
    val viaSql = graft.sqlapi.SqlApi.executePg(spark,
      s"SELECT version FROM delta_history('${root.getPath}') WHERE num_cdc_files > 0")
      .collect()
    assert(viaSql.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("column mapping mode=name: feed renames physical columns back") {
    val root = tempDir("cdf_mapping")
    import org.apache.spark.sql.types._
    val physical = df2(1 -> "x").toDF("col_1", "col_2")
    val a = writePart(root, "a.parquet", physical)
    val logical = new StructType()
      .add("id", IntegerType, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col_1")
          .putLong("delta.columnMapping.id", 1).build())
      .add("v", StringType, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col_2")
          .putLong("delta.columnMapping.id", 2).build())
    commit(root, 0, 1000L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaAction(logical.json,
        cdfConf + ("delta.columnMapping.mode" -> "name")),
      add(a)))
    val feed = DeltaNative.read(spark, root.getPath,
      Map("read_change_feed" -> "true", "starting_version" -> "0"))
    assert(feed.columns.toSeq ===
      Seq("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    val r = feed.collect().head
    assert(r.getInt(0) === 1 && r.getString(1) === "x" && r.getString(2) === "insert")
  }
}
