package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.sources.DeltaNative

/** Planning-time file skipping from the Delta log (LogFileIndex): per-file
  * `add.stats` must prune data files BEFORE any task runs, log-served
  * partition values must partition-prune non-hive layouts, and the log's
  * byte sizes must drive the relation's stats. Counts are read from the
  * scan's own `numFiles` metric — the number of files the executed plan
  * actually touched. */
class DeltaSkippingSpec extends SparkSpec {

  private def commit(dir: File, version: Long, lines: Seq[String]): Unit = {
    val log = new File(dir, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.writeString(
      new File(log, f"$version%020d.json").toPath, lines.mkString("\n") + "\n")
  }

  private val sizes = scala.collection.mutable.Map[String, Long]()
  private def writePart(root: File, sub: String, df: DataFrame): String = {
    val tmp = new File(root, s"_tmp_$sub")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(root, sub)
    java.nio.file.Files.move(part.toPath, dest.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    sizes(sub) = dest.length()
    sub
  }

  private def meta(schemaJson: String, partCols: Seq[String] = Nil): String = {
    val pc = partCols.map(c => s""""$c"""").mkString(",")
    s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")}",""" +
      s""""partitionColumns":[$pc],"configuration":{},"createdTime":0}}"""
  }
  private val protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def add(path: String, stats: String = null,
      pv: Map[String, String] = Map.empty): String = {
    val pvs = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val st = Option(stats).fold("")(s =>
      s""","stats":"${s.replace("\\", "\\\\").replace("\"", "\\\"")}"""")
    s"""{"add":{"path":"$path","partitionValues":{$pvs},"size":${sizes(path)},""" +
      s""""modificationTime":0,"dataChange":true$st}}"""
  }

  private def findScan(plan: SparkPlan): Option[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case f: FileSourceScanExec => Some(f)
    case other =>
      other.children.iterator.map(findScan).collectFirst { case Some(s) => s }
  }

  /** Run the frame and return (rows, numFiles-the-scan-read). */
  private def filesRead(df: DataFrame): (Seq[org.apache.spark.sql.Row], Long) = {
    val rows = df.collect().toSeq
    val scan = findScan(df.queryExecution.executedPlan).getOrElse(
      fail("no FileSourceScanExec in the executed plan"))
    (rows, scan.metrics("numFiles").value)
  }

  /** Three files with disjoint id ranges and per-file stats. */
  private def statsTable(): File = {
    val root = tempDir("delta_skip")
    import spark.implicits._
    // nullable columns — a non-nullable schema lets the optimizer fold
    // `IS NULL` to an empty relation before the index is ever consulted
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))).json
    val f1 = writePart(root, "part-a.parquet",
      (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    val f2 = writePart(root, "part-b.parquet",
      (11L to 20L).map(i => (i, s"b$i")).toDF("id", "v"))
    val f3 = writePart(root, "part-c.parquet",
      (21L to 30L).map(i => (i, s"c$i")).toDF("id", "v"))
    def st(lo: Long, hi: Long, loV: String, hiV: String) =
      s"""{"numRecords":10,"minValues":{"id":$lo,"v":"$loV"},""" +
        s""""maxValues":{"id":$hi,"v":"$hiV"},"nullCount":{"id":0,"v":0}}"""
    commit(root, 0, Seq(protocol, meta(schema),
      add(f1, st(1, 10, "a1", "a9")),
      add(f2, st(11, 20, "b11", "b20")),
      add(f3, st(21, 30, "c21", "c30"))))
    root
  }

  test("numeric range predicates skip files whose stats exclude them") {
    val root = statsTable()
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("id") > 25))
    assert(rows.map(_.getLong(0)).sorted == (26L to 30L))
    assert(n == 1, "only the [21,30] file may be opened")
    val (rows2, n2) = filesRead(df.filter(col("id") === 15))
    assert(rows2.map(_.getLong(0)) == Seq(15L))
    assert(n2 == 1)
    val (rows3, n3) = filesRead(df.filter(col("id") < 5 || col("id") >= 28))
    assert(rows3.map(_.getLong(0)).sorted == ((1L to 4L) ++ (28L to 30L)))
    assert(n3 == 2, "OR keeps the union of admissible files")
    val (rows4, n4) = filesRead(df.filter(col("id") > 100))
    assert(rows4.isEmpty && n4 == 0, "a fully excluded scan opens nothing")
  }

  test("string stats prune equality and prefix predicates") {
    val root = statsTable()
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("v") === "b15"))
    assert(rows.map(_.getString(1)) == Seq("b15"))
    assert(n == 1)
    val (rows2, n2) = filesRead(df.filter(col("v").startsWith("c2")))
    assert(rows2.nonEmpty && rows2.forall(_.getString(1).startsWith("c2")))
    assert(n2 == 1)
  }

  test("IN-list and IS NULL prune from stats") {
    val root = statsTable()
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("id").isin(3L, 7L)))
    assert(rows.map(_.getLong(0)).sorted == Seq(3L, 7L))
    assert(n == 1)
    // nullCount says no file holds a null id → zero files open
    val (rows2, n2) = filesRead(df.filter(col("id").isNull))
    assert(rows2.isEmpty && n2 == 0)
  }

  test("files without stats are never pruned") {
    val root = tempDir("delta_nostats")
    import spark.implicits._
    val schema = Seq((1L, "a")).toDF("id", "v").schema.json
    val f1 = writePart(root, "part-a.parquet", Seq((1L, "a")).toDF("id", "v"))
    val f2 = writePart(root, "part-b.parquet", Seq((2L, "b")).toDF("id", "v"))
    commit(root, 0, Seq(protocol, meta(schema), add(f1), add(f2)))
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("id") > 100))
    assert(rows.isEmpty)
    assert(n == 2, "no stats → both files must be opened")
  }

  test("log-served partition values prune a NON-hive layout at plan time") {
    val root = tempDir("delta_nonhive_prune")
    import spark.implicits._
    val schema = Seq((1L, "x", 10)).toDF("id", "v", "p").schema.json
    val f1 = writePart(root, "opaque-0.parquet", Seq((1L, "x")).toDF("id", "v"))
    val f2 = writePart(root, "opaque-1.parquet", Seq((2L, "y")).toDF("id", "v"))
    val f3 = writePart(root, "opaque-2.parquet", Seq((3L, "z")).toDF("id", "v"))
    commit(root, 0, Seq(protocol, meta(schema, Seq("p")),
      add(f1, null, Map("p" -> "10")), add(f2, null, Map("p" -> "20")),
      add(f3, null, Map("p" -> "30"))))
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("p") === 20))
    assert(rows.map(r => (r.getLong(0), r.getInt(2))) == Seq((2L, 20)))
    assert(n == 1, "partition filter must prune by log values, not scan all")
    // partition column order: declared schema order survives
    assert(df.columns.toSeq == Seq("id", "v", "p"))
  }

  test("WRITER string stats are decoded UTF-8, not parquet Binary debug text") {
    // regression: footerStats used Binary.toString, emitting
    // "Binary{3 reused bytes, ...}" bounds — string equality predicates
    // then pruned LIVE files (kind = 'ivf' returned 0 of 4 rows)
    val root = tempDir("delta_str_stats")
    import spark.implicits._
    graft.catalog.DeltaSink.write(
      Seq(("alpha", 1L), ("beta", 2L), ("gamma", 3L)).toDF("name", "v"),
      root.getPath, Map.empty)
    val logLines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(root.getPath, "_delta_log",
        "00000000000000000000.json"))
    val statsJson = logLines.toArray.mkString("\n")
    assert(!statsJson.contains("Binary{"),
      s"string bounds must decode UTF-8:\n$statsJson")
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val got = df.filter(col("name") === "beta").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L))
  }

  test("relation sizeInBytes is the log's true byte count") {
    val root = statsTable()
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val expected = sizes.filterKeys(_.startsWith("part-")).values
    val relSize = df.queryExecution.optimizedPlan.collectLeaves()
      .head.stats.sizeInBytes.toLong
    // the optimizer may scale by conf factors; the raw relation size must
    // at least reflect the log sum, not a directory-listing guess
    assert(relSize >= expected.min && relSize <= expected.sum * 10,
      s"relation size $relSize vs log sizes ${expected.toSeq.sorted}")
  }
}
