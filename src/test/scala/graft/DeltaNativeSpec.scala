package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.sources.DeltaNative

/** Native Delta reader against hand-built tables: the _delta_log JSON is
  * written by the spec itself per the public protocol (delta.io
  * PROTOCOL.md), so the reader is tested against the FORMAT, not against
  * its own writer. */
class DeltaNativeSpec extends SparkSpec {

  private def metaAction(schemaJson: String, partCols: Seq[String] = Nil,
      conf: Map[String, String] = Map.empty): String = {
    val pc = partCols.map(c => s""""$c"""").mkString(",")
    val cf = conf.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"metaData":{"id":"test-table","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")}",""" +
      s""""partitionColumns":[$pc],"configuration":{$cf},"createdTime":0}}"""
  }
  private val protocolV1 = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def commit(dir: File, version: Long, lines: Seq[String]): Unit = {
    val log = new File(dir, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.writeString(
      new File(log, f"$version%020d.json").toPath, lines.mkString("\n") + "\n")
  }

  /** Write rows as a single parquet part under the table root, return the
    * RELATIVE path of the part file (what an `add` action records). */
  private def writePart(root: File, sub: String, df: org.apache.spark.sql.DataFrame): String = {
    val tmp = new File(root, s"_tmp_$sub")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(root, sub)
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    sub
  }

  private def add(path: String, pv: Map[String, String] = Map.empty): String = {
    val pvs = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"add":{"path":"$path","partitionValues":{$pvs},"size":1,"modificationTime":0,"dataChange":true}}"""
  }
  private def remove(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""

  test("multi-commit snapshot honors add + remove tombstones") {
    val root = tempDir("delta_basic")
    import spark.implicits._
    val schema = Seq((1L, "a")).toDF("id", "v").schema.json
    val f1 = writePart(root, "part-001.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val f2 = writePart(root, "part-002.parquet", Seq((3L, "c")).toDF("id", "v"))
    val f3 = writePart(root, "part-003.parquet", Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
    commit(root, 0, Seq(protocolV1, metaAction(schema), add(f1), add(f2)))
    commit(root, 1, Seq(remove(f2), add(f3))) // rewrite: drop f2's rows, add f3's
    val df = Catalog.attach(spark, "delta_basic", "delta", Map("files" -> root.getPath))
    assert(df.columns.toSeq === Seq("id", "v"))
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L))
  }

  test("partitioned table: hive layout, types pinned by the Delta schema") {
    val root = tempDir("delta_part")
    import spark.implicits._
    val full = Seq((1L, "x", 10)).toDF("id", "v", "p")
    val schema = full.schema.json // includes partition column p INT
    val f1 = writePart(root, "p=10/part-0.parquet", Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    val f2 = writePart(root, "p=20/part-0.parquet", Seq((3L, "z")).toDF("id", "v"))
    commit(root, 0, Seq(protocolV1, metaAction(schema, Seq("p")),
      add(f1, Map("p" -> "10")), add(f2, Map("p" -> "20"))))
    val df = Catalog.attach(spark, "delta_part", "delta", Map("files" -> root.getPath))
    assert(df.schema("p").dataType === org.apache.spark.sql.types.IntegerType)
    assert(df.filter(col("p") === 20).select("id").head().getLong(0) === 3L)
    assert(df.count() === 3)
  }

  test("partitioned table: non-hive layout takes values from the log") {
    val root = tempDir("delta_nonhive")
    import spark.implicits._
    val schema = Seq((1L, "x", 10)).toDF("id", "v", "p").schema.json
    val f1 = writePart(root, "opaque-0.parquet", Seq((1L, "x")).toDF("id", "v"))
    val f2 = writePart(root, "opaque-1.parquet", Seq((2L, "y")).toDF("id", "v"))
    commit(root, 0, Seq(protocolV1, metaAction(schema, Seq("p")),
      add(f1, Map("p" -> "10")), add(f2, Map("p" -> "20"))))
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    val rows = df.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(2))).toSeq === Seq((1L, 10), (2L, 20)))
  }

  test("checkpoint + later commit replay") {
    val root = tempDir("delta_cp")
    import spark.implicits._
    val schema = Seq((1L, "a")).toDF("id", "v").schema.json
    val f1 = writePart(root, "part-cp1.parquet", Seq((1L, "a")).toDF("id", "v"))
    val f2 = writePart(root, "part-cp2.parquet", Seq((2L, "b")).toDF("id", "v"))
    val f3 = writePart(root, "part-cp3.parquet", Seq((3L, "c")).toDF("id", "v"))
    // checkpoint at version 1 carries the live adds (f1, f2) as structs,
    // written via Spark SQL — the checkpoint IS a parquet file of actions
    val log = new File(root, "_delta_log")
    log.mkdirs()
    val cpDir = new File(root, "_cp_tmp")
    spark.sql(
      s"""SELECT * FROM VALUES
         (named_struct('path', '$f1', 'partitionValues', map(), 'size', 1L,
                       'modificationTime', 0L, 'dataChange', true),
          CAST(NULL AS STRUCT<minReaderVersion: INT, minWriterVersion: INT>),
          CAST(NULL AS STRUCT<id: STRING, schemaString: STRING, partitionColumns: ARRAY<STRING>>)),
         (named_struct('path', '$f2', 'partitionValues', map(), 'size', 1L,
                       'modificationTime', 0L, 'dataChange', true),
          CAST(NULL AS STRUCT<minReaderVersion: INT, minWriterVersion: INT>),
          CAST(NULL AS STRUCT<id: STRING, schemaString: STRING, partitionColumns: ARRAY<STRING>>)),
         (CAST(NULL AS STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>, size: BIGINT,
                              modificationTime: BIGINT, dataChange: BOOLEAN>),
          named_struct('minReaderVersion', 1, 'minWriterVersion', 2),
          CAST(NULL AS STRUCT<id: STRING, schemaString: STRING, partitionColumns: ARRAY<STRING>>)),
         (CAST(NULL AS STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>, size: BIGINT,
                              modificationTime: BIGINT, dataChange: BOOLEAN>),
          CAST(NULL AS STRUCT<minReaderVersion: INT, minWriterVersion: INT>),
          named_struct('id', 't', 'schemaString', '$schema',
                       'partitionColumns', array()))
         AS t(add, protocol, metaData)"""
    ).coalesce(1).write.mode("overwrite").parquet(cpDir.getPath)
    val cpPart = cpDir.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(cpPart.toPath,
      new File(log, f"${1L}%020d.checkpoint.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(cpDir)
    java.nio.file.Files.writeString(new File(log, "_last_checkpoint").toPath,
      """{"version":1,"size":4}""")
    // a commit AFTER the checkpoint removes f1 and adds f3
    commit(root, 2, Seq(remove(f1), add(f3)))
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
  }

  test("multi-part checkpoint parts all contribute") {
    val root = tempDir("delta_mpcp")
    import spark.implicits._
    val schema = Seq((1L, "a")).toDF("id", "v").schema.json
    val f1 = writePart(root, "part-mp1.parquet", Seq((1L, "a")).toDF("id", "v"))
    val f2 = writePart(root, "part-mp2.parquet", Seq((2L, "b")).toDF("id", "v"))
    val log = new File(root, "_delta_log")
    log.mkdirs()
    // part 1 carries protocol+metaData, part 2 carries the adds — a reader
    // that only opened one part would miss either the schema or the files
    def cpSql(rows: String) = spark.sql(
      s"""SELECT * FROM VALUES $rows AS t(add, protocol, metaData)""")
    val addT = "STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>, size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN>"
    val protoT = "STRUCT<minReaderVersion: INT, minWriterVersion: INT>"
    val metaT = "STRUCT<id: STRING, schemaString: STRING, partitionColumns: ARRAY<STRING>>"
    def writeCp(i: Int, rows: String): Unit = {
      val tmp = new File(root, s"_cp$i")
      cpSql(rows).coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val p = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(p.toPath,
        new File(log, f"${1L}%020d.checkpoint.$i%010d.${2}%010d.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
    writeCp(1, s"""(CAST(NULL AS $addT),
       named_struct('minReaderVersion', 1, 'minWriterVersion', 2),
       named_struct('id', 't', 'schemaString', '$schema',
                    'partitionColumns', CAST(array() AS ARRAY<STRING>)))""")
    writeCp(2, s"""(named_struct('path', '$f1',
         'partitionValues', CAST(map() AS MAP<STRING,STRING>), 'size', 1L,
         'modificationTime', 0L, 'dataChange', true),
       CAST(NULL AS $protoT), CAST(NULL AS $metaT)),
      (named_struct('path', '$f2',
         'partitionValues', CAST(map() AS MAP<STRING,STRING>), 'size', 1L,
         'modificationTime', 0L, 'dataChange', true),
       CAST(NULL AS $protoT), CAST(NULL AS $metaT))""")
    java.nio.file.Files.writeString(new File(log, "_last_checkpoint").toPath,
      """{"version":1,"size":4,"parts":2}""")
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("non-hive layout scales: 120 log-valued partitions read through ONE scan") {
    val root = tempDir("delta_nonhive_many")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("p", IntegerType))).json
    // 120 one-row files written in ONE job; the fid=N dirs are writer
    // artifacts, NOT the Delta partition column p, so the reader must take
    // every p from the log
    val dataDir = new File(root, "data")
    spark.range(120).select(col("id"), col("id").cast("int").as("fid"))
      .write.partitionBy("fid").mode("overwrite").parquet(dataDir.getPath)
    val addLines = dataDir.listFiles().filter(_.getName.startsWith("fid=")).map { d =>
      val fid = d.getName.stripPrefix("fid=").toInt
      val f = d.listFiles().find(_.getName.endsWith(".parquet")).get
      add(s"data/fid=$fid/${f.getName}", Map("p" -> fid.toString))
    }.toSeq
    commit(root, 0, Seq(protocolV1, metaAction(schema, Seq("p"))) ++ addLines)
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    assert(df.count() === 120)
    // every row's log-attached p equals the id its file was built from —
    // full per-file mapping verified in one distributed pass
    assert(df.filter(col("p") === col("id")).count() === 120)
    // the 100 TB pin: ONE parquet scan + a broadcast lookup, never a
    // per-partition union (plan size must stay O(1) in partition count)
    val plan = df.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllMatchIn(plan).size === 1, s"expected one scan:\n$plan")
    assert(!plan.contains("Union"), s"per-partition union resurfaced:\n$plan")
  }

  test("column mapping mode=name: physical parquet names map back to logical") {
    val root = tempDir("delta_cm")
    import spark.implicits._
    import org.apache.spark.sql.types._
    def fld(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "col-9f3a", 1), fld("v", StringType, "col-77b0", 2)))
    // the data file knows ONLY physical names — that's the point of mapping
    val f1 = writePart(root, "part-cm.parquet",
      Seq((1L, "a"), (2L, "b")).toDF("col-9f3a", "col-77b0"))
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaAction(logical.json, Nil, Map("delta.columnMapping.mode" -> "name")),
      add(f1)))
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    assert(df.columns.toSeq === Seq("id", "v"))
    assert(df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b")))
    // and through the v3 feature gate too
    val root3 = tempDir("delta_cm3")
    val f3 = writePart(root3, "part-cm3.parquet", Seq((9L, "z")).toDF("col-9f3a", "col-77b0"))
    commit(root3, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
      metaAction(logical.json, Nil, Map("delta.columnMapping.mode" -> "name")),
      add(f3)))
    assert(DeltaNative.read(spark, root3.getPath, Map.empty)
      .select("id").head().getLong(0) === 9L)
  }

  test("column mapping mode=name on a PARTITIONED table: physical dirs + pv keys") {
    val root = tempDir("delta_cm_part")
    import spark.implicits._
    import org.apache.spark.sql.types._
    def fld(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "col-aa11", 1), fld("v", StringType, "col-bb22", 2),
      fld("p", IntegerType, "col-cc33", 3)))
    // with mapping active, hive dir names AND partitionValues keys are
    // PHYSICAL; partitionColumns stays logical
    val f1 = writePart(root, "col-cc33=10/part-0.parquet",
      Seq((1L, "x")).toDF("col-aa11", "col-bb22"))
    val f2 = writePart(root, "col-cc33=20/part-0.parquet",
      Seq((2L, "y")).toDF("col-aa11", "col-bb22"))
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaAction(logical.json, Seq("p"), Map("delta.columnMapping.mode" -> "name")),
      add(f1, Map("col-cc33" -> "10")), add(f2, Map("col-cc33" -> "20"))))
    val df = DeltaNative.read(spark, root.getPath, Map.empty)
    assert(df.columns.toSeq === Seq("id", "v", "p"))
    assert(df.schema("p").dataType === IntegerType)
    assert(df.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
      === Seq((1L, 10), (2L, 20)))
  }

  test("reader features beyond column mapping reject loudly") {
    val root = tempDir("delta_dv")
    import spark.implicits._
    val schema = Seq((1L, "a")).toDF("id", "v").schema.json
    val f1 = writePart(root, "part-dv.parquet", Seq((1L, "a")).toDF("id", "v"))
    commit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaAction(schema), add(f1)))
    val e = intercept[DeltaNative.DeltaReadException] {
      DeltaNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.contains("deletionVectors"))
  }

  test("reader protocol v2+ rejects loudly instead of misreading") {
    val root = tempDir("delta_v2")
    import spark.implicits._
    val schema = Seq((1L, "a")).toDF("id", "v").schema.json
    val f1 = writePart(root, "part-0.parquet", Seq((1L, "a")).toDF("id", "v"))
    commit(root, 0, Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      metaAction(schema), add(f1)))
    val e = intercept[DeltaNative.DeltaReadException] {
      DeltaNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.contains("protocol version 3"))
  }

  test("non-delta directory errors with a clear message") {
    val root = tempDir("delta_none")
    val e = intercept[DeltaNative.DeltaReadException] {
      DeltaNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.contains("_delta_log"))
  }
}
