package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.catalog.Catalog
import graft.sources.IcebergNative

/** Native Iceberg reader against hand-built tables: manifests are written
  * with the stock Avro library and metadata.json by hand, per the public
  * Iceberg table spec — the reader is tested against the FORMAT. */
class IcebergNativeSpec extends SparkSpec {

  // minimal avro schemas carrying exactly the spec fields the reader uses;
  // Avro readers use the file's embedded writer schema, so hand-rolled
  // manifests exercise the same decode path a full writer would
  private val dataFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"r2","fields":[
      {"name":"content","type":["null","int"],"default":null},
      {"name":"file_path","type":"string"},
      {"name":"file_format","type":"string"},
      {"name":"record_count","type":"long"},
      {"name":"file_size_in_bytes","type":["null","long"],"default":null},
      {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
      {"name":"partition","type":["null",{"type":"record","name":"ptuple","fields":[
        {"name":"p","type":["null","int"],"default":null},
        {"name":"p_bucket","type":["null","int"],"default":null}]}],"default":null}]}""")
  private val entrySchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"sequence_number","type":["null","long"],"default":null},
      {"name":"data_file","type":${dataFileSchema.toString}}]}""")
  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":["null","int"],"default":null},
      {"name":"sequence_number","type":["null","long"],"default":null}]}""")

  private def writeAvro(path: File, schema: Schema, rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    try rows.foreach(w.append) finally w.close()
  }

  private def entry(status: Int, filePath: String, content: Option[Int] = None,
      seq: Option[Long] = None, eqIds: Seq[Int] = Nil,
      format: String = "PARQUET", partition: Map[String, Int] = Map.empty): GenericRecord = {
    val df = new GenericData.Record(dataFileSchema)
    df.put("content", content.map(Int.box).orNull)
    if (partition.nonEmpty) {
      val pt = new GenericData.Record(
        dataFileSchema.getField("partition").schema().getTypes.get(1))
      partition.foreach { case (k, v) => pt.put(k, Int.box(v)) }
      df.put("partition", pt)
    }
    df.put("file_path", filePath)
    df.put("file_format", format)
    df.put("record_count", 1L)
    df.put("file_size_in_bytes", Long.box(1024L))
    df.put("equality_ids",
      if (eqIds.isEmpty) null else eqIds.map(Int.box).asJava)
    val e = new GenericData.Record(entrySchema)
    e.put("status", status)
    e.put("sequence_number", seq.map(Long.box).orNull)
    e.put("data_file", df)
    e
  }

  private def manifestListRow(path: String, content: Option[Int] = None,
      seq: Option[Long] = None): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path)
    r.put("content", content.map(Int.box).orNull)
    r.put("sequence_number", seq.map(Long.box).orNull)
    r
  }

  private val tableSchemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      {"id":1,"name":"id","required":true,"type":"long"},
      {"id":2,"name":"v","required":false,"type":"string"}]}"""

  private def writePart(root: File, sub: String, df: org.apache.spark.sql.DataFrame): String = {
    val tmp = new File(root, s"_tmp_${sub.replace('/', '_')}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(root, sub)
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    sub
  }

  private def writeMeta(root: File, body: String, version: Int = 1): Unit = {
    val md = new File(root, "metadata"); md.mkdirs()
    java.nio.file.Files.writeString(new File(md, s"v$version.metadata.json").toPath, body)
    java.nio.file.Files.writeString(new File(md, "version-hint.text").toPath, version.toString)
  }

  test("v2 snapshot via manifest list; DELETED entries drop") {
    val root = tempDir("ice_v2")
    import spark.implicits._
    val f1 = writePart(root, "data/a.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val f2 = writePart(root, "data/b.parquet", Seq((3L, "c")).toDF("id", "v"))
    val f3 = writePart(root, "data/c.parquet", Seq((4L, "d")).toDF("id", "v"))
    val md = new File(root, "metadata"); md.mkdirs()
    // one manifest keeps f1 + f3, marks f2 DELETED (status=2)
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, f1), entry(2, f2), entry(0, f3, content = Some(0))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema, Seq(manifestListRow("metadata/m1.avro")))
    writeMeta(root, s"""{
      "format-version": 2, "table-uuid": "t", "location": "${root.getPath}",
      "current-schema-id": 0, "schemas": [$tableSchemaJson],
      "current-snapshot-id": 77,
      "snapshots": [{"snapshot-id": 77, "manifest-list": "metadata/ml.avro"}]}""")
    val df = Catalog.attach(spark, "ice_v2", "iceberg", Map("files" -> root.getPath))
    assert(df.schema("id").dataType === org.apache.spark.sql.types.LongType)
    // (nullability is asserted on toStruct directly — Spark file sources
    // relax any user schema to nullable on read)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
  }

  test("v1 snapshot with inline manifests and bare schema field") {
    val root = tempDir("ice_v1")
    import spark.implicits._
    val f1 = writePart(root, "data/only.parquet", Seq((9L, "z")).toDF("id", "v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(entry(1, f1)))
    writeMeta(root, s"""{
      "format-version": 1, "table-uuid": "t", "location": "${root.getPath}",
      "schema": $tableSchemaJson,
      "current-snapshot-id": 5,
      "snapshots": [{"snapshot-id": 5, "manifests": ["metadata/m1.avro"]}]}""")
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "z")))
  }

  private def v2Meta(root: File, snapshotId: Long = 1, extra: String = "",
      schemaJson: String = tableSchemaJson): String = s"""{
      "format-version": 2, "table-uuid": "t", "location": "${root.getPath}",
      "current-schema-id": 0, "schemas": [$schemaJson],
      "current-snapshot-id": $snapshotId, $extra
      "snapshots": [{"snapshot-id": $snapshotId, "manifest-list": "metadata/ml.avro"}]}"""

  test("v2 positional deletes drop (path, pos) rows with sequence visibility") {
    val root = tempDir("ice_posdel")
    import spark.implicits._
    val fA = writePart(root, "data/a.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val fB = writePart(root, "data/b.parquet", Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
    // positional delete file per the spec: (file_path, pos) columns. One
    // LIVE delete kills pos 1 of file A (id=2); one STALE delete (sequence
    // BELOW the data's) targets pos 0 of file B and must NOT apply.
    val live = writePart(root, "data/del_live.parquet",
      Seq((s"${root.getPath}/data/a.parquet", 1L)).toDF("file_path", "pos"))
    val stale = writePart(root, "data/del_stale.parquet",
      Seq((s"${root.getPath}/data/b.parquet", 0L)).toDF("file_path", "pos"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, fA, seq = Some(1L)), entry(1, fB, seq = Some(1L)),
      entry(1, live, content = Some(1), seq = Some(2L)),
      entry(1, stale, content = Some(1), seq = Some(0L))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", seq = Some(2L))))
    writeMeta(root, v2Meta(root))
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L, 5L))
  }

  test("v2 equality deletes drop matching rows, strict-sequence, null-safe") {
    val root = tempDir("ice_eqdel")
    import spark.implicits._
    val fA = writePart(root, "data/a.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, null.asInstanceOf[String])).toDF("id", "v"))
    // equality delete on field id 2 (column v): v='a' and v=null at seq 2
    // delete ids 1,3,4; a same-sequence delete (seq 1, NOT < data seq 1)
    // targeting 'b' must not apply
    val live = writePart(root, "data/eq_live.parquet",
      Seq("a", null.asInstanceOf[String]).toDF("v"))
    val same = writePart(root, "data/eq_same.parquet", Seq("b").toDF("v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, fA, seq = Some(1L)),
      entry(1, live, content = Some(2), seq = Some(2L), eqIds = Seq(2)),
      entry(1, same, content = Some(2), seq = Some(1L), eqIds = Seq(2))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", seq = Some(2L))))
    writeMeta(root, v2Meta(root))
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("partition-scoped equality deletes stay inside their partition") {
    val root = tempDir("ice_eqscope")
    import spark.implicits._
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":true,"type":"long"},
        {"id":2,"name":"p","required":false,"type":"int"},
        {"id":3,"name":"v","required":false,"type":"string"}]}"""
    val specsJson =
      """"partition-specs": [{"spec-id":0,"fields":[
        {"name":"p","transform":"identity","source-id":2,"field-id":1000}]}],"""
    // same v in BOTH partitions; the delete is scoped to p=2 only
    val fA = writePart(root, "data/p1.parquet", Seq((1L, 1, "x")).toDF("id", "p", "v"))
    val fB = writePart(root, "data/p2.parquet", Seq((2L, 2, "x")).toDF("id", "p", "v"))
    val del = writePart(root, "data/eq.parquet", Seq("x").toDF("v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, fA, seq = Some(1L), partition = Map("p" -> 1)),
      entry(1, fB, seq = Some(1L), partition = Map("p" -> 2)),
      entry(1, del, content = Some(2), seq = Some(2L), eqIds = Seq(3),
        partition = Map("p" -> 2))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", seq = Some(2L))))
    writeMeta(root, v2Meta(root, extra = specsJson, schemaJson = schemaJson))
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    // the p=1 row shares the deleted v but lives outside the delete's scope
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("non-identity partition transforms on equality deletes reject loudly") {
    val root = tempDir("ice_eqbucket")
    import spark.implicits._
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":true,"type":"long"},
        {"id":2,"name":"p","required":false,"type":"int"},
        {"id":3,"name":"v","required":false,"type":"string"}]}"""
    val specsJson =
      """"partition-specs": [{"spec-id":0,"fields":[
        {"name":"p_bucket","transform":"bucket[4]","source-id":2,"field-id":1000}]}],"""
    val fA = writePart(root, "data/a.parquet", Seq((1L, 1, "x")).toDF("id", "p", "v"))
    val del = writePart(root, "data/eq.parquet", Seq("x").toDF("v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, fA, seq = Some(1L)),
      entry(1, del, content = Some(2), seq = Some(2L), eqIds = Seq(3),
        partition = Map("p_bucket" -> 1))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", seq = Some(2L))))
    writeMeta(root, v2Meta(root, extra = specsJson, schemaJson = schemaJson))
    val e = intercept[IcebergNative.IcebergReadException] {
      IcebergNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.contains("bucket"))
  }

  test("entry sequence numbers inherit from the manifest-list row when null") {
    val root = tempDir("ice_seqinherit")
    import spark.implicits._
    val fA = writePart(root, "data/a.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val del = writePart(root, "data/del.parquet",
      Seq((s"${root.getPath}/data/a.parquet", 0L)).toDF("file_path", "pos"))
    val md = new File(root, "metadata"); md.mkdirs()
    // data manifest at seq 1, delete manifest at seq 2 — entries carry NO
    // explicit sequence, so visibility must come from inheritance
    writeAvro(new File(md, "m_data.avro"), entrySchema, Seq(entry(1, fA)))
    writeAvro(new File(md, "m_del.avro"), entrySchema,
      Seq(entry(1, del, content = Some(1))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema, Seq(
      manifestListRow("metadata/m_data.avro", seq = Some(1L)),
      manifestListRow("metadata/m_del.avro", content = Some(1), seq = Some(2L))))
    writeMeta(root, v2Meta(root))
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("renamed columns resolve by parquet field id, not name") {
    val root = tempDir("ice_rename")
    import org.apache.spark.sql.types._
    // the data file predates a rename: parquet columns old_id/old_v carry
    // field ids 1/2 (spark writes ids when the schema metadata has them);
    // current table schema names them id/v — the spec resolves by ID, a
    // name-based read would return all nulls
    val writeSchema = StructType(Seq(
      StructField("old_id", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1).build()),
      StructField("old_v", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2).build())))
    val rows = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(7L, "seven"), org.apache.spark.sql.Row(8L, "eight")), 1)
    val f1 = writePart(root, "data/renamed.parquet",
      spark.createDataFrame(rows, writeSchema))
    // an equality delete file ALSO written pre-rename: old column name
    // old_v under field id 2, deleting 'seven' — id resolution must reach
    // delete files too
    val delSchema = StructType(Seq(
      StructField("old_v", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2).build())))
    val delRows = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row("seven")), 1)
    val fDel = writePart(root, "data/eq_renamed.parquet",
      spark.createDataFrame(delRows, delSchema))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, f1, seq = Some(1L)),
      entry(1, fDel, content = Some(2), seq = Some(2L), eqIds = Seq(2))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", seq = Some(2L))))
    writeMeta(root, v2Meta(root))
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    assert(df.columns.toSeq === Seq("id", "v"))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((8L, "eight")))
  }

  test("v3 puffin deletion vectors reject loudly") {
    val root = tempDir("ice_puffin")
    import spark.implicits._
    val fA = writePart(root, "data/a.parquet", Seq((1L, "a")).toDF("id", "v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entry(1, fA, seq = Some(1L)),
      entry(1, "data/dv.puffin", content = Some(1), seq = Some(2L), format = "PUFFIN")))
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", seq = Some(2L))))
    writeMeta(root, v2Meta(root))
    val e = intercept[IcebergNative.IcebergReadException] {
      IcebergNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.toLowerCase.contains("puffin"))
  }

  test("schema conversion covers primitives, struct, list, map, decimal") {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      """{"type":"struct","fields":[
        {"id":1,"name":"b","required":true,"type":"boolean"},
        {"id":2,"name":"d","required":false,"type":"decimal(9, 2)"},
        {"id":3,"name":"ts","required":false,"type":"timestamptz"},
        {"id":4,"name":"arr","required":false,"type":
          {"type":"list","element-id":5,"element":"string","element-required":false}},
        {"id":6,"name":"m","required":false,"type":
          {"type":"map","key-id":7,"key":"string","value-id":8,"value":"double","value-required":false}},
        {"id":9,"name":"s","required":false,"type":
          {"type":"struct","fields":[{"id":10,"name":"x","required":true,"type":"int"}]}}]}""")
    val st = IcebergNative.toStruct(node)
    import org.apache.spark.sql.types._
    assert(st("b").dataType === BooleanType && !st("b").nullable)
    assert(st("d").dataType === DecimalType(9, 2))
    assert(st("ts").dataType === TimestampType)
    assert(st("arr").dataType === ArrayType(StringType, containsNull = true))
    assert(st("m").dataType === MapType(StringType, DoubleType, valueContainsNull = true))
    assert(st("s").dataType.asInstanceOf[StructType]("x").dataType === IntegerType)
  }

  test("non-iceberg directory and missing metadata error clearly") {
    val root = tempDir("ice_none")
    val e = intercept[IcebergNative.IcebergReadException] {
      IcebergNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.contains("metadata"))
  }
}
