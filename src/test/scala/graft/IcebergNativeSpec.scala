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
      {"name":"record_count","type":"long"}]}""")
  private val entrySchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":${dataFileSchema.toString}}]}""")
  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":["null","int"],"default":null}]}""")

  private def writeAvro(path: File, schema: Schema, rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    try rows.foreach(w.append) finally w.close()
  }

  private def entry(status: Int, filePath: String, content: Option[Int] = None): GenericRecord = {
    val df = new GenericData.Record(dataFileSchema)
    df.put("content", content.map(Int.box).orNull)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", 1L)
    val e = new GenericData.Record(entrySchema)
    e.put("status", status)
    e.put("data_file", df)
    e
  }

  private def manifestListRow(path: String, content: Option[Int] = None): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path)
    r.put("content", content.map(Int.box).orNull)
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

  test("row-level delete files reject loudly") {
    val root = tempDir("ice_del")
    import spark.implicits._
    val f1 = writePart(root, "data/a.parquet", Seq((1L, "a")).toDF("id", "v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(entry(1, f1, content = Some(1))))
    writeAvro(new File(md, "ml.avro"), manifestListSchema, Seq(manifestListRow("metadata/m1.avro")))
    writeMeta(root, s"""{
      "format-version": 2, "table-uuid": "t", "location": "${root.getPath}",
      "current-schema-id": 0, "schemas": [$tableSchemaJson],
      "current-snapshot-id": 1,
      "snapshots": [{"snapshot-id": 1, "manifest-list": "metadata/ml.avro"}]}""")
    val e = intercept[IcebergNative.IcebergReadException] {
      IcebergNative.read(spark, root.getPath, Map.empty)
    }
    assert(e.getMessage.contains("delete file"))
    // delete MANIFESTS (content=1 in the manifest list) reject the same way
    writeAvro(new File(md, "ml.avro"), manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", content = Some(1))))
    val e2 = intercept[IcebergNative.IcebergReadException] {
      IcebergNative.read(spark, root.getPath, Map.empty)
    }
    assert(e2.getMessage.contains("delete manifests"))
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
