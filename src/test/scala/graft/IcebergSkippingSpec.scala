package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.sources.IcebergNative

/** Manifest-bounds file skipping: lower_bounds/upper_bounds/
  * null_value_counts from hand-written Avro manifests (spec Appendix D
  * single-value serialization, int-keyed maps as array-of-kv records) must
  * prune data files at plan time through the manifest-backed FileIndex. */
class IcebergSkippingSpec extends SparkSpec {

  // data_file WITH the stats maps (array-of-{key,value} encoding — the
  // spec's int-keyed map layout)
  private val kvBytesSchema =
    """{"type":"array","items":{"type":"record","name":"kvb","fields":[
      {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}"""
  private val kvLongSchema =
    """{"type":"array","items":{"type":"record","name":"kvl","fields":[
      {"name":"key","type":"int"},{"name":"value","type":"long"}]}}"""
  private val dataFileSchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"r2","fields":[
      {"name":"content","type":["null","int"],"default":null},
      {"name":"file_path","type":"string"},
      {"name":"file_format","type":"string"},
      {"name":"record_count","type":"long"},
      {"name":"file_size_in_bytes","type":["null","long"],"default":null},
      {"name":"lower_bounds","type":["null",$kvBytesSchema],"default":null},
      {"name":"upper_bounds","type":["null",${kvBytesSchema.replace("kvb", "kvb2")}],"default":null},
      {"name":"null_value_counts","type":["null",$kvLongSchema],"default":null}]}""")
  private val entrySchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"sequence_number","type":["null","long"],"default":null},
      {"name":"data_file","type":${dataFileSchema.toString}}]}""")
  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"sequence_number","type":["null","long"],"default":null}]}""")

  private val tableSchemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      {"id":1,"name":"id","required":false,"type":"long"},
      {"id":2,"name":"v","required":false,"type":"string"}]}"""

  private val sizes = scala.collection.mutable.Map[String, Long]()
  private def writePart(root: File, sub: String, df: DataFrame): String = {
    val tmp = new File(root, s"_tmp_${sub.replace('/', '_')}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(root, sub)
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    sizes(sub) = dest.length()
    sub
  }

  private def le8(v: Long): java.nio.ByteBuffer = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.flip(); b
  }
  private def utf8(s: String): java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(s.getBytes("UTF-8"))

  private def kvArr(itemsName: String, pairs: Seq[(Int, AnyRef)], fieldSchema: Schema): AnyRef = {
    val arrSchema = fieldSchema.getTypes.get(1) // ["null", array]
    val arr = new GenericData.Array[GenericRecord](pairs.length, arrSchema)
    pairs.foreach { case (k, v) =>
      val r = new GenericData.Record(arrSchema.getElementType)
      r.put("key", k); r.put("value", v)
      arr.add(r)
    }
    arr
  }

  /** A data-file entry with id bounds [lo,hi], v bounds [loV,hiV], and all
    * columns fully non-null. */
  private def entryWithBounds(path: String, records: Long, lo: Long, hi: Long,
      loV: String, hiV: String): GenericRecord = {
    val df = new GenericData.Record(dataFileSchema)
    df.put("content", Int.box(0))
    df.put("file_path", path)
    df.put("file_format", "PARQUET")
    df.put("record_count", records)
    df.put("file_size_in_bytes", Long.box(sizes(path)))
    df.put("lower_bounds", kvArr("kvb",
      Seq(1 -> le8(lo), 2 -> utf8(loV)), dataFileSchema.getField("lower_bounds").schema()))
    df.put("upper_bounds", kvArr("kvb2",
      Seq(1 -> le8(hi), 2 -> utf8(hiV)), dataFileSchema.getField("upper_bounds").schema()))
    df.put("null_value_counts", kvArr("kvl",
      Seq(1 -> Long.box(0L), 2 -> Long.box(0L)),
      dataFileSchema.getField("null_value_counts").schema()))
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    e.put("sequence_number", Long.box(1L))
    e.put("data_file", df)
    e
  }

  private def writeAvro(path: File, schema: Schema, rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    try rows.foreach(w.append) finally w.close()
  }

  private def findScan(plan: SparkPlan): Option[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case f: FileSourceScanExec => Some(f)
    case other =>
      other.children.iterator.map(findScan).collectFirst { case Some(s) => s }
  }
  private def filesRead(df: DataFrame): (Seq[org.apache.spark.sql.Row], Long) = {
    val rows = df.collect().toSeq
    val scan = findScan(df.queryExecution.executedPlan).getOrElse(
      fail("no FileSourceScanExec in the executed plan"))
    (rows, scan.metrics("numFiles").value)
  }

  private def boundsTable(): File = {
    val root = tempDir("ice_skip")
    import spark.implicits._
    val f1 = writePart(root, "data/a.parquet",
      (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    val f2 = writePart(root, "data/b.parquet",
      (11L to 20L).map(i => (i, s"b$i")).toDF("id", "v"))
    val f3 = writePart(root, "data/c.parquet",
      (21L to 30L).map(i => (i, s"c$i")).toDF("id", "v"))
    val md = new File(root, "metadata"); md.mkdirs()
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(
      entryWithBounds(f1, 10, 1, 10, "a1", "a9"),
      entryWithBounds(f2, 10, 11, 20, "b11", "b20"),
      entryWithBounds(f3, 10, 21, 30, "c21", "c30")))
    val mlRow = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", "metadata/m1.avro")
      r.put("sequence_number", Long.box(1L))
      r
    }
    writeAvro(new File(md, "ml.avro"), manifestListSchema, Seq(mlRow))
    java.nio.file.Files.writeString(new File(md, "v1.metadata.json").toPath,
      s"""{
        "format-version": 2, "table-uuid": "t", "location": "${root.getPath}",
        "current-schema-id": 0, "schemas": [$tableSchemaJson],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "manifest-list": "metadata/ml.avro"}]}""")
    java.nio.file.Files.writeString(new File(md, "version-hint.text").toPath, "1")
    root
  }

  test("manifest bounds prune numeric and string predicates at plan time") {
    val root = boundsTable()
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("id") > 25))
    assert(rows.map(_.getLong(0)).sorted == (26L to 30L))
    assert(n == 1, "only the [21,30] file may open")
    val (rows2, n2) = filesRead(df.filter(col("v") === "b15"))
    assert(rows2.map(_.getString(1)) == Seq("b15"))
    assert(n2 == 1)
    val (rows3, n3) = filesRead(df.filter(col("id") > 100))
    assert(rows3.isEmpty && n3 == 0)
    // null_value_counts: no file admits a null id
    val (rows4, n4) = filesRead(df.filter(col("id").isNull))
    assert(rows4.isEmpty && n4 == 0)
    // and the unfiltered read still sees everything
    assert(df.count() == 30)
  }

  test("entries without bounds are never pruned") {
    val root = tempDir("ice_nobounds")
    import spark.implicits._
    val f1 = writePart(root, "data/a.parquet", Seq((1L, "a")).toDF("id", "v"))
    val md = new File(root, "metadata"); md.mkdirs()
    val df0 = new GenericData.Record(dataFileSchema)
    df0.put("content", Int.box(0))
    df0.put("file_path", f1)
    df0.put("file_format", "PARQUET")
    df0.put("record_count", 1L)
    df0.put("file_size_in_bytes", Long.box(sizes(f1)))
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1); e.put("sequence_number", Long.box(1L)); e.put("data_file", df0)
    writeAvro(new File(md, "m1.avro"), entrySchema, Seq(e))
    val mlRow = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", "metadata/m1.avro"); r.put("sequence_number", Long.box(1L)); r
    }
    writeAvro(new File(md, "ml.avro"), manifestListSchema, Seq(mlRow))
    java.nio.file.Files.writeString(new File(md, "v1.metadata.json").toPath,
      s"""{
        "format-version": 2, "table-uuid": "t", "location": "${root.getPath}",
        "current-schema-id": 0, "schemas": [$tableSchemaJson],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "manifest-list": "metadata/ml.avro"}]}""")
    java.nio.file.Files.writeString(new File(md, "version-hint.text").toPath, "1")
    val df = IcebergNative.read(spark, root.getPath, Map.empty)
    val (rows, n) = filesRead(df.filter(col("id") > 100))
    assert(rows.isEmpty && n == 1, "no bounds → the file must be opened")
  }

  test("decodeBound: spec Appendix D encodings") {
    import IcebergNative.decodeBound
    def le4(v: Int) = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.array()
    }
    assert(decodeBound(le4(42), "int").contains(42L))
    assert(decodeBound(le8(1234567890123L).array(), "long").contains(1234567890123L))
    assert(decodeBound(le4(java.lang.Float.floatToIntBits(1.5f)), "float").contains(1.5d))
    assert(decodeBound("héllo".getBytes("UTF-8"), "string").contains("héllo"))
    assert(decodeBound(Array[Byte](1), "boolean").contains(true))
    assert(decodeBound(le4(19000), "date").contains(19000L))
    // decimal(9,2): big-endian unscaled
    val unscaled = java.math.BigInteger.valueOf(12345)
    assert(decodeBound(unscaled.toByteArray, "decimal(9,2)")
      .contains(new java.math.BigDecimal(unscaled, 2)))
    // malformed never throws
    assert(decodeBound(Array[Byte](1, 2), "long").isEmpty)
    assert(decodeBound(Array[Byte](1, 2, 3), "nonsense").isEmpty)
  }
}
