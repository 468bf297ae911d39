package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Minimal native Apache Iceberg reader — no connector jar required.
  *
  * The reference reads Iceberg through DuckDB's iceberg extension
  * (src/fdw/iceberg.rs, src/duckdb/iceberg.rs:48-89: `iceberg_scan(path)`
  * of a table root, latest snapshot). This reader is built from the PUBLIC
  * Iceberg table spec (iceberg.apache.org/spec): a table root holds
  * `metadata/vN.metadata.json` (current version via `version-hint.text`),
  * whose current snapshot points at an Avro manifest list, whose rows point
  * at Avro manifest files, whose entries list the parquet data files. The
  * Avro core library ships with Spark, so manifest reading needs nothing
  * beyond the stock classpath.
  *
  * Metadata traversal is bounded driver-side work (manifests are the
  * table's file index — the same work the iceberg library does at plan
  * time); the DATA read is a distributed `spark.read.parquet` over the live
  * files with the schema converted from the table metadata (so types are
  * authoritative, not re-inferred). Identity-partitioned Iceberg data files
  * carry every table column in the file itself, so no partition-value
  * reconstruction is needed.
  *
  * Supported: format v1 and v2 append-only snapshots (`manifest-list` or
  * inline v1 `manifests`), DELETED manifest entries, multiple schemas via
  * `current-schema-id`. NOT supported — rejected loudly, never misread:
  * v2 row-level delete files (content != data), non-parquet data files,
  * `time`-typed columns (no Spark analogue).
  */
object IcebergNative {

  final case class IcebergReadException(msg: String) extends IllegalArgumentException(msg)

  private val mapper = new ObjectMapper()

  def read(spark: SparkSession, root: String, options: Map[String, String]): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val metaDir = new Path(rootPath, "metadata")
    if (!fs.exists(metaDir))
      throw IcebergReadException(s"`$root` is not an Iceberg table: no metadata directory")

    // --- locate current metadata.json (version-hint, else latest by name) ---
    val hint = new Path(metaDir, "version-hint.text")
    val metaFile: Path =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
        val candidates = Seq(s"v$v.metadata.json", s"$v.metadata.json")
        candidates.map(new Path(metaDir, _)).find(fs.exists).getOrElse(
          throw IcebergReadException(s"version-hint.text names version $v but no matching metadata.json exists"))
      } else {
        val metas = fs.listStatus(metaDir).map(_.getPath)
          .filter(_.getName.endsWith(".metadata.json"))
        if (metas.isEmpty) throw IcebergReadException(s"`$root`: no *.metadata.json in metadata/")
        metas.maxBy(_.getName)
      }
    val metaIn = fs.open(metaFile)
    val meta = try mapper.readTree(metaIn) finally metaIn.close()

    // --- current schema → Spark StructType ---
    val schemaNode: JsonNode =
      if (meta.has("schemas")) {
        val cur = meta.path("current-schema-id").asInt(0)
        meta.path("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == cur)
          .getOrElse(throw IcebergReadException(s"current-schema-id $cur not found in schemas"))
      } else meta.path("schema")
    val schema = toStruct(schemaNode)

    // --- current snapshot → live parquet files ---
    val snapId = meta.path("current-snapshot-id").asLong(-1L)
    if (snapId == -1L) // an empty table has no snapshot yet
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val snapshot = meta.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong() == snapId)
      .getOrElse(throw IcebergReadException(s"current-snapshot-id $snapId not found in snapshots"))

    def resolve(p: String): Path = {
      val raw = new Path(p)
      if (raw.isAbsolute || p.contains(":/")) raw else new Path(rootPath, raw)
    }
    def avroRows(p: Path): Seq[GenericRecord] = {
      val rdr = DataFileReader.openReader(new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
      try rdr.iterator().asScala.toList finally rdr.close()
    }

    val manifestPaths: Seq[Path] =
      if (snapshot.has("manifest-list")) {
        avroRows(resolve(snapshot.path("manifest-list").asText())).map { r =>
          // v2 manifest lists mark delete manifests via `content` (0=data,1=deletes)
          val content = Option(r.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          if (content != 0) throw IcebergReadException(
            "table has row-level delete manifests (format v2 deletes); this native " +
              "reader only supports append-only snapshots — use an iceberg connector jar")
          resolve(r.get("manifest_path").toString)
        }
      } else if (snapshot.has("manifests"))
        snapshot.path("manifests").elements().asScala.map(m => resolve(m.asText())).toSeq
      else throw IcebergReadException("snapshot carries neither manifest-list nor manifests")

    val files = manifestPaths.flatMap { mp =>
      avroRows(mp).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          Option(df.get("content")).map(_.asInstanceOf[Int]).filter(_ != 0).foreach { c =>
            throw IcebergReadException(
              s"data_file content=$c (delete file) — append-only snapshots only")
          }
          val fmt = df.get("file_format").toString
          if (!fmt.equalsIgnoreCase("parquet"))
            throw IcebergReadException(s"data file format `$fmt` unsupported (parquet only)")
          Some(resolve(df.get("file_path").toString).toString)
        }
      }
    }

    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** Iceberg schema JSON → Spark StructType (primitives + struct/list/map). */
  private[graft] def toStruct(node: JsonNode): StructType =
    StructType(node.path("fields").elements().asScala.map { f =>
      StructField(f.path("name").asText(), toSpark(f.path("type")),
        nullable = !f.path("required").asBoolean(false))
    }.toSeq)

  private val decimalRe = """decimal\((\d+),\s*(\d+)\)""".r
  private val fixedRe = """fixed\[(\d+)\]""".r

  private def toSpark(t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" => StringType
      case "uuid" => StringType
      case "binary" => BinaryType
      case decimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case fixedRe(_) => BinaryType
      case "time" => throw IcebergReadException(
        "Iceberg `time` columns have no Spark analogue; drop or cast the column")
      case other => throw IcebergReadException(s"unsupported Iceberg type `$other`")
    } else t.path("type").asText() match {
      case "struct" => toStruct(t)
      case "list" =>
        ArrayType(toSpark(t.path("element")), containsNull = !t.path("element-required").asBoolean(false))
      case "map" =>
        MapType(toSpark(t.path("key")), toSpark(t.path("value")),
          valueContainsNull = !t.path("value-required").asBoolean(false))
      case other => throw IcebergReadException(s"unsupported Iceberg nested type `$other`")
    }
}
