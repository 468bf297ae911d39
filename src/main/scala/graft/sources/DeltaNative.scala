package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal native Delta Lake reader — no connector jar required.
  *
  * The reference reads Delta through DuckDB's delta extension
  * (src/fdw/delta.rs:1-149, src/duckdb/delta.rs:41-61: `delta_scan(path)` of
  * the table root, latest snapshot, no options). The equivalent here is
  * built from the PUBLIC Delta transaction-log protocol
  * (delta.io PROTOCOL.md): a Delta table is parquet data files plus a
  * `_delta_log/` of ordered JSON commits (one action per line: `protocol`,
  * `metaData`, `add`, `remove`) with periodic parquet checkpoints named by
  * `_last_checkpoint`. Snapshot = checkpoint's live `add` set, then replay
  * of later commits (add inserts by path, remove tombstones by path).
  *
  * Spark-first split of labor: log resolution is bounded METADATA work
  * (exactly what delta-kernel does on the driver — checkpoints keep the
  * replayed tail short at any table size), while all DATA stays in a
  * distributed `spark.read.parquet` over the resolved live files.
  * `schemaString` is Spark schema JSON verbatim (Delta's own format), so
  * types round-trip exactly.
  *
  * Supported: reader protocol v1 (plain parquet files), multi-commit
  * replay, single + multi-part checkpoints, partitioned tables (hive-style
  * layouts read with basePath + explicit schema; non-hive layouts
  * reconstruct partition values from the log per file group).
  * NOT supported — rejected loudly, never silently misread: reader
  * protocol ≥ 2 (column mapping, deletion vectors).
  */
object DeltaNative {

  final case class DeltaReadException(msg: String) extends IllegalArgumentException(msg)

  private val mapper = new ObjectMapper()

  def read(spark: SparkSession, root: String, options: Map[String, String]): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(rootPath, "_delta_log")
    if (!fs.exists(logDir))
      throw DeltaReadException(s"`$root` is not a Delta table: no _delta_log directory")

    // --- resolve the snapshot from the log (driver-side metadata work) ---
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Nil
    var adds = scala.collection.mutable.LinkedHashMap[String, Map[String, String]]()

    def applyProtocol(p: JsonNode): Unit = {
      val v = p.path("minReaderVersion").asInt(1)
      if (v > 1) throw DeltaReadException(
        s"Delta reader protocol version $v requires features (column mapping / " +
          "deletion vectors) this native reader does not implement; install a " +
          "delta connector jar for this table")
    }
    def applyMeta(m: JsonNode): Unit = {
      schemaJson = Some(m.path("schemaString").asText())
      partCols = m.path("partitionColumns").elements().asScala.map(_.asText()).toSeq
    }
    def partValues(a: JsonNode): Map[String, String] =
      a.path("partitionValues").fields().asScala
        .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap

    // checkpoint, if any
    val lastCp = Option(fs.exists(new Path(logDir, "_last_checkpoint")))
      .filter(identity)
      .map { _ =>
        val in = fs.open(new Path(logDir, "_last_checkpoint"))
        val node = try mapper.readTree(in) finally in.close()
        (node.path("version").asLong(), Option(node.path("parts")).filter(!_.isMissingNode).map(_.asInt()))
      }
    lastCp.foreach { case (version, parts) =>
      val names = parts match {
        case Some(n) => (1 to n).map(i => f"$version%020d.checkpoint.$i%010d.$n%010d.parquet")
        case None => Seq(f"$version%020d.checkpoint.parquet")
      }
      val cp = spark.read.parquet(names.map(n => new Path(logDir, n).toString): _*)
      val cols = cp.columns.toSet
      // the checkpoint's add set IS the snapshot at that version (its remove
      // entries are expired tombstones kept for vacuum, not live deletes)
      def rows(c: String): Seq[JsonNode] =
        if (!cols.contains(c)) Nil
        else cp.select(c).filter(col(c).isNotNull).toJSON.collect().toSeq
          .map(s => mapper.readTree(s).path(c))
      rows("protocol").foreach(applyProtocol)
      rows("metaData").foreach(applyMeta)
      rows("add").foreach(a => adds(a.path("path").asText()) = partValues(a))
    }

    // JSON commits after the checkpoint, in version order
    val commitRe = """(\d{20})\.json""".r
    val commits = fs.listStatus(logDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case commitRe(v) if lastCp.forall(_._1 < v.toLong) => Some((v.toLong, st.getPath))
        case _ => None
      })
      .sortBy(_._1)
    if (lastCp.isEmpty && commits.isEmpty)
      throw DeltaReadException(s"`$root`: _delta_log holds no checkpoint and no commits")
    commits.foreach { case (_, path) =>
      val in = fs.open(path)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) applyProtocol(node.path("protocol"))
        if (node.has("metaData")) applyMeta(node.path("metaData"))
        if (node.has("add")) {
          val a = node.path("add")
          adds(a.path("path").asText()) = partValues(a)
        }
        if (node.has("remove")) adds.remove(node.path("remove").path("path").asText())
      }
    }

    val schema = DataType.fromJson(schemaJson.getOrElse(
      throw DeltaReadException(s"`$root`: no metaData action found in the Delta log")))
      .asInstanceOf[StructType]

    def resolve(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      val dp = new Path(decoded)
      (if (dp.isAbsolute) dp else new Path(rootPath, dp)).toString
    }

    // --- distributed data read over the resolved live files ---
    if (adds.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (partCols.isEmpty)
      spark.read.schema(schema).parquet(adds.keys.map(resolve).toSeq: _*)
    else {
      val hiveLayout = adds.keys.forall(p => partCols.forall(c => p.contains(s"$c=")))
      if (hiveLayout)
        // standard writer layout: partition values live in the dir names;
        // explicit schema pins the partition column types Delta declares
        spark.read.schema(schema).option("basePath", root)
          .parquet(adds.keys.map(resolve).toSeq: _*)
      else {
        // non-hive layout: partition values come from the log itself. Read
        // each distinct partition-value group once and attach the values as
        // typed literals (group count = live partitions of the snapshot).
        val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))
        val byPart = adds.toSeq.groupBy(_._2)
        val parts = byPart.map { case (pv, files) =>
          val base = spark.read.schema(dataSchema).parquet(files.map(f => resolve(f._1)): _*)
          partCols.foldLeft(base) { (df, c) =>
            val dt = schema(c).dataType
            df.withColumn(c, lit(pv.getOrElse(c, null)).cast(dt))
          }
        }
        parts.reduce(_ unionByName _).select(schema.fieldNames.map(col).toSeq: _*)
      }
    }
  }
}
