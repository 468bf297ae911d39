package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.secrets.Secrets
import graft.types.TypeMap

/** Lakehouse table registration — the Spark analogue of the reference's
  * `CREATE FOREIGN TABLE ... SERVER fmt OPTIONS (...)` → engine view pipeline
  * (reference: src/fdw/base.rs:216-260 register_duckdb_view, and
  * src/fdw/trigger.rs:55-192 auto schema creation).
  *
  * `attach` is idempotent by table name (re-attach replaces the view, like
  * the reference's drop-stale-view, trigger.rs:139-143). Schema inference is
  * Spark-native: attaching with no declared schema uses the source schema —
  * the reference's `DESCRIBE`+ALTER dance collapses to `.schema`.
  */
object Catalog {

  final case class InvalidOptionException(msg: String) extends IllegalArgumentException(msg)
  final case class ReservedTableNameException(name: String) extends IllegalArgumentException(
    s"table name `$name` is reserved for engine metadata views")

  /** Engine meta-view names rejected as user table names (behavior pinned by
    * the reference's reserved list, src/fdw/trigger.rs:55-72). */
  val reservedNames: Set[String] = Set(
    "duckdb_columns", "duckdb_constraints", "duckdb_databases", "duckdb_dependencies",
    "duckdb_extensions", "duckdb_functions", "duckdb_indexes", "duckdb_keywords",
    "duckdb_optimizers", "duckdb_schemas", "duckdb_secrets", "duckdb_sequences",
    "duckdb_settings", "duckdb_tables", "duckdb_types", "duckdb_views",
    "duckdb_temporary_files")

  /** Register `table` over files of `format`. Returns the attached frame
    * (also visible to SQL as a temp view named `table`).
    *
    * @param userMapping credential options (≙ user mapping → CREATE SECRET)
    * @param schema optional declared schema (≙ typed CREATE FOREIGN TABLE);
    *               column types are validated through TypeMap semantics
    */
  def attach(
      spark: SparkSession,
      table: String,
      format: String,
      options: Map[String, String],
      userMapping: Map[String, String] = Map.empty,
      schema: Option[StructType] = None): DataFrame = {
    if (reservedNames.contains(table.toLowerCase)) throw ReservedTableNameException(table)
    val spec = Formats(format)
    if (!spec.available) throw Formats.UnsupportedFormatException(spec.name)
    validateOptions(spec, options)
    if (userMapping.nonEmpty) Secrets(spark, userMapping)

    val files = split_files(options("files"))
    var df = spec.name match {
      case "parquet" => readParquet(spark, files, options, schema)
      case "csv" => readCsv(spark, files, options, schema)
      case "json" => readJson(spark, files, options, schema)
      case "spatial" => graft.sources.GeoJson.read(spark, files, options)
      case other => throw Formats.UnsupportedFormatException(other)
    }
    df = withMetadataColumns(df, options)
    df = withCasing(df, options)
    options.get("select").foreach { sel => df = df.selectExpr(sel.split(",").map(_.trim): _*) }
    df.createOrReplaceTempView(table)
    df
  }

  /** Drop an attached view (≙ DROP FOREIGN TABLE). */
  def detach(spark: SparkSession, table: String): Boolean =
    spark.catalog.dropTempView(table)

  /** files option: comma-separated path list; each entry may be a glob. */
  def split_files(files: String): Seq[String] =
    files.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def validateOptions(spec: Formats.FormatSpec, options: Map[String, String]): Unit = {
    options.keys.find(k => !spec.validOptions.contains(k.toLowerCase)).foreach { k =>
      throw InvalidOptionException(
        s"invalid option `$k` for format `${spec.name}`; valid options: " +
          spec.validOptions.toSeq.sorted.mkString(", "))
    }
    spec.requiredOptions.find(r => !options.contains(r)).foreach { r =>
      throw InvalidOptionException(s"required option `$r` missing for format `${spec.name}`")
    }
  }

  private def readParquet(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    var r = spark.read.format("parquet")
    if (options.get("union_by_name").exists(_.toBoolean)) r = r.option("mergeSchema", "true")
    if (options.contains("binary_as_string"))
      r = r.option("binaryAsString", options("binary_as_string"))
    // hive_partitioning: Spark discovers hive-style partitions natively when
    // scanning a directory tree; `basePath` pins the partition root.
    options.get("hive_partitioning").foreach { on =>
      if (on.toBoolean && files.nonEmpty) r = r.option("basePath", partitionBase(files.head))
    }
    schema.foreach(s => r = r.schema(s))
    r.load(files: _*)
  }

  private def readCsv(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    var r = spark.read.format("csv")
    val direct = Seq(
      "delim" -> "sep", "quote" -> "quote", "escape" -> "escape", "header" -> "header",
      "nullstr" -> "nullValue", "dateformat" -> "dateFormat",
      "timestampformat" -> "timestampFormat", "compression" -> "compression",
      "new_line" -> "lineSep", "max_line_size" -> "maxCharsPerColumn")
    direct.foreach { case (from, to) => options.get(from).foreach(v => r = r.option(to, v)) }
    if (options.get("ignore_errors").exists(_.toBoolean)) r = r.option("mode", "DROPMALFORMED")
    val allVarchar = options.get("all_varchar").exists(_.toBoolean)
    val autoDetect = options.get("auto_detect").forall(_.toBoolean) && !allVarchar
    r = r.option("inferSchema", (schema.isEmpty && autoDetect).toString)
    // columns option: "name1:TYPE1,name2:TYPE2" declared types (DuckDB names)
    val declared = schema.orElse(options.get("columns").map(parseColumns))
    declared.foreach(s => r = r.option("inferSchema", "false").schema(s))
    val skip = options.get("skip").map(_.toInt).getOrElse(0)
    var df =
      if (skip > 0) {
        // no native skip-N-lines in Spark's csv reader: pre-slice the text
        import spark.implicits._
        val lines = spark.read.textFile(files: _*)
          .rdd.zipWithIndex.filter(_._2 >= skip).map(_._1)
        r.csv(spark.createDataset(lines))
      } else r.load(files: _*)
    if (options.get("normalize_names").exists(_.toBoolean))
      df = df.toDF(df.columns.map(normalizeName): _*)
    options.get("names").foreach { names =>
      val ns = names.split(",").map(_.trim)
      df = df.toDF(df.columns.zipWithIndex.map { case (c, i) =>
        if (i < ns.length) ns(i) else c }: _*)
    }
    df
  }

  private def readJson(spark: SparkSession, files: Seq[String],
      options: Map[String, String], schema: Option[StructType]): DataFrame = {
    var r = spark.read.format("json")
    // format: newline_delimited (default) | array | auto | unstructured
    val fmt = options.getOrElse("format", "newline_delimited")
    if (fmt == "array" || fmt == "auto") r = r.option("multiLine", "true")
    val direct = Seq("dateformat" -> "dateFormat", "timestampformat" -> "timestampFormat",
      "compression" -> "compression")
    direct.foreach { case (from, to) => options.get(from).foreach(v => r = r.option(to, v)) }
    if (options.get("ignore_errors").exists(_.toBoolean)) r = r.option("mode", "DROPMALFORMED")
    if (options.get("convert_strings_to_integers").exists(_.toBoolean))
      r = r.option("primitivesAsString", "false")
    val declared = schema.orElse(options.get("columns").map(parseColumns))
    declared.foreach(s => r = r.schema(s))
    r.load(files: _*)
  }

  /** "name1:TYPE1,name2:TYPE2" (DuckDB type names) → StructType. */
  def parseColumns(spec: String): StructType = {
    val fields = spec.split(",").map(_.trim).filter(_.nonEmpty).map { entry =>
      val Array(n, t) = entry.split(":", 2).map(_.trim)
      org.apache.spark.sql.types.StructField(n, TypeMap.toSpark(t))
    }
    StructType(fields)
  }

  private def withMetadataColumns(df: DataFrame, options: Map[String, String]): DataFrame = {
    var out = df
    if (options.get("filename").exists(_.toBoolean))
      out = out.withColumn("filename", col("_metadata.file_path"))
    if (options.get("file_row_number").exists(_.toBoolean))
      out = out.withColumn("file_row_number", col("_metadata.row_index"))
    out
  }

  /** Column names fold to lowercase unless preserve_casing
    * (reference: src/fdw/trigger.rs:184-189). */
  private def withCasing(df: DataFrame, options: Map[String, String]): DataFrame =
    if (options.get("preserve_casing").exists(_.toBoolean)) df
    else df.toDF(df.columns.map(_.toLowerCase): _*)

  private def normalizeName(n: String): String =
    n.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_+|_+$", "")

  private def partitionBase(path: String): String = {
    // strip trailing glob/partition components to find the scan root
    val noGlob = path.takeWhile(c => c != '*' && c != '?')
    val idx = noGlob.lastIndexOf('/')
    if (idx > 0) noGlob.substring(0, idx) else noGlob
  }
}
