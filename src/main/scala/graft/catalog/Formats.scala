package graft.catalog

/** Format registry — the Spark analogue of the reference's FDW-handler-name →
  * format dispatch (reference: src/fdw/handler.rs:20-71) and its per-format
  * option enums (src/duckdb/{parquet,csv,json,delta,iceberg,spatial}.rs).
  *
  * Each format declares its valid/required option keys; `Catalog.attach`
  * validates with the reference's error shape (unknown option → error listing
  * the valid ones, src/fdw/base.rs:198-214).
  */
object Formats {

  final case class FormatSpec(
      name: String,
      validOptions: Set[String],
      requiredOptions: Set[String],
      /** false when the needed connector jars are absent in this deployment
        * (mirrors the reference's lazy INSTALL failing offline,
        * src/duckdb/connection.rs:130-142). */
      available: Boolean = true)

  /** Options shared by every file format (post-read behaviors). */
  val commonOptions: Set[String] = Set(
    "files", "select", "filename", "file_row_number", "preserve_casing",
    "union_by_name", "hive_partitioning", "hive_types", "hive_types_autocast")

  val parquet: FormatSpec = FormatSpec(
    "parquet",
    commonOptions ++ Set("binary_as_string"),
    Set("files"))

  val csv: FormatSpec = FormatSpec(
    "csv",
    commonOptions ++ Set(
      "delim", "quote", "escape", "header", "columns", "types", "names",
      "nullstr", "dateformat", "timestampformat", "compression", "sample_size",
      "skip", "max_line_size", "new_line", "ignore_errors", "all_varchar",
      "null_padding", "normalize_names", "auto_detect", "auto_type_candidates",
      "decimal_separator", "allow_quoted_nulls", "force_not_null", "parallel"),
    Set("files"))

  // maximum_object_size is NOT accepted: Spark's Jackson parser has no
  // per-object byte cap, and accepting-then-ignoring an option is silent
  // wrongness — attach errors instead (the reference's own behavior for
  // unknown options, src/fdw/base.rs:198-214).
  val json: FormatSpec = FormatSpec(
    "json",
    commonOptions ++ Set(
      "format", "records", "maximum_depth",
      "convert_strings_to_integers", "dateformat", "timestampformat",
      "compression", "columns", "auto_detect", "sample_size", "ignore_errors"),
    Set("files"))

  // Delta and Iceberg are ALWAYS available: jar-present deployments dispatch
  // to the connector DataSource; jar-absent ones fall back to the built-in
  // native log/metadata readers (graft.sources.DeltaNative — reader protocol
  // v1; graft.sources.IcebergNative — v1/v2 append-only snapshots; newer
  // protocol features reject loudly and recommend the connector).
  // version_as_of / snapshot_id: TIME TRAVEL on the native readers (replay
  // the log to a version / pin a snapshot); timestamp_as_of /
  // as_of_timestamp resolve an instant against the commit / snapshot-log
  // history — beyond the reference's latest-snapshot-only scans, standard
  // lakehouse surface
  def delta: FormatSpec = FormatSpec("delta",
    commonOptions ++ Set("version_as_of", "timestamp_as_of", "changes_since",
      "read_change_feed", "starting_version", "ending_version",
      "row_tracking"), Set("files"))
  def iceberg: FormatSpec = FormatSpec(
    "iceberg",
    commonOptions ++ Set("allow_moved_paths", "metadata_compression_codec",
      "skip_schema_inference", "snapshot_id", "as_of_timestamp",
      "changes_since_snapshot", "ref", "row_lineage"),
    Set("files"))

  /** Whether a connector jar is deployed (picks the connector over the
    * native minimal reader — connectors cover the newer protocol features).
    * Probed per attach so a spec can flip via connectorJarDir. */
  private[graft] def deltaConnectorPresent: Boolean = jarPresent("delta", connectorJarDir)
  private[graft] def icebergConnectorPresent: Boolean = jarPresent("iceberg", connectorJarDir)

  // GDAL-driver options (layer selection, driver lists, sibling files,
  // sequential scan) are NOT accepted: this deployment reads GeoJSON +
  // shapefiles natively without GDAL, and accepting-then-ignoring an option
  // is silent wrongness — attach errors listing what IS supported.
  // spatial_filter_box IS accepted (bbox envelope test,
  // functions.WkbEnvelope); spatial_filter IS accepted for POLYGON WKT
  // over Point layers (exact even-odd test, functions.WktFilter) and
  // rejects loudly for other geometry kinds.
  val spatial: FormatSpec = FormatSpec(
    "spatial",
    commonOptions ++ Set("keep_wkb", "spatial_filter_box", "spatial_filter",
      "layer", "sequential_layer_scan", "allowed_drivers", "open_options",
      "sibling_files"),
    Set("files"))

  // WARC (ISO 28500) — the crawl-archive container; native streaming
  // record parser (sources/Warc.scala). record_type filters (e.g.
  // 'response'); max_payload_bytes bounds per-record executor memory.
  val warc: FormatSpec = FormatSpec(
    "warc",
    Set("files", "record_type", "max_payload_bytes"),
    Set("files"))

  // ORC — Spark's built-in columnar reader (predicate pushdown + column
  // pruning come free); beyond the reference surface.
  val orc: FormatSpec = FormatSpec(
    "orc",
    commonOptions,
    Set("files"))

  // Avro Object Container Files — native sync-split reader on avro-core
  // (sources/AvroFile.scala; no spark-avro connector in this deployment).
  val avro: FormatSpec = FormatSpec(
    "avro",
    Set("files", "select", "filename", "file_row_number", "preserve_casing"),
    Set("files"))

  def all: Map[String, FormatSpec] = Seq(parquet, csv, json, delta, iceberg,
    spatial, warc, orc, avro).map(f => f.name -> f).toMap

  /** Deployment jar dir the capability probe inspects — a var only so specs
    * can substitute a synthetic dir and assert both sides of the gate. */
  @volatile private[graft] var connectorJarDir: String = "/opt/spark/jars"

  /** Classpath probe: a connector format is available iff a jar carrying its
    * marker is on the deployment's jar dir (reference analogue: lazy INSTALL
    * of the extension failing offline, src/duckdb/connection.rs:130-142).
    * Package-visible with an explicit dir so the flip logic is spec-testable
    * against a synthetic jar dir. */
  private[graft] def jarPresent(marker: String,
      jarDir: String = "/opt/spark/jars"): Boolean = {
    val dir = new java.io.File(jarDir)
    dir.isDirectory && dir.listFiles().exists(_.getName.toLowerCase.contains(marker))
  }

  final case class UnknownFormatException(name: String) extends IllegalArgumentException(
    s"unknown format `$name`; valid formats: ${all.keys.toSeq.sorted.mkString(", ")}")
  final case class UnsupportedFormatException(name: String) extends UnsupportedOperationException(
    s"format `$name` requires connector jars not present in this deployment")

  def apply(name: String): FormatSpec =
    all.getOrElse(name.toLowerCase, throw UnknownFormatException(name))
}
