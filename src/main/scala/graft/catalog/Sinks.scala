package graft.catalog

import org.apache.spark.sql.DataFrame

/** Write-side surface — the `COPY (SELECT ...) TO 'file' (FORMAT ...)`
  * analogue. The reference passes COPY through to the engine untouched
  * (src/hooks/executor.rs:58-61, test tests/tests/scan.rs:315-333); here the
  * engine is Spark, so COPY maps onto DataFrameWriter with the same
  * validated-options contract as attach (unknown option → error listing the
  * valid ones, src/fdw/base.rs:198-214).
  *
  * Scale note: `partition_by` is the 100 TB lever — it lays the output out
  * for partition-pruned downstream scans; `overwrite` maps to dynamic
  * overwrite of matched partitions only when partitioning is present.
  */
object Sinks {

  val validOptions: Map[String, Set[String]] = Map(
    "parquet" -> Set("compression", "partition_by", "overwrite", "max_file_size_rows",
      "bucket_by", "buckets", "sort_by", "table",
      "bloom_filter_columns", "bloom_filter_ndv"),
    "csv" -> Set("header", "delim", "quote", "escape", "nullstr", "compression",
      "partition_by", "overwrite", "dateformat", "timestampformat"),
    "json" -> Set("compression", "partition_by", "overwrite", "dateformat", "timestampformat"),
    "orc" -> Set("compression", "partition_by", "overwrite", "max_file_size_rows"))

  def copyTo(df: DataFrame, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    // FORMAT delta → the native Delta writer (protocol commit JSON, true
    // sizes, footer-derived add.stats; see DeltaSink)
    if (format.equalsIgnoreCase("delta")) return DeltaSink.write(df, path, options)
    // FORMAT iceberg → the native Iceberg writer (metadata.json + Avro
    // manifests with field-id parquet; see IcebergSink)
    if (format.equalsIgnoreCase("iceberg")) return IcebergSink.write(df, path, options)
    // FORMAT warc → the native WARC writer (one archive file per
    // partition, HTTP response records; see sources/Warc)
    if (format.equalsIgnoreCase("warc"))
      return graft.sources.Warc.write(df, path, options)
    // FORMAT gpkg → the native GeoPackage writer (single-file SQLite
    // container, driver-side with a loud row guard; see sources/GeoPackage)
    if (format.equalsIgnoreCase("gpkg"))
      return graft.sources.GeoPackage.write(df, path, options)
    // FORMAT xlsx → the native OOXML workbook writer (single-file zip,
    // driver-side with the spec's sheet row cap; see sources/Xlsx)
    if (format.equalsIgnoreCase("xlsx"))
      return graft.sources.Xlsx.write(df, path, options)
    // FORMAT avro → the native container writer (one sync-splittable
    // container per partition; see sources/AvroFile)
    if (format.equalsIgnoreCase("avro"))
      return graft.sources.AvroFile.write(df, path, options)
    val valid = validOptions.getOrElse(format.toLowerCase,
      throw Formats.UnknownFormatException(format))
    options.keys.find(k => !valid.contains(k.toLowerCase)).foreach { k =>
      throw Catalog.InvalidOptionException(
        s"invalid COPY option `$k` for format `$format`; valid options: " +
          valid.toSeq.sorted.mkString(", "))
    }
    var w = df.write.format(format.toLowerCase)
    val direct = Seq(
      "header" -> "header", "delim" -> "sep", "quote" -> "quote",
      "escape" -> "escape", "nullstr" -> "nullValue", "compression" -> "compression",
      "dateformat" -> "dateFormat", "timestampformat" -> "timestampFormat")
    direct.foreach { case (from, to) => options.get(from).foreach(v => w = w.option(to, v)) }
    options.get("max_file_size_rows").foreach(v => w = w.option("maxRecordsPerFile", v))
    // bloom_filter_columns: write parquet BLOOM FILTER indexes for the named
    // columns — the point-lookup lever at 100 TB: row groups whose stats and
    // dictionary cannot exclude a probed value (high-cardinality, unsorted
    // keys) still skip on the bloom's definite-no, so a needle query reads
    // metadata instead of data (skipping receipt pinned in SinksUdfSpec).
    // bloom_filter_ndv sizes the filters (expected distinct values per
    // column); unset leaves parquet-mr's default.
    // (format dispatch above + validOptions guarantee parquet here:
    // bloom_filter_columns is only in parquet's valid set)
    options.get("bloom_filter_columns").foreach { cols =>
      val names = cols.split(",").map(_.trim).filter(_.nonEmpty)
      if (names.isEmpty) throw Catalog.InvalidOptionException(
        "bloom_filter_columns: no column names given")
      // parquet-mr silently ignores bloom conf for columns that don't
      // exist — a typo'd name would write an unindexed file that every
      // point lookup then full-scans. Loud beats lossy.
      val have = df.schema.fieldNames.toSet
      names.find(!have.contains(_)).foreach(c =>
        throw Catalog.InvalidOptionException(
          s"bloom_filter_columns: `$c` is not a column of the written frame " +
            s"(have: ${have.toSeq.sorted.mkString(", ")})"))
      names.foreach { c =>
        w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        options.get("bloom_filter_ndv").foreach(n =>
          w = w.option(s"parquet.bloom.filter.expected.ndv#$c", n))
      }
    }
    if (options.contains("bloom_filter_ndv") && !options.contains("bloom_filter_columns"))
      throw Catalog.InvalidOptionException(
        "bloom_filter_ndv requires `bloom_filter_columns`: without it the " +
          "sizing would be silently ignored")
    val partitioned = options.get("partition_by").exists(_.trim.nonEmpty)
    options.get("partition_by").foreach { cols =>
      w = w.partitionBy(cols.split(",").map(_.trim).filter(_.nonEmpty): _*)
    }
    if (options.get("overwrite").exists(_.toBoolean)) {
      // Partitioned overwrite replaces only the partitions present in the
      // incoming frame (dynamic mode); Spark's default static mode would
      // truncate the ENTIRE target path, silently deleting unrelated
      // partitions of a 100 TB layout.
      if (partitioned) w = w.option("partitionOverwriteMode", "dynamic")
      w = w.mode("overwrite")
    }
    // bucket_by: the co-located-join lever. Bucketed layouts pre-shuffle the
    // data once at write time; two tables bucketed the same way then join
    // with NO Exchange on either side (plan-pinned in SinksUdfSpec) — at
    // 100 TB that deletes the dominant cost of every repeated fact-fact
    // join. Spark only records bucket metadata through the session catalog,
    // so this path requires `table` (and `path` still pins the location).
    // The companions are only meaningful WITH bucket_by — accepting them
    // alone would validate, run, and silently write an unbucketed/unsorted
    // layout, the accepting-then-ignoring wrongness rejected above.
    if (options.get("bucket_by").forall(_.trim.isEmpty)) {
      Seq("sort_by", "buckets", "table").filter(options.contains).foreach { k =>
        throw Catalog.InvalidOptionException(
          s"COPY option `$k` requires `bucket_by`: without bucketing Spark would " +
            "silently ignore it and write a plain layout")
      }
    }
    options.get("bucket_by").map(_.trim).filter(_.nonEmpty) match {
      case Some(bucketCol) =>
        val n = options.getOrElse("buckets",
          throw Catalog.InvalidOptionException("bucket_by requires `buckets` (bucket count)")).toInt
        val table = options.getOrElse("table",
          throw Catalog.InvalidOptionException(
            "bucket_by requires `table`: Spark keeps bucket metadata in the session " +
              "catalog, a bare-path write would silently lose the bucketing"))
        w = w.option("path", path).bucketBy(n, bucketCol)
        val sortCols = options.get("sort_by").toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
        w.saveAsTable(table)
        // Sidecar: the session catalog is the ONLY place Spark keeps bucket
        // metadata, and an in-memory catalog dies with the session — a
        // re-attach of the same path would silently read plain parquet and
        // re-Exchange every join. Persist the bucket spec next to the data
        // (underscore prefix: invisible to plain parquet scans) so
        // Catalog.attach can re-register the layout in ANY later session.
        val partCols = options.get("partition_by").toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        // Jackson, not string interpolation: a quote or backslash in a
        // column name must serialize as valid JSON, or every later attach
        // of this path dies parsing the sidecar
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val spec = mapper.createObjectNode()
        spec.put("bucket_by", bucketCol)
        spec.put("buckets", n)
        val sortArr = spec.putArray("sort_by"); sortCols.foreach(sortArr.add)
        val partArr = spec.putArray("partition_by"); partCols.foreach(partArr.add)
        // explicit type param: Jackson's generic set[T] must not infer T
        // from an ascribed expected type
        spec.set[com.fasterxml.jackson.databind.JsonNode](
          "schema", mapper.readTree(df.schema.json))
        val sidecar = mapper.writeValueAsString(spec)
        val sp = new org.apache.hadoop.fs.Path(path, BucketSidecar)
        val fs = sp.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
        val out = fs.create(sp, true)
        try out.write(sidecar.getBytes("UTF-8")) finally out.close()
      case None => w.save(path)
    }
  }

  /** Bucket-spec sidecar file name (see copyTo's bucketed branch). */
  val BucketSidecar = "_graft_bucket_spec.json"
}
