package graft

import graft.catalog.{Catalog, Formats}
import org.apache.spark.sql.types._

class CatalogSpec extends SparkSpec {

  private lazy val dir = tempDir("catalog")
  private lazy val csvPath = writeText(dir, "people.csv",
    "Name,Age,Score\nalice,30,1.5\nbob,25,2.5\ncarol,35,3.5\n")
  private lazy val jsonlPath = writeText(dir, "people.jsonl",
    """{"name":"alice","age":30}
      |{"name":"bob","age":25}
      |""".stripMargin)
  private lazy val jsonArrayPath = writeText(dir, "people.json",
    """[{"name":"alice","age":30},{"name":"bob","age":25}]""")

  test("attach parquet registers a queryable view") {
    val df = Catalog.attach(spark, "li_attach", "parquet",
      Map("files" -> s"$sf/lineitem.parquet"))
    assert(df.count() > 0)
    assert(spark.sql("SELECT count(*) FROM li_attach").head().getLong(0) === df.count())
    Catalog.detach(spark, "li_attach")
  }

  test("attach csv with header + inference") {
    val df = Catalog.attach(spark, "people_csv", "csv",
      Map("files" -> csvPath, "header" -> "true"))
    assert(df.columns.toSeq === Seq("name", "age", "score")) // lowercased by default
    assert(df.schema("age").dataType === IntegerType)
    assert(df.count() === 3)
  }

  test("preserve_casing keeps source column names") {
    val df = Catalog.attach(spark, "people_cased", "csv",
      Map("files" -> csvPath, "header" -> "true", "preserve_casing" -> "true"))
    assert(df.columns.toSeq === Seq("Name", "Age", "Score"))
  }

  test("csv declared columns override inference (DuckDB type names)") {
    val df = Catalog.attach(spark, "people_typed", "csv",
      Map("files" -> csvPath, "header" -> "true",
        "columns" -> "name:VARCHAR,age:SMALLINT,score:DOUBLE"))
    assert(df.schema("age").dataType === ShortType)
    assert(df.schema("score").dataType === DoubleType)
  }

  test("csv all_varchar disables inference") {
    val df = Catalog.attach(spark, "people_varchar", "csv",
      Map("files" -> csvPath, "header" -> "true", "all_varchar" -> "true"))
    assert(df.schema.fields.forall(_.dataType === StringType))
  }

  test("csv skip slices leading lines") {
    val df = Catalog.attach(spark, "people_skip", "csv",
      Map("files" -> csvPath, "skip" -> "2", "header" -> "false"))
    assert(df.count() === 2) // bob, carol
  }

  test("json newline-delimited and array formats") {
    val dl = Catalog.attach(spark, "people_jsonl", "json", Map("files" -> jsonlPath))
    assert(dl.count() === 2)
    val da = Catalog.attach(spark, "people_jsonarr", "json",
      Map("files" -> jsonArrayPath, "format" -> "array"))
    assert(da.count() === 2)
  }

  test("filename and file_row_number metadata columns") {
    val df = Catalog.attach(spark, "li_meta", "parquet",
      Map("files" -> s"$sf/region.parquet", "filename" -> "true", "file_row_number" -> "true"))
    assert(df.columns.contains("filename"))
    assert(df.columns.contains("file_row_number"))
    assert(df.select("filename").head().getString(0).contains("region.parquet"))
  }

  test("select option projects columns") {
    val df = Catalog.attach(spark, "li_proj", "parquet",
      Map("files" -> s"$sf/lineitem.parquet", "select" -> "l_orderkey, l_quantity"))
    assert(df.columns.toSeq === Seq("l_orderkey", "l_quantity"))
  }

  test("multi-file list attaches as one table") {
    val df = Catalog.attach(spark, "multi", "parquet",
      Map("files" -> s"$sf/region.parquet,$sf/region.parquet"))
    assert(df.count() === 2 * spark.read.parquet(s"$sf/region.parquet").count())
  }

  test("unknown option errors and lists valid options") {
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "bad", "parquet",
        Map("files" -> "x.parquet", "bogus_option" -> "1"))
    }
    assert(e.getMessage.contains("bogus_option"))
    assert(e.getMessage.contains("valid options"))
  }

  test("missing required option errors") {
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "bad2", "parquet", Map("binary_as_string" -> "true"))
    }
    assert(e.getMessage.contains("files"))
  }

  test("missing files error at first action (reference: 'No files found' at attach)") {
    // FIXTURES.md §6: attach of invalid_file.parquet must surface a clear
    // path error, not an empty table
    val df = intercept[Exception] {
      Catalog.attach(spark, "ghost", "parquet",
        Map("files" -> s"$dir/invalid_file.parquet")).collect()
    }
    assert(df.getMessage.toLowerCase.matches("(?s).*(path|found|exist).*"))
  }

  test("reserved table names rejected") {
    intercept[Catalog.ReservedTableNameException] {
      Catalog.attach(spark, "duckdb_tables", "parquet", Map("files" -> "x.parquet"))
    }
  }

  test("unknown format errors; unavailable format capability-gated") {
    intercept[Formats.UnknownFormatException] {
      Catalog.attach(spark, "t", "orc_nope", Map("files" -> "x"))
    }
    // delta/iceberg jars are absent in this container
    if (!Formats.delta.available) {
      intercept[Formats.UnsupportedFormatException] {
        Catalog.attach(spark, "t", "delta", Map("files" -> "x"))
      }
    }
  }

  // ---------------------------------------------------- option semantics
  // Every attach option either has an observable effect (tested here) or is
  // rejected at attach — none validate-then-no-op (VERDICT r1 item 1).

  test("csv sample_size bounds schema inference to a row prefix") {
    val p = writeText(dir, "sampled.csv", "v\n1\n2\n3\nnot_a_number\n")
    val full = Catalog.attach(spark, "sampled_full", "csv",
      Map("files" -> p, "header" -> "true"))
    assert(full.schema("v").dataType === StringType) // full inference sees the string
    val sampled = Catalog.attach(spark, "sampled_3", "csv",
      Map("files" -> p, "header" -> "true", "sample_size" -> "3"))
    assert(sampled.schema("v").dataType === IntegerType) // prefix-only inference
    assert(sampled.count() === 4) // the non-numeric row reads as NULL (permissive)
  }

  test("json sample_size bounds schema inference to a line prefix") {
    val p = writeText(dir, "sampled.jsonl",
      """{"a":1}
        |{"a":2}
        |{"a":3,"b":"late-column"}
        |""".stripMargin)
    val full = Catalog.attach(spark, "jsampled_full", "json", Map("files" -> p))
    assert(full.columns.toSeq.sorted === Seq("a", "b")) // full inference sees b
    val sampled = Catalog.attach(spark, "jsampled_2", "json",
      Map("files" -> p, "sample_size" -> "2"))
    assert(sampled.columns.toSeq === Seq("a")) // prefix-only inference
    assert(sampled.count() === 3)
  }

  test("json auto_detect false requires declared columns") {
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "jnodetect", "json",
        Map("files" -> jsonlPath, "auto_detect" -> "false"))
    }
    assert(e.getMessage.contains("auto_detect"))
    val df = Catalog.attach(spark, "jnodetect_ok", "json",
      Map("files" -> jsonlPath, "auto_detect" -> "false",
        "columns" -> "name:VARCHAR,age:BIGINT"))
    assert(df.schema("age").dataType === LongType)
    assert(df.count() === 2)
  }

  test("compression is honored by verification: matching .gz reads, mismatch errors") {
    val gz = new java.io.File(dir, "people.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
    out.write("name,age\nalice,30\nbob,25\n".getBytes("UTF-8")); out.close()
    // matching extension: accepted, and extension detection decompresses
    val df = Catalog.attach(spark, "gz_csv", "csv",
      Map("files" -> gz.getPath, "header" -> "true", "compression" -> "gzip"))
    assert(df.count() === 2)
    // 'auto' is always acceptable — it IS the engine behavior
    assert(Catalog.attach(spark, "gz_auto", "csv",
      Map("files" -> gz.getPath, "header" -> "true", "compression" -> "auto")).count() === 2)
    // gzip requested for an extension-less file: would parse garbage → error
    val e1 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "gz_bad", "csv",
        Map("files" -> csvPath, "header" -> "true", "compression" -> "gzip"))
    }
    assert(e1.getMessage.contains("extension"))
    // 'none' on a .gz file: engine would decompress anyway → error
    val e2 = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "gz_none", "csv",
        Map("files" -> gz.getPath, "header" -> "true", "compression" -> "none"))
    }
    assert(e2.getMessage.contains("compressed extension"))
    // json path shares the enforcement
    intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "gz_json", "json",
        Map("files" -> jsonlPath, "compression" -> "zstd"))
    }
  }

  test("delta/iceberg capability gate: documented error + jar-probe flip") {
    // gate error shape when jars are absent (this container has none)
    if (!Formats.delta.available) {
      val e = intercept[Formats.UnsupportedFormatException] {
        Catalog.attach(spark, "gate_delta", "delta", Map("files" -> "x"))
      }
      assert(e.getMessage.contains("connector jars not present"))
    }
    // the probe flips on a jar dir containing a marker jar
    val jars = tempDir("fakejars")
    assert(!Formats.jarPresent("delta", jars.getPath))
    new java.io.File(jars, "delta-spark_2.13-3.0.0.jar").createNewFile()
    assert(Formats.jarPresent("delta", jars.getPath))
    assert(!Formats.jarPresent("iceberg", jars.getPath))
    new java.io.File(jars, "iceberg-spark-runtime.jar").createNewFile()
    assert(Formats.jarPresent("iceberg", jars.getPath))
  }

  test("csv hive_partitioning surfaces partition columns from the directory tree") {
    val root = tempDir("csv_hive")
    new java.io.File(root, "part=a").mkdirs()
    new java.io.File(root, "part=b").mkdirs()
    writeText(new java.io.File(root, "part=a"), "d.csv", "x\n1\n2\n")
    writeText(new java.io.File(root, "part=b"), "d.csv", "x\n3\n")
    val df = Catalog.attach(spark, "csv_hive", "csv",
      Map("files" -> s"${root.getPath}/*/*.csv", "header" -> "true",
        "hive_partitioning" -> "true"))
    assert(df.columns.toSeq.sorted === Seq("part", "x"))
    assert(df.filter("part = 'a'").count() === 2)
  }

  test("csv auto_type_candidates restricts inferred types") {
    val df = Catalog.attach(spark, "cand", "csv",
      Map("files" -> csvPath, "header" -> "true",
        "auto_type_candidates" -> "DOUBLE,VARCHAR"))
    assert(df.schema("age").dataType === StringType)   // INT not a candidate
    assert(df.schema("score").dataType === DoubleType) // DOUBLE is
  }

  test("csv null_padding pads short rows; false makes them errors") {
    val p = writeText(dir, "short.csv", "a,b,c\n1,2,3\n4,5\n")
    val padded = Catalog.attach(spark, "padded", "csv",
      Map("files" -> p, "header" -> "true"))
    assert(padded.count() === 2)
    assert(padded.filter("c IS NULL").count() === 1)
    val strict = Catalog.attach(spark, "strict", "csv",
      Map("files" -> p, "header" -> "true", "null_padding" -> "false"))
    // count() prunes every column and parses nothing; force real parsing
    intercept[Exception] { strict.select("a", "b", "c").collect() }
  }

  test("csv decimal_separator translates before cast") {
    val p = writeText(dir, "decsep.csv", "x;y\n1;2,5\n2;3,25\n")
    val df = Catalog.attach(spark, "decsep", "csv",
      Map("files" -> p, "header" -> "true", "delim" -> ";",
        "columns" -> "x:INTEGER,y:DOUBLE", "decimal_separator" -> ","))
    assert(df.schema("y").dataType === DoubleType)
    assert(df.orderBy("x").collect().map(_.getDouble(1)).toSeq === Seq(2.5, 3.25))
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "decsep_bad", "csv",
        Map("files" -> p, "header" -> "true", "decimal_separator" -> ","))
    }
    assert(e.getMessage.contains("columns"))
  }

  test("csv allow_quoted_nulls=false keeps quoted empties literal") {
    val p = writeText(dir, "qnull.csv", "a,b\nx,\"\"\ny,z\n")
    // DuckDB default (true): quoted "" reads as NULL — Spark's behavior too
    val default = Catalog.attach(spark, "qnull_default", "csv",
      Map("files" -> p, "header" -> "true"))
    assert(default.filter("b IS NULL").count() === 1)
    val strict = Catalog.attach(spark, "qnull_false", "csv",
      Map("files" -> p, "header" -> "true", "allow_quoted_nulls" -> "false"))
    assert(strict.filter("b = ''").count() === 1)
    assert(strict.filter("b IS NULL").count() === 0)
  }

  test("csv force_not_null keeps the null-string literal") {
    val p = writeText(dir, "fnn.csv", "a,b\n1,\n2,x\n")
    val df = Catalog.attach(spark, "fnn", "csv",
      Map("files" -> p, "header" -> "true", "all_varchar" -> "true",
        "force_not_null" -> "b"))
    assert(df.filter("b IS NULL").count() === 0)
    assert(df.filter("b = ''").count() === 1)
  }

  test("csv parallel=false reads single-stream") {
    val df = Catalog.attach(spark, "serial", "csv",
      Map("files" -> csvPath, "header" -> "true", "parallel" -> "false"))
    assert(df.rdd.getNumPartitions === 1)
  }

  test("csv types overrides individual columns on top of inference") {
    val df = Catalog.attach(spark, "typed_over", "csv",
      Map("files" -> csvPath, "header" -> "true", "types" -> "age:VARCHAR"))
    assert(df.schema("age").dataType === StringType)
    assert(df.schema("score").dataType === DoubleType) // others keep inference
  }

  test("csv skip is per-file across a multi-file list") {
    val p1 = writeText(dir, "skip1.csv", "junk\njunk\na,b\n1,2\n3,4\n")
    val p2 = writeText(dir, "skip2.csv", "junk\njunk\na,b\n5,6\n")
    val df = Catalog.attach(spark, "skip_multi", "csv",
      Map("files" -> s"$p1,$p2", "skip" -> "2", "header" -> "true"))
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.count() === 3) // headers + junk of BOTH files are gone
  }

  test("csv skip>0 multi-file attach issues O(1) jobs, not O(files)") {
    // 12 files, each forced to several input splits (tiny maxPartitionBytes)
    // so the block_start>0 run logic is exercised and any regression to
    // per-file slicing (zipWithIndex count job per file) trips the job cap.
    val files = (0 until 12).map(i =>
      writeText(dir, s"skj$i.csv", s"junk line\na,b\n$i,${i * 2}\nx$i,y$i\n"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Catalog.attach(spark, "skip_jobs", "csv",
        Map("files" -> files.mkString(","), "skip" -> "1", "header" -> "true"))
      assert(df.columns.toSeq === Seq("a", "b"))
      assert(df.count() === 24) // 2 data rows per file; junk + header gone
      // let the async listener bus drain before reading the counter
      var waited = 0
      var last = -1
      while (waited < 2000 && last != jobs.get) { last = jobs.get; Thread.sleep(100); waited += 100 }
      assert(jobs.get <= 8,
        s"expected O(1) jobs for a 12-file skip attach+count, got ${jobs.get}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
  }

  test("csv skip+filename multi-file attach issues O(1) jobs, not O(files)") {
    // the r4 gap: filename=true used to fall back to per-file slicing
    // (2 jobs per file); it now rides the same one-pass _metadata slice
    val files = (0 until 12).map(i =>
      writeText(dir, s"skf_j$i.csv", s"junk line\na,b\n$i,${i * 2}\nx$i,y$i\n"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Catalog.attach(spark, "skip_fn_jobs", "csv",
        Map("files" -> files.mkString(","), "skip" -> "1", "header" -> "true",
          "filename" -> "true"))
      assert(df.columns.toSeq === Seq("a", "b", "filename"))
      assert(df.count() === 24)
      assert(df.select("filename").distinct().count() === 12) // every file tagged
      var waited = 0
      var last = -1
      while (waited < 2000 && last != jobs.get) { last = jobs.get; Thread.sleep(100); waited += 100 }
      // constant budget: inference limit + header probe + 2 counted actions
      // (~11 jobs); the legacy per-file path spent 2 jobs PER FILE (24+ here)
      assert(jobs.get <= 14,
        s"expected O(1) jobs for a 12-file skip+filename attach+count, got ${jobs.get}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("PathKeys: driver and executor key forms agree across filesystems") {
    import graft.sources.PathKeys
    // the object-store hazard: URIs carry an authority that Path.toUri.getPath
    // drops — both sides must keep it or every delete/partition lookup misses
    for ((uri, expected) <- Seq(
      "s3a://bucket/wh/data/f.parquet" -> "/bucket/wh/data/f.parquet",
      "hdfs://nn:8020/wh/f.parquet" -> "/nn:8020/wh/f.parquet",
      "file:///tmp/x/f.parquet" -> "/tmp/x/f.parquet",
      "file:/tmp/x/f.parquet" -> "/tmp/x/f.parquet",
      "/tmp/x/f.parquet" -> "/tmp/x/f.parquet")) {
      assert(PathKeys.key(uri) === expected, s"driver key of $uri")
      val colSide = spark.range(1)
        .select(PathKeys.keyCol(org.apache.spark.sql.functions.lit(uri)))
        .head().getString(0)
      assert(colSide === expected, s"executor key of $uri")
    }
  }

  test("csv skip composes with filename metadata; file_row_number rejects") {
    val p1 = writeText(dir, "skf1.csv", "junk\na,b\n1,2\n")
    val p2 = writeText(dir, "skf2.csv", "junk\na,b\n5,6\n")
    val df = Catalog.attach(spark, "skip_fn", "csv",
      Map("files" -> s"$p1,$p2", "skip" -> "1", "header" -> "true", "filename" -> "true"))
    assert(df.columns.toSeq === Seq("a", "b", "filename"))
    val byFile = df.groupBy("filename").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile(p1) === 1L && byFile(p2) === 1L)
    intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "skip_frn", "csv",
        Map("files" -> p1, "skip" -> "1", "header" -> "true", "file_row_number" -> "true"))
    }
  }

  test("csv union_by_name aligns differing file schemas by name") {
    val p1 = writeText(dir, "ub1.csv", "a,b\n1,x\n")
    val p2 = writeText(dir, "ub2.csv", "b,a,c\ny,2,extra\n")
    val byName = Catalog.attach(spark, "ub_name", "csv",
      Map("files" -> s"$p1,$p2", "header" -> "true", "union_by_name" -> "true"))
    assert(byName.columns.toSeq.sorted === Seq("a", "b", "c"))
    val rows = byName.orderBy("a").collect()
    assert(rows(0).getAs[String]("b") === "x")
    assert(rows(1).getAs[String]("b") === "y")
    assert(rows(0).getAs[String]("c") === null) // missing column padded
  }

  test("json format=unstructured parses values spanning lines") {
    val p = writeText(dir, "pretty.json",
      "{\n  \"name\": \"alice\",\n  \"age\": 30\n}")
    val df = Catalog.attach(spark, "pretty_json", "json",
      Map("files" -> p, "format" -> "unstructured"))
    assert(df.count() === 1)
    assert(df.select("name").head().getString(0) === "alice")
  }

  test("json records=false keeps values in one json column") {
    val df = Catalog.attach(spark, "raw_json", "json",
      Map("files" -> jsonlPath, "records" -> "false"))
    assert(df.columns.toSeq === Seq("json"))
    assert(df.count() === 2)
    assert(df.head().getString(0).contains("\"alice\""))
  }

  test("json maximum_depth leaves deep subtrees as raw JSON text") {
    val p = writeText(dir, "deep.jsonl",
      """{"id":1,"meta":{"inner":{"x":1}}}""" + "\n")
    val full = Catalog.attach(spark, "deep_full", "json", Map("files" -> p))
    assert(full.schema("meta").dataType.isInstanceOf[StructType])
    val cut = Catalog.attach(spark, "deep_cut", "json",
      Map("files" -> p, "maximum_depth" -> "1"))
    assert(cut.schema("meta").dataType === StringType)
    assert(cut.head().getAs[String]("meta").contains("\"inner\""))
  }

  test("json maximum_object_size is rejected, not ignored") {
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "mos", "json",
        Map("files" -> jsonlPath, "maximum_object_size" -> "1048576"))
    }
    assert(e.getMessage.contains("maximum_object_size"))
  }

  test("json convert_strings_to_integers re-types integral strings") {
    val p = writeText(dir, "strint.jsonl",
      """{"n":"123","s":"abc"}""" + "\n" + """{"n":"456","s":"789x"}""" + "\n")
    val off = Catalog.attach(spark, "strint_off", "json", Map("files" -> p))
    assert(off.schema("n").dataType === StringType)
    val on = Catalog.attach(spark, "strint_on", "json",
      Map("files" -> p, "convert_strings_to_integers" -> "true"))
    assert(on.schema("n").dataType === LongType)
    assert(on.schema("s").dataType === StringType)
    assert(on.orderBy("n").head().getLong(0) === 123L)
  }

  test("parquet hive_types casts partition columns; autocast=0 disables inference") {
    val hp = new java.io.File(dir, "hp")
    spark.range(3).toDF("id").write.mode("overwrite").parquet(s"$hp/p=5")
    val auto = Catalog.attach(spark, "hp_auto", "parquet", Map("files" -> hp.getAbsolutePath))
    assert(auto.schema("p").dataType === IntegerType) // native autocast
    val off = Catalog.attach(spark, "hp_off", "parquet",
      Map("files" -> hp.getAbsolutePath, "hive_types_autocast" -> "0"))
    assert(off.schema("p").dataType === StringType)
    val typed = Catalog.attach(spark, "hp_typed", "parquet",
      Map("files" -> hp.getAbsolutePath, "hive_types" -> "p:BIGINT"))
    assert(typed.schema("p").dataType === LongType)
  }

  test("convert_strings_to_integers: late non-integral value errors loudly, never NULLs") {
    import spark.implicits._
    // sample (first 2 rows) looks integral; row 3 is not — the cast must
    // raise, not silently corrupt the column to NULL
    val df = Seq("1", "2", "oops").toDF("n")
    val cast = Catalog.integerizeStrings(df, sampleRows = 2)
    assert(cast.schema("n").dataType === LongType)
    val e = intercept[Exception] { cast.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-integral value in column `n`")), e.getMessage)
  }

  test("convert_strings_to_integers: beyond-Long digits keep the column a string") {
    import spark.implicits._
    // 20+ digit integers would overflow a BIGINT cast to NULL; the bounded
    // regex must treat them as non-integral instead
    val df = Seq("1", "99999999999999999999999").toDF("n")
    val out = Catalog.integerizeStrings(df, sampleRows = 10)
    assert(out.schema("n").dataType === StringType)
  }

  test("re-attach replaces the view (idempotent by name)") {
    Catalog.attach(spark, "idem", "parquet", Map("files" -> s"$sf/region.parquet"))
    val n1 = spark.sql("SELECT count(*) FROM idem").head().getLong(0)
    Catalog.attach(spark, "idem", "parquet", Map("files" -> s"$sf/nation.parquet"))
    val n2 = spark.sql("SELECT count(*) FROM idem").head().getLong(0)
    assert(n1 !== n2)
  }
}
