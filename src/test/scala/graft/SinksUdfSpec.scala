package graft

import graft.catalog.{Catalog, Sinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders

/** Write-side COPY analogue + the UDF/UDAF registration surface
  * (SURVEY §2.2: `spark.udf.register`, `Aggregator`). */
class SinksUdfSpec extends SparkSpec {

  test("copyTo csv honors dialect options and round-trips") {
    Catalog.attach(spark, "sk_nation", "parquet", Map("files" -> s"$sf/nation.parquet"))
    val out = new java.io.File(tempDir("sink"), "nation_csv").getAbsolutePath
    Sinks.copyTo(spark.table("sk_nation"), out, "csv",
      Map("header" -> "true", "delim" -> "|", "overwrite" -> "true"))
    val back = Catalog.attach(spark, "sk_nation_back", "csv",
      Map("files" -> s"$out/*.csv", "header" -> "true", "delim" -> "|"))
    assert(back.count() === 25)
    assert(back.columns.toSeq === spark.table("sk_nation").columns.toSeq)
  }

  test("copyTo bucket_by: co-located tables join with zero Exchange") {
    val wh = tempDir("bucketed")
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val items = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    Sinks.copyTo(orders, s"$wh/orders_b", "parquet", Map(
      "bucket_by" -> "o_orderkey", "buckets" -> "4", "sort_by" -> "o_orderkey",
      "table" -> "sk_orders_bucketed", "overwrite" -> "true"))
    Sinks.copyTo(items, s"$wh/items_b", "parquet", Map(
      "bucket_by" -> "l_orderkey", "buckets" -> "4", "sort_by" -> "l_orderkey",
      "table" -> "sk_items_bucketed", "overwrite" -> "true"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("sk_orders_bucketed")
        .join(spark.table("sk_items_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point of the bucketed layout: the write pre-shuffled both
      // sides once, so the repeated join carries NO Exchange at all
      assert(!plan.contains("Exchange"),
        s"bucketed-bucketed join still shuffles:\n$plan")
      assert(joined.count() === items.count()) // every lineitem finds its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("copyTo bucket_by validates its required companions") {
    val df = Tables.load(spark, sf, "nation")
    val e = intercept[Catalog.InvalidOptionException] {
      Sinks.copyTo(df, "/tmp/x", "parquet", Map("bucket_by" -> "n_nationkey"))
    }
    assert(e.getMessage.contains("buckets"))
    val e2 = intercept[Catalog.InvalidOptionException] {
      Sinks.copyTo(df, "/tmp/x", "parquet",
        Map("bucket_by" -> "n_nationkey", "buckets" -> "4"))
    }
    assert(e2.getMessage.contains("table"))
  }

  test("bucketed sink round-trips through attach after catalog loss") {
    val wh = tempDir("bucketed_rt")
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val items = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    Sinks.copyTo(orders, s"$wh/o", "parquet", Map(
      "bucket_by" -> "o_orderkey", "buckets" -> "4",
      "table" -> "sk_rt_orders", "overwrite" -> "true"))
    Sinks.copyTo(items, s"$wh/i", "parquet", Map(
      "bucket_by" -> "l_orderkey", "buckets" -> "4",
      "table" -> "sk_rt_items", "overwrite" -> "true"))
    // simulate a fresh session: the in-memory catalog entries are GONE —
    // only the data + sidecar on disk remain
    spark.sql("DROP TABLE sk_rt_orders")
    spark.sql("DROP TABLE sk_rt_items")
    val o = Catalog.attach(spark, "rt_orders", "parquet", Map("files" -> s"$wh/o"))
    val i = Catalog.attach(spark, "rt_items", "parquet", Map("files" -> s"$wh/i"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = o.join(i, col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"re-attached bucketed layout lost its bucket metadata:\n$plan")
      assert(joined.count() === items.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("bucketed attach refuses to clobber an unrelated catalog table") {
    val wh = tempDir("bucketed_clobber")
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    Sinks.copyTo(orders, s"$wh/o", "parquet", Map(
      "bucket_by" -> "o_orderkey", "buckets" -> "4",
      "table" -> "sk_clb_orders", "overwrite" -> "true"))
    spark.sql("DROP TABLE sk_clb_orders")
    // a PERMANENT table at a DIFFERENT location already owns the attach name
    spark.sql(s"CREATE TABLE sk_clb_victim (x INT) USING PARQUET LOCATION '$wh/victim'")
    try {
      val e = intercept[Catalog.InvalidOptionException] {
        Catalog.attach(spark, "sk_clb_victim", "parquet", Map("files" -> s"$wh/o"))
      }
      assert(e.getMessage.contains("different location"))
      assert(spark.catalog.tableExists("sk_clb_victim")) // survivor intact
    } finally spark.sql("DROP TABLE IF EXISTS sk_clb_victim")
  }

  test("tampered bucket-spec sidecar rejects instead of injecting DDL") {
    val wh = tempDir("bucketed_tamper")
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    Sinks.copyTo(orders, s"$wh/o", "parquet", Map(
      "bucket_by" -> "o_orderkey", "buckets" -> "4",
      "table" -> "sk_tmp_orders", "overwrite" -> "true"))
    spark.sql("DROP TABLE sk_tmp_orders")
    // tamper: bucket_by names a column the sidecar's own schema lacks
    val sp = new java.io.File(s"$wh/o", Sinks.BucketSidecar)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(sp).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("bucket_by", "o_orderkey`) LOCATION '/pwned' --")
    java.nio.file.Files.writeString(sp.toPath, node.toString)
    // local FS keeps a checksum sidecar; the rewrite above invalidates it
    new java.io.File(s"$wh/o", s".${Sinks.BucketSidecar}.crc").delete()
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "sk_tampered", "parquet", Map("files" -> s"$wh/o"))
    }
    assert(e.getMessage.contains("not present in its own schema"))
  }

  test("bucketed attach is idempotent and honors partition_by in the sidecar") {
    val wh = tempDir("bucketed_part_rt")
    val cust = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    Sinks.copyTo(cust, s"$wh/c", "parquet", Map(
      "partition_by" -> "c_mktsegment", "bucket_by" -> "c_custkey", "buckets" -> "4",
      "table" -> "sk_part_bucketed", "overwrite" -> "true"))
    spark.sql("DROP TABLE sk_part_bucketed") // catalog loss
    val first = Catalog.attach(spark, "rt_pb", "parquet", Map("files" -> s"$wh/c"))
    // partition column recovered from the hive layout, values intact
    assert(first.columns.contains("c_mktsegment"))
    assert(first.count() === cust.count())
    assert(first.groupBy("c_mktsegment").count().count() === 5)
    assert(first.filter(col("c_mktsegment").isNull).count() === 0)
    // re-attach under the SAME name must replace, not throw (the temp view
    // from the first attach used to shadow DROP TABLE resolution)
    val again = Catalog.attach(spark, "rt_pb", "parquet", Map("files" -> s"$wh/c"))
    assert(again.count() === cust.count())
  }

  test("copyTo rejects orphan bucketing companions without bucket_by") {
    val df = Tables.load(spark, sf, "nation")
    // sort_by/buckets/table are only meaningful with bucket_by; accepting
    // them alone would silently write an unsorted/unbucketed layout
    for (orphan <- Seq("sort_by" -> "n_name", "buckets" -> "4", "table" -> "sk_orphan")) {
      val e = intercept[Catalog.InvalidOptionException] {
        Sinks.copyTo(df, "/tmp/never", "parquet", Map(orphan))
      }
      assert(e.getMessage.contains(orphan._1), s"message names the orphan: ${e.getMessage}")
      assert(e.getMessage.contains("bucket_by"))
    }
  }

  test("copyTo parquet with partition_by lays out prunable directories") {
    Catalog.attach(spark, "sk_nation2", "parquet", Map("files" -> s"$sf/nation.parquet"))
    val out = new java.io.File(tempDir("sink2"), "nation_part").getAbsolutePath
    Sinks.copyTo(spark.table("sk_nation2"), out, "parquet",
      Map("partition_by" -> "n_regionkey", "overwrite" -> "true"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("n_regionkey=")) === 5)
    // partition filter prunes directories on re-read
    val pruned = spark.read.parquet(out).filter(col("n_regionkey") === 0)
    assert(pruned.count() === 5)
  }

  test("copyTo rejects unknown options with the attach error shape") {
    val e = intercept[Catalog.InvalidOptionException] {
      Sinks.copyTo(spark.range(1).toDF(), "/tmp/never", "parquet", Map("bogus" -> "1"))
    }
    assert(e.getMessage.contains("bogus"))
    assert(e.getMessage.contains("valid"))
  }

  test("scalar UDF registers and runs in SQL over attached tables") {
    Catalog.attach(spark, "udf_nation", "parquet", Map("files" -> s"$sf/nation.parquet"))
    spark.udf.register("shout", (s: String) => s + "!")
    val r = spark.sql("SELECT shout(n_name) FROM udf_nation ORDER BY n_nationkey LIMIT 1")
      .head().getString(0)
    assert(r.endsWith("!"))
  }

  test("Aggregator UDAF registers and aggregates in SQL") {
    val geoMeanish = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(math.max(a, 1e-9)), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)) = if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
      def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder = Encoders.scalaDouble
    }
    spark.udf.register("geomean", udaf(geoMeanish))
    Catalog.attach(spark, "udaf_li", "parquet", Map("files" -> s"$sf/lineitem.parquet"))
    val g = spark.sql("SELECT geomean(l_quantity) FROM udaf_li").head().getDouble(0)
    val expected = {
      val q = spark.table("udaf_li").select("l_quantity").collect().map(_.getDouble(0))
      math.exp(q.map(v => math.log(math.max(v, 1e-9))).sum / q.length)
    }
    assert(math.abs(g - expected) / expected < 1e-9)
  }

  test("bloom_filter_columns: footer carries blooms, point lookups skip row groups") {
    import spark.implicits._
    val dir = tempDir("bloomidx").getAbsolutePath
    // 300k distinct longs: the dictionary page overflows (~2.4 MB > 1 MB
    // default), so parquet falls back to plain encoding and the READ-side
    // dictionary filter cannot exclude anything — only the bloom can. The
    // probe value is odd and inside every min/max range (values are even),
    // so stats/column-index can't exclude it either.
    // single output file: split across tasks each file's dictionary page
    // would fit (<1 MB), stay fully dict-encoded, and the read-side
    // DICTIONARY filter would skip the control too
    val df = (0L until 300000L).map(i => (i * 2, i % 97)).toDF("v", "pad").coalesce(1)
    Sinks.copyTo(df, s"$dir/bloomed", "parquet",
      Map("bloom_filter_columns" -> "v", "bloom_filter_ndv" -> "300000"))
    Sinks.copyTo(df, s"$dir/plain", "parquet")
    // footer receipt: the bloomed column chunk records a bloom offset, the
    // untouched column does not
    val conf = spark.sessionState.newHadoopConf()
    val file = new java.io.File(s"$dir/bloomed").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    try {
      import scala.jdk.CollectionConverters._
      val cols = r.getFooter.getBlocks.get(0).getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      assert(cols("v") >= 0, s"no bloom offset on `v`: $cols")
      assert(cols("pad") < 0, s"unexpected bloom on `pad`: $cols")
    } finally r.close()
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("v") === 100001L)
      // collect() executes THIS queryExecution — count() would plan and run
      // a separate one, leaving these metrics at zero
      assert(q.collect().isEmpty)
      val scans = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec => s
          }.head
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val bloomRows = scanRows(s"$dir/bloomed")
    val plainRows = scanRows(s"$dir/plain")
    assert(bloomRows === 0,
      s"bloom-indexed scan surfaced $bloomRows rows — row groups not skipped")
    assert(plainRows > 0,
      "control scan also read 0 rows — the receipt isn't isolating the bloom")
  }

  test("bloom_filter_columns with a typo'd column rejects loudly") {
    import spark.implicits._
    val dir = tempDir("bloomtypo").getAbsolutePath
    val e = intercept[Exception] {
      Sinks.copyTo(Seq((1L, 2L)).toDF("a", "b"), s"$dir/x", "parquet",
        Map("bloom_filter_columns" -> "a,oops"))
    }
    assert(e.getMessage.contains("oops") && e.getMessage.contains("not a column"))
  }

  test("bloom_filter_ndv without bloom_filter_columns rejects loudly") {
    import spark.implicits._
    val dir = tempDir("bloomrej").getAbsolutePath
    val e = intercept[Exception] {
      Sinks.copyTo(Seq((1L, 2L)).toDF("a", "b"), s"$dir/x", "parquet",
        Map("bloom_filter_ndv" -> "100"))
    }
    assert(e.getMessage.contains("bloom_filter_columns"))
  }
}
