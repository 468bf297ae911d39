package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dynamic partition pruning through the native lakehouse readers — the
  * plan that decides 100× scale: a star-schema join's dim filter must
  * prune fact PARTITIONS at runtime, not after a full scan. LogFileIndex
  * exposes a real partitionSchema (Delta: log partitionValues; Iceberg:
  * tuple-served identity columns), so Spark's PartitionPruning rule fires
  * unmodified; these pins keep it that way. */
class DppSpec extends SparkSpec {

  test("l25: DynamicPruningExpression reaches BOTH native fact scans") {
    val p = SparkEntry.queries("l25_dpp_star_join")(spark, sf)
      .queryExecution.explainString(FormattedMode).toLowerCase
    val hits = "dynamicpruningexpression".r.findAllIn(p).size
    assert(hits >= 2, s"expected runtime pruning on both fact scans, got $hits")
  }

  test("l25: runtime pruning actually drops fact files (pruned-count receipt)") {
    // AQE off for the receipt: the static plan keeps FileSourceScanExec
    // reachable and its numFiles/staticFilesNum metrics reflect the
    // dynamically-selected partitions after execution
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = SparkEntry.queries("l25_dpp_star_join")(spark, sf)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")) => f
      }
      assert(scans.size >= 2, s"expected 2 dynamically-pruned scans, got ${scans.size}")
      scans.foreach { s =>
        val read = s.metrics("numFiles").value
        val static = s.metrics("staticFilesNum").value
        // customer is partitioned on c_nationkey (25 values); the dim filter
        // keeps one region = 5 nations, so >= 20 partitions must be skipped
        assert(read > 0 && static > 0 && read * 4 <= static,
          s"runtime pruning ineffective: read=$read of static=$static files")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("spj: bucket-layout joins currently exchange both sides (decision pin)") {
    // SCALE.md "Storage-partitioned join — decision": the DSv1 read path
    // cannot report KeyGroupedPartitioning, so a join of two bucket(4, k)
    // tables shuffles both sides today. This pin makes the documented
    // trade visible — if a DSv2 SPJ path ever lands, this test MUST flip
    // to assert the exchange is gone.
    import org.apache.spark.sql.functions._
    val dir = tempDir("spj").getAbsolutePath
    val a = s"$dir/a"; val b = s"$dir/b"
    val ord = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    graft.catalog.Sinks.copyTo(ord, a, "iceberg",
      Map("partition_by" -> "bucket(4, o_custkey)"))
    graft.catalog.Sinks.copyTo(ord, b, "iceberg",
      Map("partition_by" -> "bucket(4, o_custkey)"))
    val fa = graft.catalog.Catalog.attach(spark, "spj_a", "iceberg", Map("files" -> a))
    val fb = graft.catalog.Catalog.attach(spark, "spj_b", "iceberg", Map("files" -> b))
      .withColumnRenamed("o_orderkey", "b_orderkey")
      .withColumnRenamed("o_totalprice", "b_totalprice")
    // at fixture scale AQE correctly broadcasts (LogFileIndex reports true
    // sizes); disable broadcast to expose the shape a fact⋈fact join of
    // this layout takes at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = fa.join(fb.withColumnRenamed("o_custkey", "b_custkey"),
        col("o_custkey") === col("b_custkey"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val p = q.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin") && p.contains("hashpartitioning"),
        "bucket-layout join no longer shuffles — SPJ landed? flip this pin " +
          "and update SCALE.md's decision entry")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("iceberg attach serves identity partition columns from the tuple") {
    import org.apache.spark.sql.functions._
    val dir = tempDir("dpp_served").getAbsolutePath
    val out = s"$dir/part_iceberg"
    val orders = graft.Tables.load(spark, sf, "orders")
      .withColumn("o_month", month(col("o_orderdate")))
    graft.catalog.Sinks.copyTo(orders, out, "iceberg",
      Map("partition_by" -> "o_month"))
    val fact = graft.catalog.Catalog.attach(spark, "dpp_served_ib", "iceberg",
      Map("files" -> out))
    // values identical to the source (tuple == row value for identity)
    assert(fact.count() == orders.count())
    assert(fact.filter(col("o_month") === 3).count() ==
      orders.filter(col("o_month") === 3).count())
    // and the column is a true partition column: a static equality filter
    // prunes the listing to that partition's files only
    val p = fact.filter(col("o_month") === 3).queryExecution
      .explainString(FormattedMode)
    assert(p.contains("PartitionFilters:") && p.contains("(o_month"),
      s"expected o_month in PartitionFilters:\n$p")
  }
}
