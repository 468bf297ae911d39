package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning through the native lakehouse readers —
  * the non-partition-column sibling of DppSpec: when the star join's key is
  * not a partition column, DPP cannot prune files, but InjectRuntimeFilter
  * can still gate the fact side's rows BEFORE the shuffle with a bloom
  * filter built from the dim's selective predicate. These pins keep that
  * rule firing on the LogFileIndex-backed attach relation. */
class BloomSpec extends SparkSpec {

  private val bloomConfs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "512MB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("l26: result matches the plain join bit-for-bit") {
    val gated = SparkEntry.queries("l26_bloom_runtime_filter")(spark, sf)
      .collect().map(_.toString).sorted
    val plain = {
      val dim = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      Tables.load(spark, sf, "orders")
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
        .collect().map(_.toString).sorted
    }
    assert(gated.nonEmpty && gated.sameElements(plain))
  }

  test("bloom gate sits on the fact side BELOW its exchange, over the native scan") {
    // AQE off so the static executed plan keeps the Exchange→Filter→Scan
    // chain reachable for a structural walk
    val dir = tempDir("bloom").getAbsolutePath
    val out = s"$dir/orders_delta"
    graft.catalog.Sinks.copyTo(Tables.load(spark, sf, "orders"), out, "delta")
    withConfs(bloomConfs :+ ("spark.sql.adaptive.enabled" -> "false")) {
      val fact = graft.catalog.Catalog.attach(spark, "bloom_orders", "delta",
        Map("files" -> out))
      val dim = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val q = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val exchanges = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the gated chain: some Exchange's subtree holds a might_contain
      // Filter whose own subtree bottoms out at a FileSourceScanExec (the
      // native delta attach) — i.e. the bloom filter is applied pre-shuffle
      val gatedPreShuffle = exchanges.exists { e =>
        e.collect {
          case f: org.apache.spark.sql.execution.FilterExec
              if f.condition.toString.toLowerCase.contains("might_contain") &&
                f.collectLeaves().exists(
                  _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) => f
        }.nonEmpty
      }
      assert(gatedPreShuffle,
        "no pre-shuffle bloom Filter over the native scan — " +
          "InjectRuntimeFilter stopped firing on the attach relation:\n" +
          q.queryExecution.executedPlan.toString.take(4000))
    }
  }

  test("bloom gate fires on the native ICEBERG attach too") {
    val dir = tempDir("bloomi").getAbsolutePath
    val out = s"$dir/orders_iceberg"
    graft.catalog.Sinks.copyTo(Tables.load(spark, sf, "orders"), out, "iceberg")
    withConfs(bloomConfs) {
      val fact = graft.catalog.Catalog.attach(spark, "bloom_orders_i", "iceberg",
        Map("files" -> out))
      val dim = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val q = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(q.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("might_contain"),
        "InjectRuntimeFilter did not fire on the iceberg attach relation")
    }
  }

  test("bloom gate is injection-only: disabled rule leaves the plan clean") {
    withConfs(Seq("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
      val dim = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val q = Tables.load(spark, sf, "orders")
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!q.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("might_contain"))
    }
  }
}
