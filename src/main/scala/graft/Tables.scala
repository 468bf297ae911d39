package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table loader for the driver-generated TPC-H-ish corpus
  * (/root/testdata/sf*). One parquet file per table. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Widen a NARROW scan to the session's parallelism (optimization guide
    * §2.5, "input skew: one huge unsplittable file ... repartition
    * immediately after the read"): the sf fixtures are single-row-group
    * parquet files, so a scan-rooted pipeline runs as ONE task no matter
    * the split config — Spark cannot split inside a row group — and every
    * row-local operator downstream (tokenize/hash/fold/vector math)
    * serializes on one core while N−1 idle. One round-robin exchange of a
    * few MB fixes that. CONDITIONAL by design: when the source is already
    * at least half as wide as the core count — any real table at cluster
    * scale — this returns the frame untouched, so no plan changes, no
    * extra shuffle, and scan-level pushdown is preserved exactly where it
    * matters. Apply only to compute-dense paths; results are partition-
    * invariant (every query stays oracle-gated). */
  def widen(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (cores <= 2) return df
    // SCAN-ROOTED ONLY (enforced, not just documented): the width probe
    // below reads the PRE-AQE partition count, which is only meaningful on
    // a bare scan — projections/filters preserve it, but anything already
    // shaped (joins, aggregates, repartitions) reports a count AQE will
    // re-derive anyway. Such frames return untouched.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, SubqueryAlias}
    val scanRooted = df.queryExecution.logical.collectFirst {
      case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
        !p.isInstanceOf[SubqueryAlias] && !p.isInstanceOf[LeafNode] => p
    }.isEmpty
    if (!scanRooted) return df
    // NonFatal only: an OOM/linkage error in planning must surface, never
    // be masked as "already wide"
    val parts = try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => cores }
    if (parts * 2 >= cores) df else df.repartition(cores)
  }

  /** events.ts normalization to a microsecond TimestampType, whatever shape
    * the driver generated this round:
    *
    *   - INT64 TIMESTAMP(NANOS): Spark 4 reads it as raw nanos
    *     (spark.sql.legacy.parquet.nanosAsLong=true, set by
    *     Engine.configure); integer-divide to micros — the same truncation
    *     DuckDB applies scanning ns parquet as TIMESTAMP;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *     TIMESTAMP_NTZ; the session is pinned UTC, so casting to
    *     TimestampType preserves the exact micros and matches DuckDB's
    *     naive-TIMESTAMP scan of the same column;
    *   - TIMESTAMP(MICROS, adjusted): already TimestampType, pass through. */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Register tables as temp views so spark.sql(...) can reference them by
    * bare name — the Spark analogue of the reference's per-schema view
    * registration (src/fdw/base.rs:216-260). Idempotent. */
  def register(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def registerAll(spark: SparkSession, dir: String): Unit = register(spark, dir, names)
}
