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

  /** events.ts is INT64 TIMESTAMP(NANOS) in parquet. Spark 4 can only read it
    * as raw nanos (spark.sql.legacy.parquet.nanosAsLong=true, set by
    * Engine.configure); convert to a microsecond TimestampType by integer
    * division — the same truncation DuckDB applies when it scans ns parquet
    * as TIMESTAMP, so oracle comparisons line up exactly. */
  private def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df

  /** Register tables as temp views so spark.sql(...) can reference them by
    * bare name — the Spark analogue of the reference's per-schema view
    * registration (src/fdw/base.rs:216-260). Idempotent. */
  def register(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def registerAll(spark: SparkSession, dir: String): Unit = register(spark, dir, names)
}
