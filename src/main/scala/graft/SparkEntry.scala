package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{FormatQueries, PipelineQueries, RelationalQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in graft.queries.*; each entry pairs a Spark
  * implementation with a DuckDB oracle (where SQL-expressible).
  */
object SparkEntry {

  private def defs =
    RelationalQueries.all ++ PipelineQueries.all ++ FormatQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    RelationalQueries.all.head.fn(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> wrap(d.fn)).toMap

  // Verify/Bench build their own sessions; make sure the ns-parquet conf is
  // on before any events.parquet read regardless of who created the session.
  private def wrap(f: (SparkSession, String) => DataFrame) =
    (s: SparkSession, dir: String) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      f(s, dir)
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
