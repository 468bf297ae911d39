package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling for event streams — the fixed-grid + gap-fill
  * pass every monitoring/feature pipeline runs before ML ingestion
  * (pandas `resample().ffill()`, TimescaleDB `time_bucket_gapfill`).
  * Beyond the reference surface (no time-series functions there).
  *
  * Per key: bucket events to a fixed grid, aggregate, materialize EVERY
  * grid step over the key's observed span (`sequence` + explode — no
  * driver loop), left-join the observed buckets back, and forward-fill
  * gaps with a running `last(ignoreNulls)` window ordered by bucket.
  *
  * Scale shape: one shuffle for the bucket aggregation, one broadcast-able
  * span table, one window partitioned BY KEY (never a global sort); grid
  * explosion is bounded by span/step per key, generated in executors.
  * Determinism: bucket sums are decimal-cast (exact, associative), the
  * fill picks the LAST non-null in bucket order (total order per key) —
  * the DuckDB oracle replays every step. */
object TimeSeries {

  /** (keyCol, bucket `h`, n_events, value_filled): `step` is a Spark
    * interval literal body, e.g. "1 hour". */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, step: String = "1 hour"): DataFrame = {
    // single-unit steps only: the bucket is date_trunc(unit), which aligns
    // with the grid ONLY when the step is one whole unit — "30 minutes"
    // would silently bucket wrong, so anything else rejects loudly
    val unit = step.trim.toLowerCase match {
      case "1 minute" => "minute"
      case "1 hour" => "hour"
      case "1 day" => "day"
      case "1 week" => "week"
      case other => throw new IllegalArgumentException(
        s"resampleFill step `$other`: supported steps are 1 minute / 1 hour " +
          "/ 1 day / 1 week (the bucket is date_trunc of the step's unit, " +
          "which only aligns for whole single-unit steps)")
    }
    val hourly = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("h"))
      .agg(count(lit(1)).as("n"),
        (sum(col(valCol).cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_v"))
    val spans = hourly.groupBy(col(keyCol))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = spans.select(col(keyCol),
      explode(expr(s"sequence(h0, h1, interval $step)")).as("h"))
    val joined = grid.join(hourly, Seq(keyCol, "h"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("value_filled", last(col("avg_v"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("h"), col("n_events"), col("value_filled"))
  }

  /** Oracle for [[resampleFill]] with an hourly grid: `fromSql` must
    * yield (`keyCol`, `tsCol`, `valCol`). */
  def resampleFillSql(fromSql: String, keyCol: String, tsCol: String,
      valCol: String): String =
    s"""WITH src AS ($fromSql),
        hourly AS (SELECT $keyCol, CAST(date_trunc('hour', $tsCol) AS TIMESTAMP) AS h,
                          count(*) AS n,
                          CAST(sum(CAST($valCol AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
                   FROM src GROUP BY 1, 2),
        spans AS (SELECT $keyCol, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
        grid AS (SELECT $keyCol, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                 FROM spans),
        j AS (SELECT g.$keyCol, g.h, coalesce(hy.n, 0) AS n_events, hy.avg_v
              FROM grid g LEFT JOIN hourly hy USING ($keyCol, h))
        SELECT $keyCol, h, n_events,
               last_value(avg_v IGNORE NULLS) OVER (
                 PARTITION BY $keyCol ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        FROM j"""
}
