package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.catalog.IcebergSink

/** STRUCTURED STREAMING into a native Iceberg table — `writeStream
  * .format("iceberg-commit")` with no iceberg jar, the streaming face of
  * the batch writer (`catalog/IcebergSink`). Exactly-once: every
  * micro-batch's snapshot summary records `graft-app-id` +
  * `graft-batch-version` (the summary is a free-form string map per the
  * spec), and a re-delivered batchId at or below the app's highest
  * committed version is recognized from the metadata and skipped — the
  * same ledger shape the delta-commit sink derives from Delta's txn
  * actions. `app_id` is REQUIRED and stable per logical stream. */
class IcebergWriteSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "iceberg-commit"

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val upserting = parameters.get("upsert_keys").exists(_.trim.nonEmpty)
    if (outputMode != OutputMode.Append() &&
        !(upserting && outputMode == OutputMode.Update()))
      throw new IllegalArgumentException(
        s"iceberg-commit supports Append output mode (got $outputMode); " +
          "Update additionally requires `upsert_keys` — a plain snapshot " +
          "append cannot retract rows")
    // partitioning flows to the batch writer: `partition_by` option (full
    // transform syntax — day(ts), bucket(16, id), …) or `.partitionBy`
    // (identity columns); both set and disagreeing rejects
    val fromApi = Option(partitionColumns).filter(_.nonEmpty).map(_.mkString(","))
    val params = (parameters.get("partition_by"), fromApi) match {
      case (Some(opt), Some(api)) if opt.replaceAll("\\s", "") != api =>
        throw new IllegalArgumentException(
          s"iceberg-commit got partition_by=`$opt` AND .partitionBy($api) — " +
            "they disagree; set one")
      case (None, Some(api)) => parameters + ("partition_by" -> api)
      case _ => parameters
    }
    val root = parameters.getOrElse("files", parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "iceberg-commit needs `files` (table root) in options")))
    val appId = parameters.getOrElse("app_id", throw new IllegalArgumentException(
      "iceberg-commit needs `app_id` (stable stream identity for exactly-once " +
        "batch tracking)"))
    new IcebergWriteSink(sqlContext.sparkSession.asInstanceOf[CSparkSession],
      root, appId, params)
  }
}

class IcebergWriteSink(spark: CSparkSession, root: String, appId: String,
    parameters: Map[String, String]) extends Sink {

  private val writeOpts: Map[String, String] =
    parameters -- Seq("files", "path", "app_id", "checkpointLocation", "upsert_keys")

  /** `upsert_keys=k1,k2` switches every micro-batch to ONE upsert snapshot
    * (equality delete on the keys + the batch's rows, the Flink-CDC
    * shape) — latest write per key wins across batches. The FIRST batch
    * creates the table through the plain writer (nothing to delete yet). */
  private val upsertKeys: Option[Seq[String]] =
    parameters.get("upsert_keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)

  private def tableExists: Boolean = {
    val md = new org.apache.hadoop.fs.Path(root, "metadata")
    val fs = md.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(md) && fs.listStatus(md)
      .exists(_.getPath.getName.endsWith(".metadata.json"))
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    upsertKeys match {
      case Some(keys) if tableExists =>
        IcebergSink.upsert(spark, root, batch, keys, txn = Some((appId, batchId)))
      case Some(keys) =>
        // bootstrap batch bypasses upsert() (nothing to delete yet) but must
        // carry the SAME within-batch semantics: keep the last row per key,
        // or duplicate keys in batch 0 land as duplicate rows
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, monotonically_increasing_id, row_number}
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__graft_seq").desc)
        val deduped = batch.withColumn("__graft_seq", monotonically_increasing_id())
          .withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1)
          .drop("__graft_seq", "__graft_rn")
        IcebergSink.write(deduped, root, writeOpts, txn = Some((appId, batchId)))
      case None =>
        IcebergSink.write(batch, root, writeOpts, txn = Some((appId, batchId)))
    }
  }

  override def toString: String = s"IcebergWriteSink[$root, app=$appId]"
}
