package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.catalog.DeltaSink

/** STRUCTURED STREAMING into a native Delta table — `writeStream
  * .format("delta-commit")` with no delta-spark jar, the streaming face of
  * the batch writer (`catalog/DeltaSink`). Exactly-once comes from the
  * protocol's transaction identifiers: every micro-batch commits
  * `{"txn":{"appId":<app_id>,"version":<batchId>}}` alongside its adds, and
  * a replayed batch (post-crash re-delivery of an already-committed
  * batchId) is recognized from the log and skipped — the same arrangement
  * delta-spark's streaming sink uses, derived here from the public
  * PROTOCOL.md "Transaction Identifiers" section.
  *
  * `app_id` is REQUIRED and must be stable across restarts of the same
  * logical stream (one writing stream = one appId); two different streams
  * appending to one table use two appIds and interleave safely. */
class DeltaWriteSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "delta-commit"

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    if (outputMode != OutputMode.Append())
      throw new IllegalArgumentException(
        s"delta-commit supports Append output mode only (got $outputMode): a log " +
          "append cannot retract rows")
    val root = parameters.getOrElse("files", parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "delta-commit needs `files` (table root) in options")))
    val appId = parameters.getOrElse("app_id", throw new IllegalArgumentException(
      "delta-commit needs `app_id` (stable stream identity for exactly-once " +
        "txn tracking)"))
    new DeltaWriteSink(sqlContext.sparkSession.asInstanceOf[CSparkSession],
      root, appId, parameters, partitionColumns)
  }
}

class DeltaWriteSink(spark: CSparkSession, root: String, appId: String,
    parameters: Map[String, String], partitionColumns: Seq[String]) extends Sink {

  private val writeOpts: Map[String, String] =
    (parameters -- Seq("files", "path", "app_id", "checkpointLocation",
      "checkpoint_interval")) ++
      (if (partitionColumns.nonEmpty)
        Map("partition_by" -> partitionColumns.mkString(","))
      else Map.empty)

  /** Every N batches, fold the table's log into a classic checkpoint —
    * without this a long-lived stream grows the commit list without bound
    * and every restart's first read replays all of it. */
  private val checkpointInterval: Option[Long] =
    parameters.get("checkpoint_interval").map { v =>
      val n = v.toLong
      if (n <= 0) throw new IllegalArgumentException(
        s"checkpoint_interval must be positive: $n")
      n
    }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is flagged streaming; re-wrap its executed RDD as
    // a batch frame (the standard V1 Sink arrangement) so the batch writer
    // can drive a plain distributed parquet write
    val batch = spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    DeltaSink.write(batch, root, writeOpts, txn = Some((appId, batchId)))
    checkpointInterval.foreach { n =>
      if ((batchId + 1) % n == 0) DeltaSink.checkpoint(spark, root)
    }
  }

  override def toString: String = s"DeltaWriteSink[$root, app=$appId]"
}
