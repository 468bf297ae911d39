package org.apache.spark.sql.graftstream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Shared V1-Source plumbing for the lakehouse follow sources: turn the
  * batch reader's DataFrame into the streaming batch MicroBatchExecution
  * expects (`isStreaming=true`). */
private[graftstream] object FollowSupport {

  /** Re-mark the batch plan's data-scan leaf streaming. Traversal is
    * depth-first left-to-right, so the FIRST LogicalRelation is the data
    * side; row-level-delete anti-join right sides stay batch relations
    * (stream-static anti-joins). An empty snapshot has no relation leaf —
    * emit an explicitly-streaming empty frame with the declared schema. */
  def asStreamingBatch(spark: CSparkSession, batch: DataFrame,
      schema: StructType, markAll: Boolean = false): DataFrame = {
    var marked = false
    val plan = batch.queryExecution.logical.transformUp {
      case lr: LogicalRelation if markAll || !marked =>
        marked = true
        lr.copy(isStreaming = true)
    }
    if (marked) CDataset.ofRows(spark, plan)
    else spark.sqlContext.internalCreateDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
