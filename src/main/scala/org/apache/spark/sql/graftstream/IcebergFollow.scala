package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.IcebergNative

/** STRUCTURED STREAMING over native Iceberg table metadata — the Iceberg
  * sibling of [[DeltaFollowSource]], built on the batch
  * `changes_since_snapshot` set-diff (`sources/IcebergNative.scala`):
  *
  *   - offsets index the table's append-only snapshot-log:
  *     `LongOffset(n)` = "rows visible through the n-th logged snapshot";
  *     each batch pins `snapshot_id` = log(n-1) so a commit racing the
  *     poll never shifts what the batch reads;
  *   - the first batch is the full snapshot; later batches are the
  *     metadata set-diff (files live at the end snapshot but not at the
  *     start snapshot) — two driver-side manifest walks, data scan only
  *     over the new files; the end snapshot's row-level deletes still
  *     apply to the surviving files;
  *   - assumes the snapshot-log is not trimmed under a running query
  *     (snapshot expiration invalidates retained offsets — the same
  *     class of caveat as vacuuming a followed Delta log).
  */
class IcebergFollowProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "iceberg-follow"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("files", parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "iceberg-follow needs `files` (table root) in options")))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val s = schema.getOrElse(
      IcebergNative.read(sqlContext.sparkSession, root(parameters),
        IcebergFollowSource.passThrough(parameters)).schema)
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergFollowSource(
      sqlContext.sparkSession.asInstanceOf[CSparkSession],
      root(parameters), parameters)
}

object IcebergFollowSource {
  private[graftstream] def passThrough(parameters: Map[String, String]): Map[String, String] =
    parameters -- Seq("files", "path", "snapshot_id", "as_of_timestamp",
      "changes_since_snapshot", "max_snapshots_per_trigger")
}

class IcebergFollowSource(spark: CSparkSession, root: String,
    parameters: Map[String, String]) extends Source {

  private val baseOpts = IcebergFollowSource.passThrough(parameters)

  override val schema: StructType =
    IcebergNative.read(spark, root, baseOpts).schema

  /** `max_snapshots_per_trigger=N` bounds how many NEW snapshot-log
    * entries one micro-batch may cover (the DeltaFollow
    * max_commits_per_trigger lever; same V1 caveat — the first trigger
    * after a restart is uncapped, every later one capped). */
  private val maxSnapshots: Option[Long] =
    parameters.get("max_snapshots_per_trigger").map { v =>
      val n = v.toLong
      if (n <= 0) throw new IllegalArgumentException(
        s"max_snapshots_per_trigger must be positive, got $v")
      n
    }
  @volatile private var lastServedEnd: Option[Long] = None

  override def getOffset: Option[Offset] = {
    val n = IcebergNative.snapshotLog(spark, root).size
    if (n == 0) None
    else {
      val capped = (maxSnapshots, lastServedEnd) match {
        case (Some(m), Some(prev)) => math.min(n.toLong, prev + m)
        case _ => n.toLong
      }
      Some(LongOffset(capped))
    }
  }

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    lastServedEnd = Some(version(end))
    val log = IcebergNative.snapshotLog(spark, root)
    def idAt(n: Long): Long = {
      require(n >= 1 && n <= log.size,
        s"iceberg-follow: offset $n outside the snapshot-log (${log.size} " +
          "entries) — was the log trimmed under a running query?")
      log((n - 1).toInt)._2
    }
    val opts = baseOpts ++
      Map("files" -> root, "snapshot_id" -> idAt(version(end)).toString) ++
      start.map(s => "changes_since_snapshot" -> idAt(version(s)).toString)
    FollowSupport.asStreamingBatch(spark,
      IcebergNative.read(spark, root, opts), schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"IcebergFollowSource[$root]"
}
