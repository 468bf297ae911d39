package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}

import graft.sources.{IcebergChanges, IcebergNative}

/** STRUCTURED STREAMING over an Iceberg CHANGELOG — the CDC sibling of
  * [[IcebergFollowSource]]: where the follow source emits each snapshot's
  * NEW rows only, this source emits every row CHANGE as
  * `_change_type` = insert | delete rows (an update is its delete+insert
  * pair), attributed to the committing snapshot — the feed an incremental
  * corpus-sync or downstream-replica pipeline consumes.
  *
  *   - offsets index the append-only snapshot-log exactly like the follow
  *     source (`LongOffset(n)` = changes through the n-th logged
  *     snapshot), so a commit racing the poll never shifts a batch;
  *   - the FIRST batch is the initial snapshot as inserts; later batches
  *     delegate to the batch changelog scan (`sources/IcebergChanges`):
  *     append pairs are metadata-diffed, rewrite pairs diff two pinned
  *     snapshot-pruned reads, compactions emit nothing;
  *   - same trimming caveat as the follow source: snapshot expiration
  *     under a running query invalidates retained offsets. */
class IcebergChangelogProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "iceberg-changelog"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("files", parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "iceberg-changelog needs `files` (table root) in options")))

  private[graftstream] def changeSchema(base: StructType): StructType =
    base.add("_change_type", StringType, nullable = false)
      .add("_commit_snapshot_id", LongType, nullable = false)
      .add("_commit_timestamp", TimestampType)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      IcebergNative.read(sqlContext.sparkSession, root(parameters), Map.empty).schema)
    (shortName(), changeSchema(base))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergChangelogSource(
      sqlContext.sparkSession.asInstanceOf[CSparkSession],
      root(parameters), parameters)
}

class IcebergChangelogSource(spark: CSparkSession, root: String,
    parameters: Map[String, String]) extends Source {

  private val baseSchema: StructType =
    IcebergNative.read(spark, root, Map.empty).schema
  override val schema: StructType =
    new IcebergChangelogProvider().changeSchema(baseSchema)

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

  // rewrite-pair batches materialize here (see getBatch); dirs are
  // reclaimed once their batch commits
  private val spillRoot =
    java.nio.file.Files.createTempDirectory("graft-changelog-").toFile
  private val spills =
    scala.collection.mutable.Map[Long, java.io.File]() // endOffset → dir

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    lastServedEnd = Some(version(end))
    val log = IcebergNative.snapshotLog(spark, root)
    def at(n: Long): (Long, Long) = {
      require(n >= 1 && n <= log.size,
        s"iceberg-changelog: offset $n outside the snapshot-log (${log.size} " +
          "entries) — was the log trimmed under a running query?")
      val (ts, id) = log((n - 1).toInt)
      (id, ts)
    }
    val (endId, endTs) = at(version(end))
    val df = start match {
      case None =>
        // initial load: the pinned snapshot, every row an insert — pure
        // scan + literal projections, streams directly
        FollowSupport.asStreamingBatch(spark,
          IcebergNative.read(spark, root, Map("snapshot_id" -> endId.toString))
            .select(baseSchema.fieldNames.map(col).toSeq: _*)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_snapshot_id", lit(endId))
            .withColumn("_commit_timestamp",
              lit(new java.sql.Timestamp(endTs)).cast("timestamp")), schema)
      case Some(s) =>
        val startId = at(version(s))._1
        val changes = IcebergChanges.read(spark, root, Map(
          "start_snapshot" -> startId.toString,
          "end_snapshot" -> endId.toString))
        // append-only ranges are scan-shaped (manifest-diff + literals)
        // and stream directly; a range holding a rewrite pair carries
        // exceptAll, which the incremental planner would turn STATEFUL —
        // materialize it (one distributed write, no driver rows) and
        // stream the resulting pure scan instead
        val appendOnly = {
          IcebergNative.snapshots(spark, root)
            .filter(col("snapshot_id") > startId && col("snapshot_id") <= endId)
            .select("operation").collect()
            .forall(r => r.getString(0) == "append" || r.getString(0) == "replace")
        }
        if (appendOnly) FollowSupport.asStreamingBatch(spark, changes, schema)
        else {
          val dest = new java.io.File(spillRoot,
            s"b-${version(s)}-${version(end)}-${java.util.UUID.randomUUID().toString.take(8)}")
          changes.write.parquet(dest.getPath)
          spills(version(end)) = dest
          // schema-LESS read on purpose: forcing the source's non-nullable
          // change columns onto the parquet scan makes the engine-executed
          // batch silently yield zero rows; the select pins column order
          FollowSupport.asStreamingBatch(spark,
            spark.read.parquet(dest.getPath)
              .select(schema.fieldNames.map(col).toSeq: _*), schema)
        }
    }
    df
  }

  private def rmTree(f: java.io.File): Unit = {
    import java.nio.file._
    import java.util.Comparator
    try Files.walk(f.toPath).sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
    catch { case _: Exception => () }
  }

  override def commit(end: Offset): Unit = {
    val committed = version(end)
    spills.filter(_._1 <= committed).foreach { case (k, d) =>
      rmTree(d); spills.remove(k)
    }
  }
  override def stop(): Unit = rmTree(spillRoot)
  override def toString: String = s"IcebergChangelogSource[$root]"
}
