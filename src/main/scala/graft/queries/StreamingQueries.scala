package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Streaming operators under the SAME DuckDB-oracle gate as batch: the
  * documents corpus replays through a MemoryStream into the streaming
  * operator, the memory sink is returned as the result frame, and the
  * oracle states the equivalent BATCH SQL — a green row proves the
  * streaming path computes exactly what the batch semantics promise.
  *
  * Determinism note: the corpus feeds ONE input partition in doc_id order,
  * so per content-hash the first-arriving row (the one
  * dropDuplicatesWithinWatermark keeps) is the minimum doc_id — the same
  * keeper the batch d01 operator marks. */
object StreamingQueries {

  private val x01 = QueryDef(
    "x01_stream_dedup",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      // explicit 1 input partition: arrival order IS doc_id order (see above)
      val in = MemoryStream[(Long, String, java.sql.Timestamp)](1)
      val out = Streams.dedupDocsStream(
        in.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
        .select(col("doc_id"), col("h"))
      val q = out.writeStream.format("memory").queryName("x01_out")
        .outputMode("append").start()
      try {
        val rows = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
          .map(r => (r.getLong(0), r.getString(1),
            java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
        in.addData(rows.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table("x01_out")
    },
    Some("""
      WITH h AS (SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS h
                 FROM documents)
      SELECT doc_id, h FROM (
        SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS m FROM h) x
      WHERE doc_id = m"""))

  val all: Seq[QueryDef] = Seq(x01)
}
