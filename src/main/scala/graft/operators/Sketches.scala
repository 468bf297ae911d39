package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count sketching via K-Minimum-Values — the "novel sketch as a
  * custom aggregate" pattern: a typed `Aggregator` (Spark's UDAF path) whose
  * buffer is the k smallest distinct 60-bit hashes. Unlike HLL
  * (`approx_count_distinct`), KMV over a FIXED hash is fully deterministic —
  * the k-min set is order- and partition-independent, so the estimate is
  * reproducible in any engine and DuckDB can act as a hash-exact oracle.
  *
  * Scale: the buffer is ≤ k longs (k=64 → 512 bytes) regardless of input
  * size; merge is a k-way min-merge, so partial aggregation works and the
  * shuffle carries sketches, not values. Estimate: exact count when fewer
  * than k distinct values were seen, else (k-1) · 2^60 / kthMinHash.
  */
object Sketches {

  /** 60-bit deterministic hash of any value (15 hex chars of md5 of its
    * string form — same construction as the MinHash base hash). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  final class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Double] {
    override def zero: Array[Long] = Array.empty[Long]

    /** Insert keeping the buffer a sorted set of the k smallest hashes. */
    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present (KMV needs DISTINCT minima)
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf // larger than the current k-th minimum
      }
    }

    override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(insert)

    override def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else (k - 1).toDouble * KmvAggregator.SPACE / buf(k - 1).toDouble

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object KmvAggregator {
    /** Hash space size: 2^60 (15 hex chars). Exactly representable. */
    val SPACE: Double = 1152921504606846976.0
  }

  /** Distinct estimate of `c` as a Column aggregate (use inside agg()). */
  def kmvDistinct(c: Column, k: Int = 64): Column =
    udaf(new KmvAggregator(k)).apply(hash60(c))

  /** DuckDB rendering of the identical estimate: rank the distinct hashes,
    * exact count below k, else the same (k-1)·2^60/kth arithmetic. */
  def kmvDistinctSql(valueExpr: String, relation: String, groupCol: String,
      k: Int = 64): String = s"""
      WITH hs AS (SELECT DISTINCT $groupCol,
                    ('0x' || substr(md5(CAST($valueExpr AS VARCHAR)), 1, 15))::BIGINT AS h
                  FROM $relation),
      ranked AS (SELECT $groupCol, h,
                        row_number() OVER (PARTITION BY $groupCol ORDER BY h) AS rn,
                        count(*) OVER (PARTITION BY $groupCol) AS cnt
                 FROM hs)
      SELECT $groupCol,
             CASE WHEN max(cnt) < $k THEN CAST(max(cnt) AS DOUBLE)
                  ELSE ${k - 1}.0 * ${KmvAggregator.SPACE.toLong}.0 /
                       CAST(max(CASE WHEN rn = $k THEN h END) AS DOUBLE) END AS est_distinct
      FROM ranked GROUP BY $groupCol"""
}
