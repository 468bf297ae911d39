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

  /** Misra-Gries summary state: candidate counters plus the TRUE total
    * item count (the total rides along so frequent-item thresholds need no
    * second scan). */
  final case class MgState(counts: Map[String, Long], total: Long)

  /** Misra-Gries frequent-items summary over token arrays as a typed
    * `Aggregator`: at most k counters per buffer, so the shuffle carries
    * k-entry sketches, not token streams. The classic guarantee holds
    * under merging (Agarwal et al., "Mergeable Summaries", PODS'12):
    * every item with frequency > N/k survives in `counts`. Candidates are
    * a SUPERSET of the heavy hitters — [[Sketches.frequentTokens]] makes
    * the final answer exact (and therefore deterministic, despite MG's
    * merge-order-dependent counter values) with a candidates-only count
    * pass. */
  final class MgAggregator(k: Int)
      extends Aggregator[Seq[String], MgState, MgState] {
    override def zero: MgState = MgState(Map.empty, 0L)

    override def reduce(st: MgState, toks: Seq[String]): MgState = {
      var c = st.counts
      toks.foreach { t =>
        c.get(t) match {
          case Some(n) => c = c.updated(t, n + 1)
          case None if c.size < k => c = c.updated(t, 1L)
          // counter pool full: the decrement-all step (amortized O(1) per
          // item — each decrement pays down a previous increment)
          case None => c = c.collect { case (w, n) if n > 1 => (w, n - 1) }
        }
      }
      MgState(c, st.total + toks.size)
    }

    override def merge(a: MgState, b: MgState): MgState = {
      var c = a.counts
      b.counts.foreach { case (t, n) => c = c.updated(t, c.getOrElse(t, 0L) + n) }
      if (c.size > k) {
        // subtract the (k+1)-st largest count from all, keep positives —
        // the standard MG merge; at most k entries survive
        val d = c.valuesIterator.toArray.sortBy(-_).apply(k)
        c = c.collect { case (w, n) if n > d => (w, n - d) }
      }
      MgState(c, a.total + b.total)
    }

    override def finish(st: MgState): MgState = st
    override def bufferEncoder: Encoder[MgState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgState]()
    override def outputEncoder: Encoder[MgState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgState]()
  }

  /** EXACT corpus-frequent tokens (support >= supportPpm parts-per-million
    * of all tokens) without ever group-by-ing the full token stream — the
    * two-pass heavy-hitters shape:
    *
    *   pass 1: MG sketch (k >= 1e6/supportPpm counters, so nothing above
    *           the support threshold can be evicted) + the exact total,
    *           one scan, sketch-sized shuffle;
    *   pass 2: exact counts of the <= k candidates only — the filter drops
    *           the long tail BEFORE the exchange, so the group-by shuffles
    *           candidate tokens, not the corpus.
    *
    * Output (token, cnt, n_total) is exact, so a plain HAVING-count SQL
    * replay hash-matches it. */
  def frequentTokens(df: org.apache.spark.sql.DataFrame, textCol: String,
      supportPpm: Long, k: Int = 64): org.apache.spark.sql.DataFrame = {
    require(supportPpm > 0 && supportPpm <= 1000000L,
      s"supportPpm out of range: $supportPpm")
    require(k.toLong * supportPpm >= 1000000L,
      s"k=$k too small for support $supportPpm ppm (need k >= 1e6/ppm " +
        s"= ${1000000L / supportPpm + 1} for the MG no-miss guarantee)")
    import graft.operators.TextOps
    val mg = udaf(new MgAggregator(k))
    val st = df.select(TextOps.tokens(col(textCol)).as("tk"))
      .agg(mg(col("tk")).as("s"))
      .select(col("s.counts").as("c"), col("s.total").as("t"))
      .head()
    val total = st.getLong(1)
    val candidates = st.getMap[String, Long](0).keys.toSeq
    // cnt >= ceil(total * ppm / 1e6)  ⇔  cnt * 1e6 >= total * ppm (ints)
    val threshold =
      if (total == 0L) 1L
      else (total * supportPpm + 999999L) / 1000000L
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token").isInCollection(candidates))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(threshold))
      .withColumn("n_total", lit(total))
  }

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
