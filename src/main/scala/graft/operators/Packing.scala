package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic offline sequence packing — the step between a curated
  * corpus and an LLM training run: lay every document out on one global
  * token stream (ordered by the stable doc id) and assign each to its
  * fixed-length training sequence.
  *
  * The core is a DISTRIBUTED PREFIX SUM. A naive `sum() OVER (ORDER BY id)`
  * with no PARTITION BY collapses to a single-partition window — one task
  * scans the world, the exact shape that dies at 100 TB. Instead:
  *
  *   1. project to (id, n) FIRST — the scan is the only place the text is
  *      read; the prefix machinery moves 16-byte rows, never documents;
  *   2. range-repartition by id (partition i holds ids strictly below
  *      partition i+1) and take per-partition running sums in parallel
  *      windows keyed by partition id;
  *   3. collect ONE row per partition (bounded by the shuffle-partition
  *      count — the only driver state), scan-left those totals into
  *      per-partition start offsets, and broadcast them back.
  *
  * The result is partition-independent: the global offset of a doc is the
  * sum of token counts over all smaller ids, no matter where the range
  * boundaries fell — which is what lets a plain windowed SQL replay act as
  * the hash-exact oracle. */
object Packing {

  /** Adds the global stream offset and sequence assignment for each row:
    * `start_off` (tokens before this doc), `seq_id` (= start_off div
    * seqLen), and `crosses_seq` (doc straddles a sequence boundary — the
    * rows a no-split packer must segment or drop). `nCol` must be a
    * non-negative count column; `idCol` must be unique. */
  def packOffsets(df: DataFrame, idCol: String, nCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"packOffsets seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val slim = df.select(col(idCol), col(nCol).cast("long").as(nCol))
    // Range-bucket ids against DRIVER-LITERAL boundaries (one approx-
    // quantile pass), NOT repartitionByRange + spark_partition_id: range
    // partitioning re-SAMPLES its boundaries per job, and this frame runs
    // two jobs (the totals collect, then the final join) — boundaries that
    // land differently between them mis-map every partition offset. A
    // literal id→bucket expression is identical in every job by
    // construction; boundary QUALITY only affects balance, never
    // correctness, so a coarse quantile error is fine.
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds: Array[Double] =
      if (probs.isEmpty) Array.empty
      else slim.stat.approxQuantile(idCol, probs, 0.01).distinct.sorted
    val pidExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(idCol) >= lit(b), 1).otherwise(0)
    }
    val parted = slim.withColumn("__pid", pidExpr)
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__run", sum(col(nCol)).over(w))
    // one row per populated partition — the bounded driver-side state
    val totals = local.groupBy("__pid").agg(max(col("__run")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    local.join(broadcast(offDf), "__pid")
      .withColumn("start_off", col("__off") + col("__run") - col(nCol))
      // last token's offset; empty docs occupy their start slot for the test
      .withColumn("__end", col("start_off") + greatest(col(nCol), lit(1L)) - 1)
      .select(col(idCol), col(nCol),
        col("start_off"),
        expr(s"start_off DIV $seqLen").as("seq_id"),
        (expr(s"start_off DIV $seqLen") =!= expr(s"__end DIV $seqLen"))
          .as("crosses_seq"))
  }
}
