package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Everything here derives from md5 of a stable row id — NOT from
  * `rand()` or an engine hash — so a sample or split is:
  *
  *   - reproducible across reruns (re-running the pipeline on the same
  *     100 TB yields byte-identical membership: no training doc silently
  *     migrates from train to test between snapshots);
  *   - engine-independent (DuckDB replays the same md5 arithmetic, which
  *     is what lets the oracle hash-check membership row by row);
  *   - shuffle-free (the bucket is a per-row projection; sampling and
  *     splitting never exchange data — the 100 TB scan is the only cost).
  *
  * The first 4 md5 hex chars give a uniform 16-bit bucket folded mod
  * `buckets`; at 3 buckets of a trillion rows the 65536-value lattice
  * skews each cell by <0.002% — negligible against corpus-level noise.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the md5 of the id's string form. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % buckets

  /** Adds `bucket` and a train/val/test `split` label: the canonical
    * held-out-set assignment. trainPct + valPct must leave room for test. */
  def splitAssign(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(col(idCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic Bernoulli sample: keeps rows whose bucket < pct. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    df.filter(hashBucket(col(idCol)) < pct)
  }

  /** Stratified deterministic sample: per-stratum keep-percentages, rows
    * in unlisted strata are dropped. Rates ride along as a CASE projection
    * — no join, no shuffle, any corpus size. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int]): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample needs at least one stratum rate")
    rates.values.foreach(p => require(p >= 0 && p <= 100, s"pct out of range: $p"))
    val pct = rates.foldLeft(lit(-1)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, p).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < pct)
  }
}
