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

  /** TEMPERATURE-MIXED domain sampling — the multi-source pretraining
    * recipe (α-sampling as in XLM-R / mBERT, arXiv:1901.07291): domain d's
    * target share ∝ count_d^α, with α<1 flattening the mix toward uniform
    * so head domains stop drowning the tail. Downsample-only rendering:
    *
    *   rate_d = min(1, (count_d^α / count_d) · min_e(count_e / count_e^α))
    *
    * — the Σ count^α normalizer CANCELS out of the rate, so every
    * arithmetic step is a correctly-rounded IEEE single op (integer count,
    * sqrt/pow, divide, multiply, min) with NO order-dependent sum — which
    * is what lets DuckDB replay the rates bit-identically. The domain at
    * the min is kept whole; α=1 keeps everything.
    *
    * Scale shape: the rate table is one tiny aggregate (|domains| rows)
    * broadcast back; membership is the same md5 lattice as every sampler
    * here (16-bit fraction vs rate — reproducible, engine-independent).
    * The corpus-side cost is one scan + one broadcast-join projection. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    // α=0.5 goes through sqrt explicitly: Math.pow(x, 0.5) and sqrt(x) are
    // not the same IEEE operation, and only sqrt is correctly rounded
    def powA(c: Column): Column = if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    val w = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", powA(col("__n")))
    val rates = w
      .withColumn("__cmin", min(col("__n") / col("__w"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(domainCol),
        least(lit(1.0), col("__w") / col("__n") * col("__cmin")).as("keep_rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashBucket(col(idCol), 65536).cast("double") / lit(65536.0)
        < col("keep_rate"))
      .select(col(idCol), col(domainCol), col("keep_rate"))
  }

  /** DuckDB rendering of the α=0.5 temperature mix over `rel(idCol,
    * domainCol)` — same cancelled-normalizer arithmetic, same md5 lattice. */
  def temperatureMixSql(rel: String, idCol: String, domainCol: String): String =
    s"""
      WITH n AS (SELECT $domainCol, CAST(count(*) AS DOUBLE) AS nd
                 FROM $rel AS src0 GROUP BY $domainCol),
      w AS (SELECT $domainCol, nd, sqrt(nd) AS wd FROM n),
      cm AS (SELECT min(nd / wd) AS cmin FROM w),
      r AS (SELECT $domainCol, least(1.0, wd / nd * cmin) AS keep_rate FROM w, cm)
      SELECT d.$idCol, d.$domainCol, r.keep_rate
      FROM $rel AS d JOIN r USING ($domainCol)
      WHERE ('0x' || substr(md5(CAST(d.$idCol AS VARCHAR)), 1, 4))::BIGINT % 65536
              / 65536.0 < r.keep_rate"""

  /** PER-DOMAIN CAP — the crawl-curation rule "no domain contributes more
    * than N documents": rows rank within their domain by (md5(id), id) —
    * the same engine-independent lattice as every sampler here, so WHICH
    * rows survive is deterministic and rerun-stable, not arrival-order —
    * and rank > cap drops. One shuffle on the domain key (the unavoidable
    * one); a skewed megadomain is one partition's window, bounded because
    * the window computes rank only (no buffering of the frame). */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= cap)
  }

  /** DuckDB rendering of the same cap over `rel(idCol, domainCol)`. */
  def domainCapSql(rel: String, idCol: String, domainCol: String, cap: Int): String =
    s"""
      SELECT * FROM (
        SELECT $idCol, $domainCol,
               CAST(row_number() OVER (PARTITION BY $domainCol
                 ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS BIGINT) AS domain_rank
        FROM $rel) x
      WHERE domain_rank <= $cap"""

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
