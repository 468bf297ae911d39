package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Skew torture for the dedup/LSH chain (VERDICT r3 "Next round #2"): a
  * corpus where 30% of documents share one boilerplate template — the
  * 100 TB norm — must not go quadratic. The maxBucket cap is the
  * load-bearing guard; this spec measures it engaging: candidate-pair
  * counts, per-task shuffle volume, and wall-clock, capped vs uncapped. */
class SkewSpec extends SparkSpec {

  private val boiler =
    "standard corporate boilerplate header this document is provided as is " +
      "without warranty of any kind express or implied"

  // 30% of sf0.001 documents (150 of 500) collapse onto one template
  private lazy val skewed = {
    val d = Tables.load(spark, sf, "documents")
    d.withColumn("text", when(col("doc_id") % 10 < 3, lit(boiler)).otherwise(col("text")))
  }

  private def pairs(cap: Int) = Dedup.candidatePairs(
    Dedup.bandSignatures(Dedup.minhashWide(skewed, "text", "doc_id"), "doc_id"),
    "doc_id", maxBucket = cap)

  test("uncapped boilerplate bucket is quadratic; the cap removes it") {
    // without the guard, 150 identical docs → 150·149/2 = 11175 pairs from
    // the hot bucket alone
    val uncapped = pairs(cap = 100000).count()
    assert(uncapped >= 11175L, s"expected the quadratic blow-up, got $uncapped")
    // with the guard engaged (bucket of 150 > cap of 100) only organic
    // candidates among the untouched 70% survive
    val capped = pairs(cap = 100).count()
    assert(capped < 100L, s"cap failed to drop the hot bucket: $capped pairs")
    // the torture is real: one bucket holds every boilerplate doc, so the
    // guard (size ≤ cap filter inside candidatePairs) is what stood between
    // the chain and m² work
    val hottest = Dedup
      .bandSignatures(Dedup.minhashWide(skewed, "text", "doc_id"), "doc_id")
      .groupBy("band", "band_sig").count()
      .agg(max("count")).head().getLong(0)
    assert(hottest >= 150L, s"expected a 150-member hot bucket, max was $hottest")
  }

  test("capped chain keeps every task's shuffle volume bounded") {
    val maxTaskRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          maxTaskRecords.getAndUpdate(prev =>
            math.max(prev, m.shuffleReadMetrics.recordsRead))
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      pairs(cap = 100).count()
    } finally {
      // let the async listener bus drain before reading the counter
      var last = -1L
      var waited = 0
      while (waited < 3000 && last != maxTaskRecords.get) {
        last = maxTaskRecords.get; Thread.sleep(200); waited += 200
      }
      spark.sparkContext.removeSparkListener(listener)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    // 500 docs × 4 band rows = 2000 shuffle records total; even if the hot
    // key lands every boilerplate row on one reduce task that is ≤ 2000.
    // A regression to quadratic emission (11k+ pair rows through one task)
    // trips this bound.
    assert(maxTaskRecords.get <= 5000L,
      s"a task read ${maxTaskRecords.get} shuffle records — skew guard not holding")
    assert(secs < 120.0, s"capped LSH chain took ${secs}s on a 500-doc corpus")
  }
}
