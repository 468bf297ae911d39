package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Hyperplane-LSH at growing corpus size: with FIXED bits per band, bucket
  * occupancy (and so candidate volume) grows linearly with n — the scale
  * answer is bits ~ log2(n), which needs a plane family larger than the
  * 16-entry minhash set. Pins the extended family's determinism and the
  * sizing helper's effect on real buckets. */
class SimilarityScaleSpec extends SparkSpec {

  test("plane family: first 16 pinned to the minhash coeffs, extension deterministic") {
    assert(Similarity.planeCoeffs.take(16) === Dedup.coeffs)
    assert(Similarity.planeCoeffs.length === 64)
    assert(Similarity.planeCoeffs.forall { case (a, b) =>
      a > 0 && b > 0 && a < Dedup.P && b < Dedup.P })
    // derivation is a pure function — re-evaluation yields the same pairs
    assert(Similarity.planeCoeffs === Similarity.planeCoeffs.map(identity))
  }

  test("lshBitsFor sizes bits to the corpus") {
    assert(Similarity.lshBitsFor(2000) === 8) // small corpus → floor
    assert(Similarity.lshBitsFor(1L << 20, targetBucket = 64) === 14) // 1M/64 → 2^14
    assert(Similarity.lshBitsFor(Long.MaxValue) === 32) // clamped to planes/bands
  }

  test("wider bands cut bucket occupancy on a grown corpus") {
    val e = Tables.load(spark, sf, "embeddings")
    // 8 rotated copies (norm-preserving, directionally distinct) — the same
    // derivation StressGen uses for the ladder
    val big = (0 until 8).map { i =>
      val rot = if (i == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), slice(embedding, 1, $i))")
      e.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), rot.as("embedding"))
    }.reduce(_ unionByName _)
    def maxOcc(k: Int, rpb: Int): Long =
      Similarity.cosineLshBands(big, "vec_id", "embedding", k, rpb)
        .groupBy("band", "band_sig").count()
        .agg(max("count")).head().getLong(0)
    val occ8 = maxOcc(16, 8) // 256 buckets/band for 1600 vectors
    val occ13 = maxOcc(26, 13) // 8192 buckets/band
    assert(occ13 < occ8,
      s"13-bit bands should shrink the hottest bucket: 8-bit max $occ8, 13-bit max $occ13")
  }
}
