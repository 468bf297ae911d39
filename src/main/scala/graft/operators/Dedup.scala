package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, ordered by cost:
  *
  *   1. exact      — hash-groupBy on a normalization of the text; one shuffle
  *                   on the hash. At 100 TB the hash is 16 bytes/doc, so the
  *                   shuffle is tiny relative to the scan.
  *   2. minhash    — k independent min-hashes over 3-token shingles; the
  *                   signature is k×(doc) rows, shuffled once on (doc, seed).
  *   3. LSH bands  — group the signature into b bands of r rows; equal band
  *                   signatures become join keys. Candidate generation is an
  *                   equi-join on (band, band_sig) — a hash shuffle, never a
  *                   cross join, so it scales linearly with collisions.
  *   4. verify     — n-gram Jaccard on the candidate pairs only.
  *
  * Hashes are md5 hex strings min'd lexicographically: deterministic and
  * identical in any engine (no engine-specific hash function), which is what
  * lets DuckDB act as the oracle.
  */
object Dedup {

  /** Mark exact duplicates (after lowercase + whitespace collapse): keeps the
    * lowest id per hash group. Returns (idCol, hash, keeper). */
  def exactMark(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = md5(regexp_replace(lower(col(textCol)), "\\s+", " "))
    df.withColumn("h", h)
      .withColumn("keeper", col(idCol) === min(col(idCol)).over(Window.partitionBy(col("h"))))
      .select(col(idCol), col("h"), col("keeper"))
  }

  /** 3-token shingles of the lowercased alphanumeric token stream.
    * Docs with <3 tokens produce no shingles (guarded: Spark's sequence()
    * counts DOWN when start>stop, which would fabricate shingles). */
  def shingles(text: Column): Column = {
    val tk = TextOps.tokens(text)
    when(size(tk) >= 3,
      transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))
      .otherwise(array())
  }

  /** Long-format MinHash signature over 3-token shingles: one row per
    * (doc, seed) with the lexicographic min of md5("<seed>:<shingle>") —
    * k seeds, one shuffle on (doc, seed).
    *
    * Shingles (not unigrams) are the right granularity when the vocabulary is
    * small relative to doc length: unigram token sets then have pathological
    * mutual Jaccard (~0.7 median on the test corpus → candidate blow-up),
    * while the shingle space is |V|³ and random-pair similarity collapses to
    * ~0 with true near-dups at ~0.98. */
  def minhash(df: DataFrame, textCol: String, idCol: String, k: Int = 16): DataFrame =
    df.select(col(idCol), explode(shingles(col(textCol))).as("shingle"))
      .select(col(idCol), col("shingle"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("seed"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(md5(concat_ws(":", col("seed").cast("string"), col("shingle")))).as("minh"))

  /** Band signatures from a long-format minhash: band = seed div rowsPerBand,
    * signature = md5 of the band's min-hashes in seed order. */
  def bandSignatures(sig: DataFrame, idCol: String, rowsPerBand: Int = 4): DataFrame =
    sig.withColumn("band", (col("seed") / rowsPerBand).cast("long"))
      .groupBy(col(idCol), col("band"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("minh")))), s => s("minh")),
        ",")).as("band_sig"))

  /** Candidate near-dup pairs: equi-join on equal band signatures. */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("doc_a"), col("band"), col("band_sig"))
    val b = bands.select(col(idCol).as("doc_b"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Shingle-set Jaccard for given (doc_a, doc_b) pairs — the verification
    * pass run on LSH candidates only, never all pairs. Uses the same shingle
    * granularity as the MinHash that produced the candidates. */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol), array_distinct(shingles(col(textCol))).as("tk"))
    val inter = size(array_intersect(col("tk_a"), col("tk_b")))
    pairs
      .join(toks.select(col(idCol).as("doc_a"), col("tk").as("tk_a")), "doc_a")
      .join(toks.select(col(idCol).as("doc_b"), col("tk").as("tk_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / (size(col("tk_a")) + size(col("tk_b")) - inter)).as("jaccard"))
  }

  /** 16-bit SimHash over the token stream (weighted by occurrence). Bits come
    * from the first 8 hex chars of md5(token); contribution is ±1 per bit per
    * occurrence; the final hash packs sign bits. Pure integer arithmetic —
    * exact in any engine. */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h32", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .select(col(idCol), col("h32"), explode(sequence(lit(0), lit(15))).as("bit"))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(expr("CASE WHEN (shiftright(h32, bit) & 1) = 1 THEN 1 ELSE -1 END")).as("s"))
      .groupBy(col(idCol))
      .agg(expr("CAST(sum(CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) " +
        "ELSE CAST(0 AS BIGINT) END) AS BIGINT)").as("simhash"))
}
