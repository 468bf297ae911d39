package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** Persisted ANN index lifecycle: build → write (native Delta) → load →
  * search must be bit-identical to the inline-trained path, and the
  * search path must run ZERO training jobs (the production contract —
  * at 100 TB the index is trained once and served, never retrained per
  * query). Also pins spec-version and missing-kind loud rejects, and PQ
  * codebook round-trips. */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/embeddings.parquet")
  }
  private lazy val candidates =
    emb.filter(col("vec_id") >= 5).select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._3))

  test("ivf: build→persist→load round-trips the exact model") {
    val dir = tempDir("annidx").getAbsolutePath
    val model = Similarity.kmeansModel(candidates, kCells = 4, iters = 2)
    AnnIndex.write(AnnIndex.buildIvf(candidates, 4, 2), s"$dir/ivf")
    val loaded = AnnIndex.loadIvf(spark, s"$dir/ivf")
    assert(loaded.map(_._1) === model.map(_._1))
    assert(loaded.map(_._2.toSeq) === model.map(_._2.toSeq)) // exact doubles
  }

  test("ivf: persisted search is bit-identical to inline training, zero training jobs") {
    val dir = tempDir("annidx").getAbsolutePath
    val inline = rowsOf(Similarity.ivfTopKLearned(queries, candidates, 7,
      kCells = 4, iters = 2, nprobe = 2))
    AnnIndex.ensureIvf(candidates, s"$dir/ivf", 4, 2)
    // ensure is idempotent: a second call must not rebuild (same version)
    AnnIndex.ensureIvf(candidates, s"$dir/ivf", 4, 2)
    val before = Similarity.trainingRuns.get()
    val served = rowsOf(AnnIndex.searchIvf(spark, s"$dir/ivf", queries,
      candidates, 7, nprobe = 2))
    assert(Similarity.trainingRuns.get() === before,
      "the persisted-index search path ran a training job")
    assert(served === inline)
  }

  test("ivf: a second session serves the stored index without retraining") {
    val dir = tempDir("annidx").getAbsolutePath
    AnnIndex.ensureIvf(candidates, s"$dir/ivf", 4, 2)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb2 = s2.read.parquet(s"$sf/embeddings.parquet")
    val cand2 = emb2.filter(col("vec_id") >= 5).select(col("vec_id"), col("embedding"))
    val q2 = emb2.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val before = Similarity.trainingRuns.get()
    val served = rowsOf(AnnIndex.searchIvf(s2, s"$dir/ivf", q2, cand2, 5, nprobe = 1))
    assert(Similarity.trainingRuns.get() === before)
    assert(served.nonEmpty && served ===
      rowsOf(Similarity.ivfTopKLearned(queries, candidates, 5, 4, 2, nprobe = 1)))
  }

  test("pq: codebooks round-trip and serve identically to inline") {
    val dir = tempDir("annidx").getAbsolutePath
    val dim = candidates.select(size(col("embedding"))).head().getInt(0)
    val model = Similarity.pqModel(candidates, m = 8, kCodes = 8, iters = 2, dim = dim)
    AnnIndex.ensurePq(candidates, s"$dir/pq", 8, 8, 2, dim)
    val loaded = AnnIndex.loadPq(spark, s"$dir/pq")
    assert(loaded.length === model.length)
    loaded.zip(model).foreach { case (l, m2) =>
      assert(l.map(_._1) === m2.map(_._1))
      assert(l.map(_._2.toSeq) === m2.map(_._2.toSeq))
    }
    val inline = rowsOf(Similarity.pqTopK(queries, candidates, 6))
    val before = Similarity.trainingRuns.get()
    val served = rowsOf(AnnIndex.searchPq(spark, s"$dir/pq", queries,
      candidates, 6, dim))
    assert(Similarity.trainingRuns.get() === before)
    assert(served === inline)
  }

  test("sq: persisted code table serves bit-identically to inline, zero encode jobs") {
    val dir = tempDir("annidx").getAbsolutePath
    val inline = rowsOf(Similarity.sqRerankTopK(queries, candidates, 6, kCand = 20))
    AnnIndex.ensureSq(candidates, s"$dir/sq")
    AnnIndex.ensureSq(candidates, s"$dir/sq") // idempotent
    val before = Similarity.encodeRuns.get()
    val served = rowsOf(AnnIndex.searchSq(spark, s"$dir/sq", queries,
      candidates, 6, kCand = 20))
    assert(Similarity.encodeRuns.get() === before,
      "the persisted-code-table search path re-encoded the corpus")
    assert(served === inline)
  }

  test("sq: appended shard codes serve the grown corpus exactly") {
    val dir = tempDir("annidx").getAbsolutePath
    val base = candidates.filter(col("vec_id") % 5 =!= 0)
    val shard = candidates.filter(col("vec_id") % 5 === 0)
    AnnIndex.ensureSq(base, s"$dir/sq")
    AnnIndex.appendSq(shard, s"$dir/sq")
    // codes are per-vector, so base ∪ shard served from the grown table
    // is EXACTLY the inline chain over the whole corpus (unlike ivf's
    // append-then-reprobe approximation)
    val inline = rowsOf(Similarity.sqRerankTopK(queries, candidates, 6, kCand = 20))
    val before = Similarity.encodeRuns.get()
    val served = rowsOf(AnnIndex.searchSq(spark, s"$dir/sq", queries,
      candidates, 6, kCand = 20))
    assert(Similarity.encodeRuns.get() === before)
    assert(served === inline)
  }

  test("spec-version and missing-kind rejects are loud") {
    val dir = tempDir("annidx").getAbsolutePath
    AnnIndex.ensureIvf(candidates, s"$dir/ivf", 4, 2)
    val e1 = intercept[AnnIndex.AnnIndexException] {
      AnnIndex.loadPq(spark, s"$dir/ivf") // table holds only ivf rows
    }
    assert(e1.getMessage.contains("no `pq` model rows"))
    // forge a future-spec table: same rows, bumped spec_version
    val ivfDf = graft.catalog.Catalog.attach(spark,
      "ann_spec_forge_src", "delta", Map("files" -> s"$dir/ivf"))
      .withColumn("spec_version", lit(AnnIndex.SpecVersion + 1))
    AnnIndex.write(ivfDf, s"$dir/forged")
    val e2 = intercept[AnnIndex.AnnIndexException] {
      AnnIndex.loadIvf(spark, s"$dir/forged")
    }
    assert(e2.getMessage.contains("spec_version"))
    val e3 = intercept[AnnIndex.AnnIndexException] {
      AnnIndex.loadSqCodes(spark, s"$dir/ivf") // no sq rows here
    }
    assert(e3.getMessage.contains("no `sq` model rows"))
    AnnIndex.ensureSq(candidates, s"$dir/sq")
    val sqDf = graft.catalog.Catalog.attach(spark,
      "ann_spec_forge_sq", "delta", Map("files" -> s"$dir/sq"))
      .withColumn("spec_version", lit(AnnIndex.SpecVersion + 1))
    AnnIndex.write(sqDf, s"$dir/sqforged")
    val e4 = intercept[AnnIndex.AnnIndexException] {
      AnnIndex.loadSqCodes(spark, s"$dir/sqforged")
    }
    assert(e4.getMessage.contains("spec_version"))
  }
}
