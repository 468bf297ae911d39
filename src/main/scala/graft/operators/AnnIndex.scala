package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, DeltaSink}

/** Persisted ANN index lifecycle — the production shape of the similarity
  * stack: at 100 TB an index is trained ONCE, stored as a lakehouse table,
  * and SERVED from the stored rows on every search. Retraining per query
  * (what the inline operators in [[Similarity]] do, correct as they are)
  * is the real bottleneck — k-means / codebook fits are multi-pass jobs
  * over the whole corpus, while a search only needs the bounded model
  * literals.
  *
  * The index table is a native Delta table (the repo's own
  * [[graft.catalog.DeltaSink]] writer / [[graft.sources.DeltaNative]]
  * reader — time travel, CDF and incremental reads come for free) holding
  * one row per learned centroid:
  *
  *   kind STRING         'ivf' (k-means cell centroids) | 'pq' (codebooks)
  *                       | 'sq' (the int8-encoded corpus — per-vector rows,
  *                       served distributed, never as driver literals)
  *   spec_version INT    layout + training-arithmetic version; a search
  *                       refuses rows from a different spec loudly rather
  *                       than silently mixing arithmetic generations
  *   part BIGINT         PQ subspace index (0 for ivf)
  *   cell BIGINT         cell id / code id within the part
  *   centroid ARRAY<DOUBLE>
  *
  * Because the training is the DETERMINISTIC seeded k-means of
  * [[Similarity.kmeansModel]] / [[Similarity.pqModel]], a search served
  * from the persisted rows is bit-identical to the inline-trained path —
  * which is what lets the s17/s18 oracle queries hash-check the whole
  * lifecycle against DuckDB replaying the one deterministic chain.
  *
  * Scale shape: the model is bounded by design (kCells × dim doubles; PQ:
  * m × kCodes × subDim), so loading it is a bounded-driver-literal read —
  * the same contract as the inline training's driver-resident model. The
  * corpus never shuffles: assignment/encoding stay pure projections
  * against the loaded literals ([[Similarity.ivfSearchWithModel]] /
  * [[Similarity.pqSearchWithModel]]), and AnnIndexSpec pins ZERO training
  * runs on the search path via [[Similarity.trainingRuns]].
  *
  * Incremental append-then-reprobe: new vectors DON'T retrain the index —
  * they are assigned to the existing cells by the same projection, so
  * `searchIvf(..., base ∪ appended, ...)` serves the grown corpus from the
  * unchanged model (s18). Rebuild (a fresh [[write]] with overwrite) is a
  * deliberate, scheduled maintenance action, exactly like OPTIMIZE. */
object AnnIndex {

  /** Bump when the row layout or the training arithmetic changes. */
  val SpecVersion = 1

  case class AnnIndexException(msg: String) extends RuntimeException(msg)

  private val ModelCols = Seq("kind", "spec_version", "part", "cell", "centroid")

  /** Train an IVF centroid model (deterministic seeded k-means) and shape
    * it as index rows ready to [[write]]. */
  def buildIvf(candidates: DataFrame, kCells: Int, iters: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    Similarity.kmeansModel(candidates, kCells, iters)
      .map { case (cell, v) => ("ivf", SpecVersion, 0L, cell, v.toSeq) }
      .toDF(ModelCols: _*)
  }

  /** Train PQ codebooks (one per subspace) as index rows. */
  def buildPq(candidates: DataFrame, m: Int, kCodes: Int, iters: Int,
      dim: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    Similarity.pqModel(candidates, m, kCodes, iters, dim).zipWithIndex
      .flatMap { case (cb, s) =>
        cb.map { case (code, v) => ("pq", SpecVersion, s.toLong, code, v.toSeq) }
      }
      .toDF(ModelCols: _*)
  }

  /** Persist model rows as a native Delta table; overwrite = REBUILD (the
    * old model generation stays time-travelable in the log). */
  def write(model: DataFrame, path: String): Unit =
    DeltaSink.write(model, path, Map("overwrite" -> "true"))

  /** Idempotent build-if-absent: train + persist only when no index table
    * exists at `path` — the arrangement batch pipelines and the oracle
    * queries share (first run builds, every later run serves). */
  def ensureIvf(candidates: DataFrame, path: String, kCells: Int,
      iters: Int): Unit =
    if (!exists(candidates.sparkSession, path))
      write(buildIvf(candidates, kCells, iters), path)

  /** Idempotent PQ sibling of [[ensureIvf]]. */
  def ensurePq(candidates: DataFrame, path: String, m: Int, kCodes: Int,
      iters: Int, dim: Int): Unit =
    if (!exists(candidates.sparkSession, path))
      write(buildPq(candidates, m, kCodes, iters, dim), path)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_delta_log")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def loadRows(spark: SparkSession, path: String,
      kind: String): Array[(Long, Long, Array[Double])] = {
    val view = s"ann_index_${Integer.toHexString(path.hashCode)}"
    val df = Catalog.attach(spark, view, "delta", Map("files" -> path))
    val rows = df.filter(col("kind") === kind)
      .select(col("spec_version"), col("part"), col("cell"), col("centroid"))
      .collect()
    if (rows.isEmpty) throw AnnIndexException(
      s"`$path`: no `$kind` model rows in the index table — build it with " +
        s"AnnIndex.build${kind.capitalize} + write, or check `kind`")
    rows.iterator.map(_.getInt(0)).find(_ != SpecVersion).foreach { v =>
      throw AnnIndexException(
        s"`$path`: index rows carry spec_version $v but this engine serves " +
          s"$SpecVersion — rebuild the index rather than mixing arithmetic " +
          "generations")
    }
    rows.map(r => (r.getLong(1), r.getLong(2), r.getSeq[Double](3).toArray))
  }

  /** Load the persisted IVF centroid model — bounded driver literals,
    * zero training. */
  def loadIvf(spark: SparkSession, path: String): Seq[(Long, Array[Double])] =
    loadRows(spark, path, "ivf").sortBy(_._2).map(t => t._2 -> t._3).toSeq

  /** Load the persisted PQ codebooks, outer seq ordered by subspace. */
  def loadPq(spark: SparkSession, path: String): Seq[Seq[(Long, Array[Double])]] =
    loadRows(spark, path, "pq").groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(t => t._2 -> t._3).toSeq }

  /** Serve an IVF search from the persisted index — no training jobs, the
    * model loads as bounded literals and the search is
    * [[Similarity.ivfSearchWithModel]]'s projection+probe plan. */
  def searchIvf(spark: SparkSession, indexPath: String, queries: DataFrame,
      candidates: DataFrame, k: Int, nprobe: Int): DataFrame =
    Similarity.ivfSearchWithModel(queries, candidates, k,
      loadIvf(spark, indexPath), nprobe)

  /** Serve a PQ-ADC search from the persisted codebooks. */
  def searchPq(spark: SparkSession, indexPath: String, queries: DataFrame,
      candidates: DataFrame, k: Int, dim: Int): DataFrame =
    Similarity.pqSearchWithModel(queries, candidates, k,
      loadPq(spark, indexPath), dim)

  // ------------------------------------------------------------ SQ8 kind

  /** SQ8 index rows — kind='sq' completes the index matrix: unlike the
    * ivf/pq kinds (bounded MODELS, driver literals) the SQ artifact is the
    * ENCODED CORPUS itself — one row per vector, `cell` = vec_id,
    * `centroid` = the int8 codes (values in [-127,127], exact in DOUBLE —
    * the shared layout needs no new column). There is nothing to train
    * (the max-abs quantizer is a projection), so what the persisted table
    * amortizes is the per-invocation ENCODE pass over the whole corpus
    * that [[Similarity.sqRerankTopK]] pays — at 100 TB the 4×-smaller code
    * table is built once and every search reads IT, not the embeddings.
    * Built fully distributed (never collected — per-vector rows are
    * unbounded, unlike the centroid kinds). */
  def buildSq(candidates: DataFrame): DataFrame =
    Similarity.sqEncode(candidates).select(
      lit("sq").as("kind"), lit(SpecVersion).as("spec_version"),
      lit(0L).as("part"), col("vec_id").as("cell"),
      col("__qcf").cast("array<double>").as("centroid"))

  /** Idempotent SQ build-if-absent (the [[ensureIvf]] arrangement). */
  def ensureSq(candidates: DataFrame, path: String): Unit =
    if (!exists(candidates.sparkSession, path)) write(buildSq(candidates), path)

  /** Grow the code table as a corpus shard commits: encode ONLY the shard
    * and append its rows — no existing code is touched (codes are
    * per-vector, so incremental growth is exact, not an approximation). */
  def appendSq(shard: DataFrame, path: String): Unit =
    DeltaSink.write(buildSq(shard), path, Map.empty)

  /** Load the persisted code table as a DISTRIBUTED frame (vec_id, __qcf)
    * — never driver literals (per-vector rows scale with the corpus).
    * Spec-version and emptiness are checked with bounded probe jobs. */
  def loadSqCodes(spark: SparkSession, path: String): DataFrame = {
    val view = s"ann_index_${Integer.toHexString(path.hashCode)}"
    val df = Catalog.attach(spark, view, "delta", Map("files" -> path))
      .filter(col("kind") === "sq")
    if (df.isEmpty) throw AnnIndexException(
      s"`$path`: no `sq` model rows in the index table — build it with " +
        "AnnIndex.ensureSq, or check `kind`")
    val badSpec = df.filter(col("spec_version") =!= SpecVersion)
      .select(col("spec_version")).limit(1).collect()
    if (badSpec.nonEmpty) throw AnnIndexException(
      s"`$path`: index rows carry spec_version ${badSpec.head.getInt(0)} but " +
        s"this engine serves $SpecVersion — rebuild the index rather than " +
        "mixing arithmetic generations")
    df.select(col("cell").as("vec_id"),
      expr("transform(centroid, x -> cast(x as float))").as("__qcf"))
  }

  /** Serve the SQ two-stage search from the persisted code table — ZERO
    * encode jobs over the corpus ([[Similarity.encodeRuns]]-pinned): the
    * coarse pass reads the stored codes, the exact rerank reads full
    * vectors for only the candidate set. */
  def searchSq(spark: SparkSession, indexPath: String, queries: DataFrame,
      candidates: DataFrame, k: Int, kCand: Int): DataFrame =
    Similarity.sqRerankWithCodes(queries, loadSqCodes(spark, indexPath),
      candidates, k, kCand)
}
