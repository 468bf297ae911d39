package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Numerics contract: dot products fold left sequentially in DOUBLE —
  * `aggregate(zip_with(...))` in Spark and `list_reduce(list_transform(...))`
  * in DuckDB produce bitwise-identical sums, so cosine scores (and therefore
  * rankings) hash-match across engines.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * linearly scans candidates — one pass, no shuffle except the final top-k.
  * The IVF path cuts the scan by a cluster factor: coarse-quantize once,
  * shuffle candidates by cell, probe only the nearest cell(s).
  */
object Similarity {

  /** Sequential-fold dot product of two float-vector columns, in double —
    * the native codegen `vec_dot` expression (graft.functions.VecDot): one
    * primitive loop per row, same left-to-right fold arithmetic as the HOF
    * `aggregate(zip_with(...))` form it replaced, so every oracle stays
    * bit-identical. */
  def dot(a: String, b: String): Column = expr(s"vec_dot($a, $b)")

  def norm(a: String): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (graft.functions.VecCosine): same expression
    * tree as dot/(norm·norm) — bit-identical — in one array traversal. */
  def cosine(a: String, b: String): Column = expr(s"vec_cosine($a, $b)")

  /** The DuckDB rendering of the same sequential-fold cosine (oracle side). */
  def cosineSql(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_reduce(list_transform(generate_series(1, len($x)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE), (acc, v) -> acc + v)"
    s"(${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)})))"
  }

  /** Two-phase exact top-k per query. A single window over partitionBy(q_id)
    * funnels EVERY scored candidate row of a query into one task — a
    * straggler/OOM by construction at 100 TB. Phase 1 takes each INPUT
    * partition's local top-k (the (q_id, partition) exchange spreads evenly,
    * no hot key); phase 2 merges ≤ k rows per partition per query — tiny.
    * Exact: the global top-k is a subset of the union of local top-ks, and
    * the (cos_sim desc, vec_id) order is total, so ranks are deterministic. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val local = Window.partitionBy(col("q_id"), col("__part"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val pruned = scored.withColumn("__part", spark_partition_id())
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
  }

  /** Exact ANN baseline: brute-force cosine top-k of each query against all
    * candidates. queries: (q_id, q_vec) — small, broadcast; candidates:
    * (vec_id, embedding) — scanned once. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .withColumn("cos_sim", cosine("q_vec", "embedding"))
    topKPerQuery(scored, k)
  }

  /** Per-label centroids (element-wise mean), DETERMINISTIC without any
    * per-cell materialization: each member value casts to fixed-point
    * DECIMAL(38,12) (float→double is exact; double→decimal is one defined
    * rounding both engines share), and decimal addition is exact and
    * ASSOCIATIVE — order-independent, so it replays bit-identically in
    * DuckDB. Runs as the native `vec_decimal_mean` typed aggregate
    * (graft.functions.VecDecimalMean): whole vectors fold into one
    * dim-sized decimal buffer per group — no row-per-dimension explode
    * through the shuffle; the exchange carries one small buffer per
    * (group, partition). This gives the IVF path a hash oracle AND the
    * 100 TB shape. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.groupBy(col("label"))
      .agg(call_function("vec_decimal_mean", col("embedding")).as("centroid"))

  /** The DuckDB rendering of labelCentroids' arithmetic (oracle side):
    * the same associative fixed-point sums, list ordered by dimension. */
  def centroidsSql(candidatesRel: String): String = s"""
      cx AS (SELECT label, cv,
                    unnest(generate_series(1, len(cv))) AS pos FROM $candidatesRel),
      psum AS (SELECT label, pos,
                      sum(cv[pos]::DOUBLE::DECIMAL(38,12)) AS sum_v,
                      count(*) AS n
               FROM cx GROUP BY label, pos),
      cent AS (SELECT label, list(sum_v::DOUBLE / n ORDER BY pos) AS centroid
               FROM psum GROUP BY label)"""

  // --------------------------------------------- cosine LSH (hyperplanes)

  /** Dot product against a deterministic pseudo-random ±1 hyperplane: the
    * sign of component i comes from the same linear-congruential family as
    * the MinHash permutations ((a·i + b) mod P parity), so ANY engine can
    * regenerate the planes from two integers — no 64-float literals in
    * oracle SQL, no RNG. Native codegen expression
    * (graft.functions.VecSignDot) with the identical sequential double
    * fold the interpreted HOF form used (oracle-exact, buckets unchanged). */
  def hyperplaneDot(vecCol: String, a: Long, b: Long): Column =
    expr(s"vec_signdot($vecCol, ${a}L, ${b}L)")

  /** 64 hyperplane-coefficient pairs for sign-LSH. The first 16 are the
    * shared minhash family (existing oracles pin those literals); the rest
    * derive deterministically from md5 so the family extends to the plane
    * counts a billion-document corpus needs. Bucket occupancy is
    * n / 2^bitsPerBand: with fixed bits, candidates grow linearly in n per
    * bucket (quadratically overall) until the maxBucket cap starts DROPPING
    * buckets — so at scale, bits must grow with log2(n). 64 planes support
    * 32 bits/band × 2 bands: ~4G buckets/band, enough for 10^11 docs at
    * occupancy ~64. */
  val planeCoeffs: Seq[(Long, Long)] = Dedup.coeffs ++ (Dedup.coeffs.length until 64).map { i =>
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (BigInt(1, d) mod BigInt(Dedup.P - 2)).toLong + 1 // 1..P-2, deterministic
    }
    (h(s"plane-a-$i") | 1L, h(s"plane-b-$i"))
  }

  /** Bits per band for a corpus of n vectors targeting ~targetBucket
    * occupancy: ceil(log2(n / targetBucket)), clamped to [8, planes/bands].
    * The caller re-derives it from a count(), so the choice replays
    * deterministically in an oracle. */
  def lshBitsFor(n: Long, targetBucket: Int = 64, nBands: Int = 2): Int = {
    val want = math.max(1L, n / math.max(1, targetBucket))
    val bits = if (want <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(want - 1)
    math.min(planeCoeffs.length / nBands, math.max(8, bits))
  }

  /** (id, band, band_sig) rows from k sign bits split into k/rowsPerBand
    * bands — random-hyperplane LSH (SimHash for cosine space). Same banded
    * shape as Dedup.bandSignatures, so candidate generation reuses the
    * capped, join-free bucket grouping. Size rowsPerBand with lshBitsFor
    * when the corpus outgrows the 8-bit default. */
  def cosineLshBands(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    require(k <= planeCoeffs.length && k % rowsPerBand == 0)
    val bits = planeCoeffs.take(k).zipWithIndex.map { case ((a, b), j) =>
      when(hyperplaneDot(vecCol, a, b) > 0, 1).otherwise(0).as(s"b$j")
    }
    val withBits = emb.select(col(idCol) +: bits: _*)
    val nBands = k / rowsPerBand
    val entries = (0 until nBands).map { bd =>
      val sig = (bd * rowsPerBand until (bd + 1) * rowsPerBand)
        .map(j => s"b$j * ${1L << (j % rowsPerBand)}L").mkString(" + ")
      s"CAST($bd AS BIGINT), CAST($sig AS STRING)"
    }.mkString(", ")
    withBits.selectExpr(idCol, s"stack($nBands, $entries) AS (band, band_sig)")
  }

  /** [[cosineLshBands]] with the vector column CARRIED THROUGH — the
    * streaming gate needs bands AND the vector on one row (re-joining the
    * stream to itself for the vector would be a stream-stream join with
    * state; carrying it is free). */
  def cosineLshBandsKeep(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    require(k <= planeCoeffs.length && k % rowsPerBand == 0)
    val bits = planeCoeffs.take(k).zipWithIndex.map { case ((a, b), j) =>
      when(hyperplaneDot(vecCol, a, b) > 0, 1).otherwise(0).as(s"b$j")
    }
    val withBits = emb.select(col(idCol) +: col(vecCol) +: bits: _*)
    val nBands = k / rowsPerBand
    val entries = (0 until nBands).map { bd =>
      val sig = (bd * rowsPerBand until (bd + 1) * rowsPerBand)
        .map(j => s"b$j * ${1L << (j % rowsPerBand)}L").mkString(" + ")
      s"CAST($bd AS BIGINT), CAST($sig AS STRING)"
    }.mkString(", ")
    withBits.selectExpr(idCol, vecCol, s"stack($nBands, $entries) AS (band, band_sig)")
  }

  /** Embedding near-dup at scale: hyperplane-LSH bucket join (never
    * all-pairs), capped hot buckets, exact cosine verification on the
    * candidates only. The 100 TB shape: one groupBy for buckets, pairs from
    * arrays, one join back to fetch vectors for the ≪ n² candidate set. */
  def cosineNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, k: Int = 16, rowsPerBand: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val pairs = Dedup.candidatePairs(cosineLshBands(emb, idCol, vecCol, k, rowsPerBand), idCol, maxBucket)
    val a = emb.select(col(idCol).as("doc_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("doc_b"), col(vecCol).as("vb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("cos_sim", cosine("va", "vb"))
      .filter(col("cos_sim") >= threshold)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"), col("cos_sim"))
  }

  /** Near-dup with LADDER-DERIVED band width: bits = lshBitsFor(count), so
    * bucket occupancy stays ~targetBucket at ANY corpus size instead of
    * letting per-bucket candidates grow linearly at a fixed 8 bits. The
    * count is one cheap aggregate (parquet footer metadata at best); the
    * oracle replays the identical derivation in SQL, so the sizing lever
    * itself is under the correctness gate at every scale the gate runs. */
  def cosineNearDupLshAuto(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, maxBucket: Int = 1000): DataFrame = {
    val bits = lshBitsFor(emb.count())
    cosineNearDupLsh(emb, idCol, vecCol, threshold,
      k = bits * 2, rowsPerBand = bits, maxBucket = maxBucket)
  }

  /** DuckDB rendering of the AUTO-SIZED chain: bits derive from count(*) in
    * SQL (`floor(log2(want - 0.5)) + 1` = exact ceil-log2 without float
    * edge cases), planes come from the same 64-pair deterministic family as
    * a VALUES table, and signatures build with dynamic list arithmetic —
    * the SQL stays one static string valid at EVERY scale factor. */
  def cosineLshAutoSql(threshold: Double = 0.9, maxBucket: Int = 1000,
      targetBucket: Int = 64): String = {
    val planeRows = planeCoeffs.zipWithIndex
      .map { case ((a, b), j) => s"($j, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
      .mkString(", ")
    val dot = "list_reduce(list_transform(generate_series(1, len(e.embedding)), " +
      s"i -> e.embedding[i]::DOUBLE * (CASE WHEN ((p.a * i + p.b) % ${Dedup.P}) % 2 = 0 " +
      "THEN 1.0 ELSE -1.0 END)), (acc, v) -> acc + v)"
    s"""
      WITH n AS (SELECT count(*) AS cnt FROM embeddings),
      params AS (SELECT LEAST(${planeCoeffs.length / 2}, GREATEST(8,
                   CASE WHEN GREATEST(1, cnt // $targetBucket) <= 1 THEN 1
                        ELSE CAST(floor(log2((cnt // $targetBucket) - 0.5)) AS INT) + 1
                   END)) AS bits
                 FROM n),
      planes(j, a, b) AS (VALUES $planeRows),
      bitrows AS (
        SELECT e.vec_id, p.j,
               CASE WHEN $dot > 0 THEN 1 ELSE 0 END AS bit
        FROM embeddings e, planes p, params
        WHERE p.j < 2 * params.bits),
      bands AS (
        SELECT vec_id, CAST(j // params.bits AS BIGINT) AS band,
               CAST(CAST(SUM(CAST(bit AS BIGINT) << (j % params.bits)) AS BIGINT) AS VARCHAR) AS band_sig
        FROM bitrows, params
        GROUP BY vec_id, j // params.bits),
      bcount AS (SELECT band, band_sig, count(*) AS n FROM bands GROUP BY band, band_sig),
      bandsok AS (SELECT b.vec_id, b.band, b.band_sig FROM bands b
                  JOIN bcount c ON b.band = c.band AND b.band_sig = c.band_sig AND c.n <= $maxBucket),
      pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                FROM bandsok a JOIN bandsok b
                  ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id)
      SELECT p.vec_a, p.vec_b, ${cosineSql("x.embedding", "y.embedding")} AS cos_sim
      FROM pairs p JOIN embeddings x ON p.vec_a = x.vec_id
                   JOIN embeddings y ON p.vec_b = y.vec_id
      WHERE ${cosineSql("x.embedding", "y.embedding")} >= $threshold"""
  }

  /** DuckDB rendering of the same LSH chain (oracle side). */
  def cosineLshSql(threshold: Double = 0.9, k: Int = 16, rowsPerBand: Int = 8,
      maxBucket: Int = 1000): String = {
    val dots = planeCoeffs.take(k).zipWithIndex.map { case ((a, b), j) =>
      s"CASE WHEN list_reduce(list_transform(generate_series(1, len(embedding)), " +
        s"i -> embedding[i]::DOUBLE * (CASE WHEN (($a * i + $b) % ${Dedup.P}) % 2 = 0 " +
        s"THEN 1.0 ELSE -1.0 END)), (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END AS b$j"
    }.mkString(",\n               ")
    val nBands = k / rowsPerBand
    val bandSelects = (0 until nBands).map { bd =>
      val sig = (bd * rowsPerBand until (bd + 1) * rowsPerBand)
        .map(j => s"b$j * ${1L << (j % rowsPerBand)}::BIGINT").mkString(" + ")
      s"SELECT vec_id, CAST($bd AS BIGINT) AS band, CAST($sig AS VARCHAR) AS band_sig FROM bits"
    }.mkString("\n        UNION ALL\n        ")
    s"""
      WITH bits AS (SELECT vec_id, $dots FROM embeddings),
      bands AS ($bandSelects),
      bcount AS (SELECT band, band_sig, count(*) AS n FROM bands GROUP BY band, band_sig),
      bandsok AS (SELECT b.vec_id, b.band, b.band_sig FROM bands b
                  JOIN bcount c ON b.band = c.band AND b.band_sig = c.band_sig AND c.n <= $maxBucket),
      pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                FROM bandsok a JOIN bandsok b
                  ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id)
      SELECT p.vec_a, p.vec_b, ${cosineSql("x.embedding", "y.embedding")} AS cos_sim
      FROM pairs p JOIN embeddings x ON p.vec_a = x.vec_id
                   JOIN embeddings y ON p.vec_b = y.vec_id
      WHERE ${cosineSql("x.embedding", "y.embedding")} >= $threshold"""
  }

  /** Oracle for the STREAMING near-dup gate (Streams.nearDupGate replayed
    * as batch SQL): corpus rows under `corpusPred` form the banded index
    * (hot buckets capped), arrivals under `arrivalPred` band identically,
    * candidates share (band, band_sig), exact cosine verifies — DISTINCT
    * collapses band multiplicity like the batch pass after the replay. */
  def nearDupGateSql(corpusPred: String, arrivalPred: String,
      threshold: Double = 0.9, k: Int = 16, rowsPerBand: Int = 8,
      maxBucket: Int = 1000): String = {
    val dots = planeCoeffs.take(k).zipWithIndex.map { case ((a, b), j) =>
      s"CASE WHEN list_reduce(list_transform(generate_series(1, len(embedding)), " +
        s"i -> embedding[i]::DOUBLE * (CASE WHEN (($a * i + $b) % ${Dedup.P}) % 2 = 0 " +
        s"THEN 1.0 ELSE -1.0 END)), (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END AS b$j"
    }.mkString(",\n               ")
    val nBands = k / rowsPerBand
    def bandSelects(src: String) = (0 until nBands).map { bd =>
      val sig = (bd * rowsPerBand until (bd + 1) * rowsPerBand)
        .map(j => s"b$j * ${1L << (j % rowsPerBand)}::BIGINT").mkString(" + ")
      s"SELECT vec_id, CAST($bd AS BIGINT) AS band, CAST($sig AS VARCHAR) AS band_sig FROM $src"
    }.mkString("\n        UNION ALL\n        ")
    s"""
      WITH cbits AS (SELECT vec_id, $dots FROM embeddings WHERE $corpusPred),
      abits AS (SELECT vec_id, $dots FROM embeddings WHERE $arrivalPred),
      cbands AS (${bandSelects("cbits")}),
      abands AS (${bandSelects("abits")}),
      bcount AS (SELECT band, band_sig, count(*) AS n FROM cbands GROUP BY band, band_sig),
      cok AS (SELECT b.vec_id, b.band, b.band_sig FROM cbands b
              JOIN bcount c ON b.band = c.band AND b.band_sig = c.band_sig AND c.n <= $maxBucket),
      pairs AS (SELECT DISTINCT a.vec_id AS vec_new, c.vec_id AS vec_corpus
                FROM abands a JOIN cok c ON a.band = c.band AND a.band_sig = c.band_sig)
      SELECT p.vec_new, p.vec_corpus, ${cosineSql("x.embedding", "y.embedding")} AS cos_sim
      FROM pairs p JOIN embeddings x ON p.vec_new = x.vec_id
                   JOIN embeddings y ON p.vec_corpus = y.vec_id
      WHERE ${cosineSql("x.embedding", "y.embedding")} >= $threshold"""
  }

  /** IVF-style ANN over a pre-clustered corpus: route each query to its
    * `nprobe` nearest centroid cells, then search only those cells. At
    * 100 TB this turns a full scan per query into an nprobe/cells scan;
    * cells are the shuffle key so each executor holds whole cells. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nprobe: Int = 1): DataFrame = {
    val cents = labelCentroids(candidates)
    val routed = routeQueries(queries, cents, "label", nprobe)
    val scored = candidates.join(broadcast(routed), "label")
      .withColumn("cos_sim", cosine("q_vec", "embedding"))
    topKPerQuery(scored, k)
  }

  /** (q_id, q_vec, cellCol) rows: each query's top-`nprobe` cells by
    * centroid cosine, ties by cell id. Centroids are tiny — broadcast. */
  private def routeQueries(queries: DataFrame, cents: DataFrame,
      cellCol: String, nprobe: Int): DataFrame = {
    val wq = Window.partitionBy(col("q_id")).orderBy(col("cell_sim").desc, col(cellCol))
    queries.crossJoin(broadcast(cents))
      .withColumn("cell_sim", cosine("q_vec", "centroid"))
      .withColumn("cr", row_number().over(wq))
      .filter(col("cr") <= nprobe)
      .select(col("q_id"), col("q_vec"), col(cellCol))
  }

  // ------------------------------------------------- learned IVF (k-means)

  /** Deterministic seeded k-means, oracle-replayable in any engine:
    *   - seeds: the `kCells` candidates with the smallest
    *     md5(vec_id)-derived hex key (a fixed pseudo-random draw — no RNG);
    *     cell ids 0..k-1 follow that hash order.
    *   - assignment: argmax centroid cosine (sequential-fold), ties to the
    *     smaller cell id.
    *   - update: per-dimension mean via associative fixed-point
    *     DECIMAL(38,12) sums — order-independent, exact, so every iteration
    *     replays bit-identically in DuckDB.
    *   - `iters` is FIXED (no convergence test — data-dependent stopping
    *     would not be oracle-replayable).
    *
    * Scale shape — the MLlib pattern: the centroid MODEL (kCells × dim
    * doubles, bounded by design) lives on the driver between iterations.
    * Assignment is then a pure PROJECTION against centroid literals — the
    * corpus is never shuffled, never windowed, never joined; the only
    * exchange per iteration is the (cell, pos) partial-sum aggregation for
    * the centroid update, whose result (kCells × dim rows) collects back.
    * A cell that loses every member drops out (seeds are member vectors, so
    * each starts with its seed; the oracle replicates the same semantics). */
  /** Count of model-TRAINING runs (k-means seed+iterate, PQ codebook fits)
    * in this JVM — the observable behind the persisted-index contract:
    * a search served from a stored model must not bump it (AnnIndexSpec
    * pins zero training jobs on [[AnnIndex.searchIvf]]'s path). */
  val trainingRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  def kmeansModel(candidates: DataFrame, kCells: Int, iters: Int): Seq[(Long, Array[Double])] = {
    trainingRuns.incrementAndGet()
    val seeds = candidates
      .withColumn("hkey", md5(col("vec_id").cast("string")))
      .orderBy(col("hkey"), col("vec_id")) // TakeOrdered: distributed top-k
      .limit(kCells)
      .select(col("hkey"), col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid"))
      .collect()
    var model: Seq[(Long, Array[Double])] = seeds
      .sortBy(r => (r.getString(0), r.getLong(1)))
      .zipWithIndex
      .map { case (r, i) => i.toLong -> r.getSeq[Double](2).toArray }
      .toSeq
    (1 to iters).foreach { _ =>
      model = assignCells(candidates, model)
        .groupBy(col("cell"))
        .agg(call_function("vec_decimal_mean", col("embedding")).as("centroid"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1)
        .toSeq
    }
    model
  }

  /** Backward-compatible DataFrame view of the learned centroids. */
  def kmeansCentroids(candidates: DataFrame, kCells: Int, iters: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    kmeansModel(candidates, kCells, iters)
      .map { case (c, v) => (c, v.toSeq) }.toDF("cell", "centroid")
  }

  /** Per-cell cosine columns against centroid LITERALS — no join, no
    * shuffle; each row scores kCells native vec_cosine calls. */
  private def cellSims(vecCol: String, model: Seq[(Long, Array[Double])]): Seq[Column] =
    model.map { case (cell, c) =>
      call_function("vec_cosine", col(vecCol), typedLit(c.toSeq)).as(s"__c$cell")
    }

  /** Argmax over the literal cell similarities, ties to the smaller cell id
    * (CASE scans cells in id order and takes the first equal to the max —
    * exactly the (sim DESC, cell ASC) row_number ordering it replaces). */
  private def argmaxCell(model: Seq[(Long, Array[Double])]): Column = {
    val sims = model.map { case (cell, _) => col(s"__c$cell") }
    val m = greatest(sims: _*)
    model.map { case (cell, _) => (col(s"__c$cell") === m, lit(cell)) }
      .foldRight(lit(null).cast("long")) { case ((cond, v), acc) => when(cond, v).otherwise(acc) }
  }

  /** Nearest-centroid assignment: (vec_id, embedding, cell) as a pure
    * projection — zero shuffle of the corpus. */
  def assignCells(candidates: DataFrame, model: Seq[(Long, Array[Double])]): DataFrame =
    candidates
      .select(Seq(col("vec_id"), col("embedding")) ++ cellSims("embedding", model): _*)
      .select(col("vec_id"), col("embedding"), argmaxCell(model).as("cell"))

  /** IVF ANN with LEARNED centroids: deterministic k-means over the
    * candidates, final-centroid cell assignment, then route each query to
    * its top-`nprobe` cells (sorting the kCells literal similarities per
    * query — still no join) and search only those cells. */
  def ivfTopKLearned(queries: DataFrame, candidates: DataFrame, k: Int,
      kCells: Int = 4, iters: Int = 2, nprobe: Int = 2): DataFrame =
    ivfSearchWithModel(queries, candidates, k,
      kmeansModel(candidates, kCells, iters), nprobe)

  /** The SEARCH half of learned IVF against an ALREADY-TRAINED centroid
    * model — inline-trained by [[ivfTopKLearned]] or loaded from a
    * persisted index table by [[AnnIndex.searchIvf]]. Runs ZERO training
    * jobs: cell assignment and query routing are pure projections against
    * the centroid literals, so the only cluster work is the probe-cell
    * scan + two-phase top-k. */
  def ivfSearchWithModel(queries: DataFrame, candidates: DataFrame, k: Int,
      model: Seq[(Long, Array[Double])], nprobe: Int): DataFrame =
    ivfSearchWithCelled(queries, assignCells(candidates, model), k, model, nprobe)

  /** The query half of [[ivfSearchWithModel]] against an ALREADY-CELLED
    * corpus frame (`assignCells(candidates, model)`): a serving stream
    * computes and pins the cell assignment ONCE per model generation
    * instead of re-running it every micro-batch — the assignment is a
    * deterministic projection of (corpus, model), so serving from the
    * materialized frame is bit-identical to the fused chain (which
    * composes these two functions verbatim). */
  def ivfSearchWithCelled(queries: DataFrame, celled: DataFrame, k: Int,
      model: Seq[(Long, Array[Double])], nprobe: Int): DataFrame = {
    // top-nprobe cells per query: sort (-sim, cell) structs — sim DESC with
    // ties to the smaller cell id, as in the window form it replaces
    val picks = model.map { case (cell, _) =>
      struct((col(s"__c$cell") * -1).as("ns"), lit(cell).as("cell"))
    }
    val routed = queries
      .select(Seq(col("q_id"), col("q_vec")) ++ cellSims("q_vec", model): _*)
      .select(col("q_id"), col("q_vec"),
        explode(slice(array_sort(array(picks: _*)), 1, nprobe)).as("pick"))
      .select(col("q_id"), col("q_vec"), col("pick.cell").as("cell"))
    val scored = celled.join(broadcast(routed), "cell")
      .withColumn("cos_sim", cosine("q_vec", "embedding"))
    topKPerQuery(scored, k)
  }

  /** DuckDB rendering of the deterministic k-means + final cell assignment
    * (shared by the learned-IVF and SemDeDup oracles): seeds, `iters`
    * unrolled assign+update CTE pairs, and a `celled(vec_id, cv, cell)`
    * relation. Expects `c(vec_id, cv)` defined upstream. */
  def kmeansCelledSql(kCells: Int, iters: Int,
      trainRel: String = "c", assignRel: String = "c"): String = {
    def cos(a: String, b: String) = cosineSql(a, b)
    val seed = s"""
      seedpick AS (SELECT vec_id, cv, md5(vec_id::VARCHAR) AS hkey FROM $trainRel
                   ORDER BY hkey, vec_id LIMIT $kCells),
      cents0 AS (SELECT CAST(row_number() OVER (ORDER BY hkey, vec_id) - 1 AS BIGINT) AS cell,
                        list_transform(cv, x -> x::DOUBLE) AS centroid
                 FROM seedpick)"""
    val steps = (1 to iters).map { t =>
      val prev = s"cents${t - 1}"
      s"""
      asg$t AS (SELECT vec_id, cv, cell FROM (
                 SELECT c.vec_id, c.cv, p.cell,
                        row_number() OVER (PARTITION BY c.vec_id
                          ORDER BY ${cos("c.cv", "p.centroid")} DESC, p.cell) AS ar
                 FROM $trainRel AS c, $prev p) x WHERE ar = 1),
      ux$t AS (SELECT cell, cv, unnest(generate_series(1, len(cv))) AS pos FROM asg$t),
      ps$t AS (SELECT cell, pos, sum(cv[pos]::DOUBLE::DECIMAL(38,12)) AS sum_v, count(*) AS n
               FROM ux$t GROUP BY cell, pos),
      cents$t AS (SELECT cell, list(sum_v::DOUBLE / n ORDER BY pos) AS centroid
                  FROM ps$t GROUP BY cell)"""
    }.mkString(",")
    s"""$seed,$steps,
      celled AS (SELECT vec_id, cv, cell FROM (
                  SELECT c.vec_id, c.cv, p.cell,
                         row_number() OVER (PARTITION BY c.vec_id
                           ORDER BY ${cos("c.cv", "p.centroid")} DESC, p.cell) AS ar
                  FROM $assignRel AS c, cents$iters p) x WHERE ar = 1)"""
  }

  /** CTE chain of the learned-IVF search, ending at
    * `ranked(q_id, vec_id, rank, cos_sim)` — shared by the full oracle and
    * the recall evaluator. Expects `q(q_id, qv)` / `c(vec_id, cv)`. */
  def ivfRankedCtes(kCells: Int, iters: Int, nprobe: Int,
      trainRel: String = "c", assignRel: String = "c"): String = {
    def cos(a: String, b: String) = cosineSql(a, b)
    s"""${kmeansCelledSql(kCells, iters, trainRel, assignRel)},
      routed AS (SELECT q_id, qv, cell FROM (
                  SELECT q.q_id, q.qv, p.cell,
                         row_number() OVER (PARTITION BY q.q_id
                           ORDER BY ${cos("qv", "p.centroid")} DESC, p.cell) AS cr
                  FROM q, cents$iters p) x WHERE cr <= $nprobe),
      scored AS (SELECT r.q_id, m.vec_id, ${cos("r.qv", "m.cv")} AS cos_sim
                 FROM routed r JOIN celled m ON m.cell = r.cell),
      ranked AS (SELECT q_id, vec_id,
                        CAST(row_number() OVER (PARTITION BY q_id
                          ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank, cos_sim
                 FROM scored)"""
  }

  /** DuckDB rendering of the full learned-IVF chain (oracle side): the
    * k-means iterations unroll into one assign+update CTE pair each.
    * Expects relations `q(q_id, qv)` and `c(vec_id, cv)` defined upstream. */
  def ivfLearnedSql(k: Int, kCells: Int = 4, iters: Int = 2,
      nprobe: Int = 2): String =
    s"""${ivfRankedCtes(kCells, iters, nprobe)}
      SELECT q_id, vec_id, rank, cos_sim FROM ranked WHERE rank <= $k"""

  /** RECALL@K EVALUATION — the measurement every ANN deployment owes its
    * users: per query, the fraction of the EXACT cosine top-k that the
    * learned-IVF search (kCells cells, nprobe probes) recovered. Both
    * sides are the deterministic operators above, so recall itself is
    * deterministic and replays in SQL — quality measured under the same
    * hash gate as the operators it measures. */
  def recallAtK(queries: DataFrame, candidates: DataFrame, k: Int,
      kCells: Int = 4, iters: Int = 2, nprobe: Int = 2): DataFrame =
    recallVsExact(queries, candidates, k,
      ivfTopKLearned(queries, candidates, k, kCells, iters, nprobe))

  /** RECALL@K of the TWO-STAGE rerank searches ([[pqRerankTopK]] /
    * [[sqRerankTopK]]) against the exact cosine top-k — proving what the
    * kCand lever buys at every rung, under the same hash gate as the
    * searches themselves. */
  def rerankRecallAtK(queries: DataFrame, candidates: DataFrame, k: Int,
      kCand: Int, stage: String, dPrefix: Int = 16): DataFrame = {
    val approx = stage match {
      case "pq" => pqRerankTopK(queries, candidates, k, kCand)
      case "sq" => sqRerankTopK(queries, candidates, k, kCand)
      case "mrl" => mrlRerankTopK(queries, candidates, k, dPrefix, kCand)
      case other => throw new IllegalArgumentException(
        s"rerankRecallAtK stage `$other` (pq|sq|mrl)")
    }
    recallVsExact(queries, candidates, k, approx)
  }

  private def recallVsExact(queries: DataFrame, candidates: DataFrame,
      k: Int, approx: DataFrame): DataFrame = {
    val exact = bruteForceTopK(queries, candidates, k)
      .select(col("q_id"), col("vec_id"))
    val hits = approx
      .select(col("q_id"), col("vec_id")).withColumn("__hit", lit(1))
    exact.join(hits, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(col("__hit")).as("n_hits"),
        (count(col("__hit")).cast("double") / lit(k)).as("recall_at_k"))
  }

  /** Shared oracle tail: recall of `rr`'s top-k (any ranked CTE with
    * (q_id, vec_id, rank)) against the exact cosine top-k. Expects
    * `q(q_id, qv)` / `c(vec_id, cv)` upstream. */
  def recallTailSql(k: Int): String = s""",
      approx AS (SELECT q_id, vec_id FROM rr WHERE rank <= $k),
      ex_scored AS (SELECT q_id, vec_id, ${cosineSql("qv", "cv")} AS cos_sim FROM q, c),
      ex_ranked AS (SELECT q_id, vec_id,
                           row_number() OVER (PARTITION BY q_id
                             ORDER BY cos_sim DESC, vec_id) AS r
                    FROM ex_scored),
      exact AS (SELECT q_id, vec_id FROM ex_ranked WHERE r <= $k)
      SELECT e.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             CAST(count(a.vec_id) AS DOUBLE) / $k AS recall_at_k
      FROM exact e LEFT JOIN approx a
        ON a.q_id = e.q_id AND a.vec_id = e.vec_id
      GROUP BY e.q_id"""

  /** DuckDB rendering of recallAtK. Expects `q(q_id, qv)` / `c(vec_id, cv)`. */
  def recallAtKSql(k: Int, kCells: Int = 4, iters: Int = 2,
      nprobe: Int = 2): String =
    s"""${ivfRankedCtes(kCells, iters, nprobe)},
      approx AS (SELECT q_id, vec_id FROM ranked WHERE rank <= $k),
      ex_scored AS (SELECT q_id, vec_id, ${cosineSql("qv", "cv")} AS cos_sim FROM q, c),
      ex_ranked AS (SELECT q_id, vec_id,
                           row_number() OVER (PARTITION BY q_id
                             ORDER BY cos_sim DESC, vec_id) AS r
                    FROM ex_scored),
      exact AS (SELECT q_id, vec_id FROM ex_ranked WHERE r <= $k)
      SELECT e.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             CAST(count(a.vec_id) AS DOUBLE) / $k AS recall_at_k
      FROM exact e LEFT JOIN approx a
        ON a.q_id = e.q_id AND a.vec_id = e.vec_id
      GROUP BY e.q_id"""

  // ------------------------------------------------------------ SemDeDup

  /** SEMANTIC DEDUPLICATION (the SemDeDup recipe, arXiv:2303.09540,
    * deterministic rendering): k-means clusters bound the candidate set —
    * pairwise cosine runs ONLY within a cluster, never corpus-wide — and a
    * row is a semantic duplicate iff some LOWER-ID row in its cluster sits
    * at cosine ≥ `threshold` (id-anchored keeper, not the paper's
    * centroid-proximity keeper, so the decision is order-independent and
    * replays exactly in SQL).
    *
    * Scale shape: the model is kCells bounded driver literals (same as the
    * learned IVF); assignment is a pure projection; the only shuffle is the
    * self-join keyed by cell. At 100 TB, kCells grows with the corpus
    * (cells stay ~constant-sized), so per-cell pair work stays bounded —
    * the same lever the paper uses to keep dedup O(n·c) instead of O(n²).
    * Output: (vec_id, cell, is_semantic_dup) for every input row. */
  def semDedup(emb: DataFrame, threshold: Double, kCells: Int = 4,
      iters: Int = 2): DataFrame = {
    val model = kmeansModel(emb.select(col("vec_id"), col("embedding")), kCells, iters)
    val celled = assignCells(emb, model).select(col("vec_id"), col("embedding"), col("cell"))
    val dupIds = celled.as("a")
      .join(celled.as("b"),
        col("a.cell") === col("b.cell") && col("b.vec_id") < col("a.vec_id"))
      .filter(call_function("vec_cosine", col("a.embedding"), col("b.embedding"))
        >= lit(threshold))
      .select(col("a.vec_id").as("vec_id")).distinct()
    celled
      .join(dupIds.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("__dup"), lit(false)).as("is_semantic_dup"))
  }

  /** DuckDB rendering of the SemDeDup chain (oracle side). Expects
    * `c(vec_id, cv)` defined upstream. */
  def semDedupSql(threshold: Double, kCells: Int = 4, iters: Int = 2): String =
    s"""${kmeansCelledSql(kCells, iters)},
      dup AS (SELECT DISTINCT a.vec_id
              FROM celled a JOIN celled b
                ON b.cell = a.cell AND b.vec_id < a.vec_id
              WHERE ${cosineSql("a.cv", "b.cv")} >= $threshold)
      SELECT c2.vec_id, c2.cell, (d.vec_id IS NOT NULL) AS is_semantic_dup
      FROM celled c2 LEFT JOIN dup d ON d.vec_id = c2.vec_id"""

  /** CLUSTER-BALANCED SAMPLING — the diversity-selection shape (DiverseSelect
    * / prototype-balanced curation): assign every vector to its learned
    * k-means cell, then keep at most `capPerCell` rows per cell under a
    * deterministic md5 pick order, so over-represented regions of embedding
    * space are capped instead of dominating the sample (the failure mode of
    * uniform sampling over a skewed corpus).
    *
    * Scale shape: the model is kCells driver literals, assignment a pure
    * projection (zero shuffle — the IVF lever); the per-cell top-cap is ONE
    * shuffle keyed by cell. At 100 TB kCells grows with the corpus (sample
    * budget / cap), so cell partitions stay bounded — the window never sees
    * a giant group. Output: (vec_id, cell, cell_rank), cell_rank ≤ cap. */
  def clusterBalancedSample(emb: DataFrame, capPerCell: Int,
      kCells: Int = 4, iters: Int = 2): DataFrame = {
    val model = kmeansModel(emb.select(col("vec_id"), col("embedding")), kCells, iters)
    val pick = md5(concat(col("cell").cast("string"), lit(":"),
      col("vec_id").cast("string")))
    assignCells(emb, model)
      .select(col("vec_id"), col("cell"), pick.as("__pick"))
      .withColumn("cell_rank", row_number()
        .over(Window.partitionBy(col("cell")).orderBy(col("__pick"), col("vec_id")))
        .cast("long"))
      .filter(col("cell_rank") <= capPerCell)
      .select(col("vec_id"), col("cell"), col("cell_rank"))
  }

  /** DuckDB rendering of the balanced sample (oracle side). Expects
    * `c(vec_id, cv)` defined upstream. */
  def clusterBalancedSampleSql(capPerCell: Int, kCells: Int = 4,
      iters: Int = 2): String =
    s"""${kmeansCelledSql(kCells, iters)},
      r AS (SELECT vec_id, cell,
                   CAST(row_number() OVER (PARTITION BY cell
                     ORDER BY md5(cell::VARCHAR || ':' || vec_id::VARCHAR), vec_id)
                     AS BIGINT) AS cell_rank
            FROM celled)
      SELECT vec_id, cell, cell_rank FROM r WHERE cell_rank <= $capPerCell"""

  // ------------------------------------------------------------------ PQ

  /** Squared L2 distance as three sequential-fold dots with fixed
    * association ((a·a − 2·a·b) + b·b) — replays bit-identically in SQL. */
  private def l2sqCols(a: Column, b: Column): Column =
    call_function("vec_dot", a, a) - lit(2.0) * call_function("vec_dot", a, b) +
      call_function("vec_dot", b, b)

  private def subCol(vecCol: String, s: Int, subDim: Int): Column =
    expr(s"slice($vecCol, ${s * subDim + 1}, $subDim)")

  private def pqDistCols(sv: Column, cb: Seq[(Long, Array[Double])]): Seq[Column] =
    cb.map { case (code, c) => l2sqCols(sv, typedLit(c.toSeq)).as(s"__d$code") }

  /** Argmin over the literal code distances, ties to the smaller code id
    * (first-equal CASE scan in code order ≡ (dist ASC, code) row_number). */
  private def pqArgmin(cb: Seq[(Long, Array[Double])]): Column = {
    val dists = cb.map { case (code, _) => col(s"__d$code") }
    val mn = least(dists: _*)
    cb.map { case (code, _) => (col(s"__d$code") === mn, lit(code)) }
      .foldRight(lit(null).cast("long")) { case ((cond, v), acc) =>
        when(cond, v).otherwise(acc)
      }
  }

  /** PRODUCT-QUANTIZATION codebooks — the ANN memory lever at 100 TB: an
    * n-dim float vector (4n bytes) compresses to m one-byte codes, so a
    * trillion-vector candidate set rides RAM and shuffle at 4n/m×
    * compression and query scoring touches a k×m literal table instead of
    * the vectors. Deterministic end to end, same contract as kmeansModel:
    * md5-ordered seed vectors (shared across subspaces), L2-argmin
    * assignment with ties to the smaller code, exact decimal-mean updates
    * (a code that loses every member drops out) — training, encoding and
    * ADC search all replay in DuckDB (s07's oracle), so the hash gate
    * checks the QUANTIZER, not just shapes. Training is m×iters bounded
    * aggregations over subvector projections of the corpus (k×subDim
    * doubles return to the driver each) — the vectors themselves never
    * shuffle — and the m INDEPENDENT subspace loops run CONCURRENTLY
    * (driver-thread job submission), so wall-clock is one subspace's
    * iters, not m× the per-job fixed cost the r7 sequential loop paid.
    * (The alternative single-job fusion — explode each row to its m
    * (subspace, code, subvector) assignments — measured 3× SLOWER here:
    * it pushes m× subvector rows through one wide shuffle, while the
    * per-subspace plans shuffle only k×subDim partials.) Each subspace's
    * plan is byte-identical to the sequential version, so the codebooks
    * and every downstream hash are unchanged. */
  def pqModel(candidates: DataFrame, m: Int, kCodes: Int, iters: Int,
      dim: Int): Seq[Seq[(Long, Array[Double])]] = {
    trainingRuns.incrementAndGet()
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val seeds = candidates
      .withColumn("hkey", md5(col("vec_id").cast("string")))
      .orderBy(col("hkey"), col("vec_id")) // TakeOrdered: distributed top-k
      .limit(kCodes)
      .select(col("hkey"), col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect()
      .sortBy(r => (r.getString(0), r.getLong(1)))
      .map(_.getSeq[Double](2).toArray)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val trained = (0 until m).map { s =>
      Future {
        var cb: Seq[(Long, Array[Double])] = seeds.zipWithIndex
          .map { case (v, i) => i.toLong -> v.slice(s * subDim, s * subDim + subDim) }
          .toSeq
        val sub = candidates.select(subCol("embedding", s, subDim).as("sv"))
        (1 to iters).foreach { _ =>
          // centroids quantize to FLOAT32 after each mean — the standard PQ
          // codebook storage — which also pins the cross-engine replay:
          // double→decimal conversion in the exact mean can differ between
          // engines by ~1e-12 per addend (shortest-string vs binary-multiply
          // rounding), and at large member counts that 1-ulp drift flips
          // iteration-2 assignments; float rounding absorbs it in both.
          cb = sub
            .select(col("sv") +: pqDistCols(col("sv"), cb): _*)
            .select(col("sv"), pqArgmin(cb).as("code"))
            .groupBy(col("code"))
            .agg(call_function("vec_decimal_mean", col("sv")).as("centroid"))
            .collect()
            .map(r => r.getLong(0) ->
              r.getSeq[Double](1).toArray.map(v => v.toFloat.toDouble))
            .sortBy(_._1).toSeq
        }
        cb
      }
    }
    trained.map(Await.result(_, Duration.Inf))
  }

  /** Encode the corpus: (vec_id, code_0..code_{m-1}) as a pure projection —
    * zero shuffle; this m-byte row IS what an index at 100 TB stores.
    *
    * Plan shape (r16): ONE flat distance projection for all m subspaces
    * followed by one argmin projection — the r15 form chained m
    * select/withColumn/drop steps, each re-projecting every accumulated
    * column, so the analyzer walked O(m²·k) nodes per query and the
    * serve-path queries were driver-bound (x32 measured 2.8 s of planning
    * gaps against 0.9 s of actual jobs). Arithmetic is IDENTICAL: the same
    * l2sqCols expression per (subspace, code), materialized once (multi-
    * reference aliases block CollapseProject, so codegen evaluates each
    * distance a single time), and the same first-equal scan in code order
    * for the argmin (ties to the smaller code). */
  def pqEncode(candidates: DataFrame, model: Seq[Seq[(Long, Array[Double])]],
      dim: Int): DataFrame = {
    val subDim = dim / model.length
    // hoist each subspace's slice and self-dot into their own projection
    // steps (multi-referenced non-cheap aliases block CollapseProject, so
    // each evaluates ONCE): the k distances per subspace then reference
    // the materialized columns instead of re-slicing and re-self-dotting
    // per code — identical vec_dot calls on identical inputs, identical
    // doubles, ~3× fewer analyzed/optimized nodes per AQE round
    val step0a = candidates.select(col("vec_id") +:
      model.indices.map(s => subCol("embedding", s, subDim).as(s"__sv$s")): _*)
    val step0b = step0a.select(col("vec_id") +:
      (model.indices.map(s => col(s"__sv$s")) ++
        model.indices.map(s => call_function("vec_dot",
          col(s"__sv$s"), col(s"__sv$s")).as(s"__xx$s"))): _*)
    val distCols = model.zipWithIndex.flatMap { case (cb, s) =>
      cb.map { case (code, c) =>
        (col(s"__xx$s") -
          lit(2.0) * call_function("vec_dot", col(s"__sv$s"), typedLit(c.toSeq)) +
          call_function("vec_dot", typedLit(c.toSeq), typedLit(c.toSeq)))
          .as(s"__d${s}_$code") }
    }
    val step1 = step0b.select(col("vec_id") +: distCols: _*)
    val codeCols = model.zipWithIndex.map { case (cb, s) =>
      val dists = cb.map { case (code, _) => col(s"__d${s}_$code") }
      val mn = least(dists: _*)
      cb.map { case (code, _) => (col(s"__d${s}_$code") === mn, lit(code)) }
        .foldRight(lit(null).cast("long")) { case ((cond, v), acc) =>
          when(cond, v).otherwise(acc)
        }.as(s"code_$s")
    }
    step1.select(col("vec_id") +: codeCols: _*)
  }

  /** PQ ANN search via asymmetric distance computation: each (query,
    * candidate) pair costs a CASE lookup per subspace against the literal
    * codebook — the candidate's floats are never touched after encoding.
    * Output ranks ascend by approximate squared-L2 distance, ties to the
    * smaller vec_id; the two-phase top-k keeps the straggler-free shape. */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      m: Int = 8, kCodes: Int = 8, iters: Int = 2): DataFrame = {
    val dim = candidates.select(size(col("embedding"))).head().getInt(0)
    pqSearchWithModel(queries, candidates, k,
      pqModel(candidates, m, kCodes, iters, dim), dim)
  }

  /** The SEARCH half of PQ-ADC against ALREADY-TRAINED codebooks —
    * inline-trained by [[pqTopK]] or loaded from a persisted index table
    * by [[AnnIndex.searchPq]]. Zero training jobs: encoding and the ADC
    * lookup are projections against the codebook literals. */
  def pqSearchWithModel(queries: DataFrame, candidates: DataFrame, k: Int,
      model: Seq[Seq[(Long, Array[Double])]], dim: Int): DataFrame =
    pqSearchWithCodes(queries, pqEncode(candidates, model, dim), k, model, dim)

  /** The query half of [[pqSearchWithModel]] against an ALREADY-ENCODED
    * corpus frame (`pqEncode(candidates, model, dim)`): a serving stream
    * computes and pins the code table ONCE per codebook generation
    * instead of re-encoding the corpus (and re-planning the k×m distance
    * projection) every micro-batch — encoding is a deterministic
    * projection of (corpus, model), so serving from the materialized
    * frame is bit-identical to the fused chain (which composes these two
    * functions verbatim). */
  def pqSearchWithCodes(queries: DataFrame, coded: DataFrame, k: Int,
      model: Seq[Seq[(Long, Array[Double])]], dim: Int): DataFrame = {
    val m = model.length
    require(m >= 1 && dim % m == 0,
      s"pqSearchWithModel: dim=$dim must divide evenly into the model's " +
        s"$m subspaces (same contract as pqModel) — a mismatched persisted " +
        "index would silently mis-slice subvectors")
    val subDim = dim / m
    // query-side slices + self-dots hoisted into the (tiny, broadcast)
    // query frame — the ADC's 8 whens per subspace then reference two
    // materialized columns instead of re-slicing q_vec and re-self-
    // dotting per code (identical calls, identical doubles)
    val queriesP = queries.select(queries.columns.map(col).toSeq ++
      (0 until m).map(s => subCol("q_vec", s, subDim).as(s"__qsv$s")): _*)
      .select(queries.columns.map(col).toSeq ++
        (0 until m).map(s => col(s"__qsv$s")) ++
        (0 until m).map(s => call_function("vec_dot",
          col(s"__qsv$s"), col(s"__qsv$s")).as(s"__qxx$s")): _*)
    val adc = (0 until m).map { s =>
      model(s).foldRight(lit(null).cast("double")) { case ((code, c), acc) =>
        when(col(s"code_$s") === code,
          col(s"__qxx$s") -
            lit(2.0) * call_function("vec_dot", col(s"__qsv$s"), typedLit(c.toSeq)) +
            call_function("vec_dot", typedLit(c.toSeq), typedLit(c.toSeq)))
          .otherwise(acc)
      }
    }.reduceLeft(_ + _)
    val scored = coded.crossJoin(broadcast(queriesP)).withColumn("adc_dist", adc)
    val local = Window.partitionBy(col("q_id"), col("__part"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
    val pruned = scored.withColumn("__part", spark_partition_id())
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist").asc, col("vec_id"))
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("adc_dist"))
  }

  /** DuckDB rendering of the full PQ chain (oracle side): per-subspace
    * k-means unrolls like ivfLearnedSql, encoding joins the final
    * codebooks, and the ADC sum folds in subspace order (list_reduce over
    * `list(d ORDER BY s)` ≡ the engine's left-assoc Σ). Expects relations
    * `q(q_id, qv)` and `c(vec_id, cv)` defined upstream. */
  def pqSql(k: Int, m: Int = 8, kCodes: Int = 8, iters: Int = 2,
      dim: Int = 64): String =
    s"""${pqCtes(m, kCodes, iters, dim)}
      SELECT q_id, vec_id, rank, adc_dist FROM ranked WHERE rank <= $k"""

  /** The PQ chain through the `ranked` CTE (train + encode + ADC + rank),
    * for callers that extend it (the rerank oracle). */
  def pqCtes(m: Int = 8, kCodes: Int = 8, iters: Int = 2,
      dim: Int = 64): String = {
    val subDim = dim / m
    def d(x: String, y: String) =
      s"list_reduce(list_transform(generate_series(1, len($x)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE), (acc, v) -> acc + v)"
    def l2(x: String, y: String) = s"(${d(x, x)} - 2 * ${d(x, y)} + ${d(y, y)})"
    def slice(rel: String, s: String) = s"$rel[($s * $subDim + 1):(($s + 1) * $subDim)]"
    val seed = s"""
      seedpick AS (SELECT vec_id, cv, md5(vec_id::VARCHAR) AS hkey FROM c
                   ORDER BY hkey, vec_id LIMIT $kCodes),
      seeds AS (SELECT CAST(row_number() OVER (ORDER BY hkey, vec_id) - 1 AS BIGINT) AS code,
                       list_transform(cv, x -> x::DOUBLE) AS v
                FROM seedpick)"""
    val perSub = (0 until m).map { s =>
      val lo = s * subDim
      val sub = s"""
      sub_$s AS (SELECT vec_id, ${slice("cv", s.toString)} AS sv FROM c),
      cb_${s}_0 AS (SELECT code, v[${lo + 1}:${lo + subDim}] AS centroid FROM seeds)"""
      val steps = (1 to iters).map { t =>
        val prev = s"cb_${s}_${t - 1}"
        s"""
      asg_${s}_$t AS (SELECT sv, code FROM (
                 SELECT b.sv, p.code,
                        row_number() OVER (PARTITION BY b.vec_id
                          ORDER BY ${l2("b.sv", "p.centroid")} ASC, p.code) AS ar
                 FROM sub_$s b, $prev p) x WHERE ar = 1),
      ux_${s}_$t AS (SELECT code, sv, unnest(generate_series(1, len(sv))) AS pos FROM asg_${s}_$t),
      ps_${s}_$t AS (SELECT code, pos, sum(sv[pos]::DOUBLE::DECIMAL(38,12)) AS sum_v, count(*) AS n
               FROM ux_${s}_$t GROUP BY code, pos),
      cb_${s}_$t AS (SELECT code,
                       list((sum_v::DOUBLE / n)::FLOAT::DOUBLE ORDER BY pos) AS centroid
                  FROM ps_${s}_$t GROUP BY code)"""
      }.mkString(",")
      val enc = s"""
      codes_$s AS (SELECT vec_id, CAST($s AS BIGINT) AS s, code FROM (
                 SELECT b.vec_id, p.code,
                        row_number() OVER (PARTITION BY b.vec_id
                          ORDER BY ${l2("b.sv", "p.centroid")} ASC, p.code) AS ar
                 FROM sub_$s b, cb_${s}_$iters p) x WHERE ar = 1)"""
      s"$sub,$steps,$enc"
    }.mkString(",")
    val cents = (0 until m)
      .map(s => s"SELECT CAST($s AS BIGINT) AS s, code, centroid FROM cb_${s}_$iters")
      .mkString(" UNION ALL ")
    val codes = (0 until m).map(s => s"SELECT * FROM codes_$s").mkString(" UNION ALL ")
    s"""$seed,$perSub,
      cents AS ($cents),
      codes AS ($codes),
      dists AS (SELECT q.q_id, kd.vec_id, kd.s,
                       ${l2(slice("q.qv", "kd.s"), "ct.centroid")} AS dd
                FROM q, codes kd JOIN cents ct ON ct.s = kd.s AND ct.code = kd.code),
      adc AS (SELECT q_id, vec_id,
                     list_reduce(list(dd ORDER BY s), (acc, v) -> acc + v) AS adc_dist
              FROM dists GROUP BY q_id, vec_id),
      ranked AS (SELECT q_id, vec_id,
                        CAST(row_number() OVER (PARTITION BY q_id
                          ORDER BY adc_dist ASC, vec_id) AS BIGINT) AS rank, adc_dist
                 FROM adc)"""
  }

  /** TWO-STAGE ANN — the production retrieval shape: the PQ/ADC coarse
    * stage surfaces `kCand` candidates per query from compressed codes
    * (recall, cheap), then an EXACT cosine rerank over only those
    * candidates picks the final top-k (precision, paid on ≪ n rows). The
    * rerank join touches kCand × queries rows — the whole point: full
    * vectors are read for a bounded candidate set, never the corpus. */
  def pqRerankTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      kCand: Int = 30, m: Int = 8, kCodes: Int = 8, iters: Int = 2): DataFrame = {
    val dim = candidates.select(size(col("embedding"))).head().getInt(0)
    pqRerankWithModel(queries, candidates, k, kCand,
      pqModel(candidates, m, kCodes, iters, dim), dim)
  }

  /** [[pqRerankTopK]] served from ALREADY-LOADED codebooks (the persisted-
    * index path — zero training jobs): PQ/ADC coarse stage to `kCand`
    * candidates, exact cosine rerank to `k`. Because [[pqModel]] training
    * is deterministic, serving from persisted codebooks is bit-identical
    * to the inline-trained chain — the same contract that lets s10's
    * oracle also gate the streaming PQ serving (x32). */
  def pqRerankWithModel(queries: DataFrame, candidates: DataFrame, k: Int,
      kCand: Int, model: Seq[Seq[(Long, Array[Double])]], dim: Int): DataFrame =
    pqRerankWithCodes(queries, pqEncode(candidates, model, dim), candidates,
      k, kCand, model, dim)

  /** [[pqRerankWithModel]] served from an ALREADY-ENCODED corpus frame —
    * the PQ/ADC coarse stage reads the materialized codes ([[pqEncode]]
    * output, computed once per codebook generation by a serving stream)
    * and only the exact-cosine rerank touches full vectors. Bit-identical
    * to the fused chain (which composes this function with pqEncode). */
  def pqRerankWithCodes(queries: DataFrame, coded: DataFrame,
      candidates: DataFrame, k: Int, kCand: Int,
      model: Seq[Seq[(Long, Array[Double])]], dim: Int): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    val cand = pqSearchWithCodes(queries, coded, kCand, model, dim)
      .select(col("q_id"), col("vec_id"))
    val rer = cand
      .join(candidates.select(col("vec_id"), col("embedding").as("__cv")), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cos_sim", cosine("q_vec", "__cv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    rer.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
  }

  /** CTE chain of [[pqRerankTopK]]'s oracle up to the reranked `rr`
    * relation — shared by the search oracle and the recall oracle. */
  def pqRerankCtes(kCand: Int = 30, m: Int = 8, kCodes: Int = 8,
      iters: Int = 2, dim: Int = 64): String =
    s"""${pqCtes(m, kCodes, iters, dim)},
      cand AS (SELECT q_id, vec_id FROM ranked WHERE rank <= $kCand),
      rer AS (SELECT ca.q_id, ca.vec_id,
                     ${cosineSql("qq.qv", "cc.cv")} AS cos_sim
              FROM cand ca JOIN q qq ON ca.q_id = qq.q_id
                           JOIN c cc ON ca.vec_id = cc.vec_id),
      rr AS (SELECT q_id, vec_id,
                    CAST(row_number() OVER (PARTITION BY q_id
                      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank, cos_sim
             FROM rer)"""

  /** Oracle for [[pqRerankTopK]]: expects `q(q_id, qv)` / `c(vec_id, cv)`
    * upstream, replays the PQ chain then the exact-cosine rerank. */
  def pqRerankSql(k: Int, kCand: Int = 30, m: Int = 8, kCodes: Int = 8,
      iters: Int = 2, dim: Int = 64): String =
    s"""${pqRerankCtes(kCand, m, kCodes, iters, dim)}
      SELECT q_id, vec_id, rank, cos_sim FROM rr WHERE rank <= $k"""

  /** TWO-STAGE ANN via int8 SCALAR QUANTIZATION — the SQ8 production
    * retrieval shape, the compressed-domain sibling of [[pqRerankTopK]]:
    * corpus vectors carry only their symmetric max-abs int8 codes
    * ([[quantizeInt8]]'s scheme, 4× smaller), and the COARSE score is
    * `cosine(query, codes)` — the per-vector scale CANCELS out of cosine,
    * so the coarse pass needs no dequantization at all. Two-phase
    * local-then-global top-kCand per query (never one task per query),
    * then an exact-cosine rerank reads full vectors for ONLY the
    * candidate set. Quantization, coarse ranking, and rerank all replay
    * in SQL ([[sqRerankSql]]). */
  /** Counts corpus ENCODE passes (the SQ quantization projection) — the
    * [[trainingRuns]] sibling for the code-table lifecycle: a search
    * served from a persisted code table ([[graft.operators.AnnIndex]]
    * kind='sq') must never re-encode the corpus, and AnnIndexSpec pins it
    * through this counter. */
  val encodeRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Encode the corpus as symmetric max-abs int8 codes, carried as FLOATs
    * (|code| ≤ 127 is float-exact, and vec_cosine's float-array/double-
    * arith contract then matches the oracle fold). One projection — no
    * shuffle, no driver state; this is the pass a persisted code table
    * exists to amortize. Output: (vec_id, __qcf). */
  def sqEncode(candidates: DataFrame): DataFrame = {
    encodeRuns.incrementAndGet()
    val scale = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    candidates.select(col("vec_id"), col("embedding"))
      .withColumn("__scale", scale)
      .withColumn("__qcf", when(col("__scale") > 0,
          transform(col("embedding"),
            x => round(x.cast("double") * 127 / col("__scale")).cast("float")))
        .otherwise(transform(col("embedding"), _ => lit(0.0f))))
      .select(col("vec_id"), col("__qcf"))
  }

  def sqRerankTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      kCand: Int = 30): DataFrame =
    sqRerankWithCodes(queries, sqEncode(candidates), candidates, k, kCand)

  /** The SQ chain SERVED from an existing code table (vec_id, __qcf) —
    * what [[graft.operators.AnnIndex.searchSq]] calls with the persisted
    * codes: coarse scale-free cosine over the codes, two-phase candidate
    * pruning, exact rerank reading full vectors for only the candidates.
    * Identical arithmetic to [[sqRerankTopK]] by construction (the
    * quantizer is deterministic), so the s11 oracle replays both. */
  def sqRerankWithCodes(queries: DataFrame, codes: DataFrame,
      candidates: DataFrame, k: Int, kCand: Int = 30): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    val scored = codes.crossJoin(broadcast(queries))
      .withColumn("coarse_sim", cosine("q_vec", "__qcf"))
    val local = Window.partitionBy(col("q_id"), col("__part"))
      .orderBy(col("coarse_sim").desc, col("vec_id"))
    val pruned = scored.withColumn("__part", spark_partition_id())
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= kCand)
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("coarse_sim").desc, col("vec_id"))
    val cand = pruned.withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= kCand).select(col("q_id"), col("vec_id"))
    val rer = cand
      .join(candidates.select(col("vec_id"), col("embedding").as("__cv")), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cos_sim", cosine("q_vec", "__cv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    rer.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
  }

  /** CTE chain of [[sqRerankTopK]]'s oracle up to the reranked `rr`
    * relation — shared by the search oracle and the recall oracle. */
  def sqRerankCtes(kCand: Int = 30): String =
    s"""sq AS (SELECT vec_id, cv,
               list_max(list_transform(cv, x -> abs(x::DOUBLE))) AS scale FROM c),
      codes AS (SELECT vec_id,
               CASE WHEN scale > 0 THEN
                 list_transform(cv, x -> CAST(round(x::DOUBLE * 127 / scale) AS FLOAT))
               ELSE list_transform(cv, x -> CAST(0 AS FLOAT)) END AS qcf
             FROM sq),
      coarse AS (SELECT q.q_id, codes.vec_id,
                        ${cosineSql("q.qv", "codes.qcf")} AS coarse_sim
                 FROM codes, q),
      cr AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY coarse_sim DESC, vec_id) AS crank
             FROM coarse),
      cand AS (SELECT q_id, vec_id FROM cr WHERE crank <= $kCand),
      rer AS (SELECT ca.q_id, ca.vec_id,
                     ${cosineSql("qq.qv", "cc.cv")} AS cos_sim
              FROM cand ca JOIN q qq ON ca.q_id = qq.q_id
                           JOIN c cc ON ca.vec_id = cc.vec_id),
      rr AS (SELECT q_id, vec_id,
                    CAST(row_number() OVER (PARTITION BY q_id
                      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank, cos_sim
             FROM rer)"""

  /** Oracle for [[sqRerankTopK]]: expects `q(q_id, qv)` / `c(vec_id, cv)`
    * upstream; replays the quantizer, the scale-free coarse cosine over
    * the codes, and the exact rerank. */
  def sqRerankSql(k: Int, kCand: Int = 30): String =
    s"""${sqRerankCtes(kCand)}
      SELECT q_id, vec_id, rank, cos_sim FROM rr WHERE rank <= $k"""

  /** MATRYOSHKA (MRL) PREFIX-DIMENSION two-stage retrieval — the rerank
    * shape for models trained with matryoshka representation learning
    * (arXiv:2205.13147), where the first d dims of an embedding are
    * themselves a usable lower-dim embedding: the COARSE pass scores
    * cosine over only `slice(vec, 1, dPrefix)` — a dim/dPrefix bandwidth
    * and FLOP cut with no codebook or quantizer to maintain — then an
    * exact full-dim cosine reranks ONLY the top-kCand candidates.
    * Same two-phase local-then-global candidate pruning as the PQ/SQ
    * siblings (never one task per query), and the whole chain (prefix
    * slice, coarse ranking, rerank) replays in SQL ([[mrlRerankSql]]). */
  def mrlRerankTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      dPrefix: Int, kCand: Int = 30): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    require(dPrefix >= 1, s"dPrefix must be >= 1, got $dPrefix")
    val pref = candidates.select(col("vec_id"),
      expr(s"slice(embedding, 1, $dPrefix)").as("__pv"))
    val qp = queries.select(col("q_id"), col("q_vec"),
      expr(s"slice(q_vec, 1, $dPrefix)").as("__qp"))
    val scored = pref.crossJoin(broadcast(qp))
      .withColumn("coarse_sim", cosine("__qp", "__pv"))
    val local = Window.partitionBy(col("q_id"), col("__part"))
      .orderBy(col("coarse_sim").desc, col("vec_id"))
    val pruned = scored.withColumn("__part", spark_partition_id())
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= kCand)
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("coarse_sim").desc, col("vec_id"))
    val cand = pruned.withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= kCand).select(col("q_id"), col("vec_id"))
    val rer = cand
      .join(candidates.select(col("vec_id"), col("embedding").as("__cv")), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cos_sim", cosine("q_vec", "__cv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    rer.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
  }

  /** CTE chain of [[mrlRerankTopK]]'s oracle up to the reranked `rr`
    * relation — shared by the search oracle and the recall oracle. */
  def mrlRerankCtes(dPrefix: Int, kCand: Int = 30): String =
    s"""pc AS (SELECT vec_id, cv, cv[1:$dPrefix] AS pv FROM c),
      qpf AS (SELECT q_id, qv, qv[1:$dPrefix] AS qp FROM q),
      coarse AS (SELECT qpf.q_id, pc.vec_id,
                        ${cosineSql("qpf.qp", "pc.pv")} AS coarse_sim
                 FROM pc, qpf),
      cr AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY coarse_sim DESC, vec_id) AS crank
             FROM coarse),
      cand AS (SELECT q_id, vec_id FROM cr WHERE crank <= $kCand),
      rer AS (SELECT ca.q_id, ca.vec_id,
                     ${cosineSql("qq.qv", "cc.cv")} AS cos_sim
              FROM cand ca JOIN q qq ON ca.q_id = qq.q_id
                           JOIN c cc ON ca.vec_id = cc.vec_id),
      rr AS (SELECT q_id, vec_id,
                    CAST(row_number() OVER (PARTITION BY q_id
                      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank, cos_sim
             FROM rer)"""

  /** Oracle for [[mrlRerankTopK]]: expects `q(q_id, qv)` / `c(vec_id, cv)`
    * upstream; replays the prefix slice, coarse cosine, and exact rerank. */
  def mrlRerankSql(k: Int, dPrefix: Int, kCand: Int = 30): String =
    s"""${mrlRerankCtes(dPrefix, kCand)}
      SELECT q_id, vec_id, rank, cos_sim FROM rr WHERE rank <= $k"""

  /** Per-vector int8 scalar quantization — the storage/bandwidth lever an
    * embedding store pulls first at 100 TB (4 B→1 B per dimension before
    * any indexing). Symmetric max-abs scheme: scale = max |x_i|, code =
    * round(x·127/scale) ∈ [-127, 127]; a zero vector quantizes to zero
    * codes with zero error. Row-local projection — zero shuffle — and the
    * whole derivation (codes, checksum, reconstruction error) replays in
    * SQL, so the oracle hash-checks the quantizer itself, not just shapes.
    * All arithmetic in DOUBLE from the float inputs: ties in round() land
    * identically in both engines (both round half away from zero). */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    emb.select(col(idCol), col(vecCol)).withColumn("scale", scale)
      .withColumn("q", when(col("scale") > 0,
          transform(col(vecCol),
            x => round(x.cast("double") * 127 / col("scale")).cast("int")))
        .otherwise(transform(col(vecCol), _ => lit(0))))
      .select(col(idCol),
        size(col("q")).cast("long").as("dim"),
        col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        when(col("scale") > 0, array_max(zip_with(col(vecCol), col("q"),
            (x, q) => abs(x.cast("double") - q * col("scale") / 127))))
          .otherwise(lit(0.0)).as("max_abs_err"))
  }
}
