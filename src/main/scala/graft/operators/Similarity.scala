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

  /** Sequential-fold dot product of two float-vector columns, in double. */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Per-label centroids (element-wise mean), DETERMINISTIC: each dimension
    * folds sequentially over members in vec_id order (sort the collected
    * (vec_id, v) structs, then a left fold in double). Order-fixed float
    * sums are reproducible in any engine — this is what gives the IVF path a
    * DuckDB oracle. The collect_list per (label, pos) holds one float per
    * cell member — bounded by cell size, not corpus size. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(
        expr("aggregate(transform(array_sort(collect_list(struct(vec_id, v))), " +
          "s -> CAST(s.v AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("sum_v"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"), (col("sum_v") / col("n")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("centroid"))

  /** The DuckDB rendering of labelCentroids' arithmetic (oracle side):
    * per-dimension ordered fold, then list ordered by dimension. */
  def centroidsSql(candidatesRel: String): String = s"""
      cx AS (SELECT label, vec_id, cv,
                    unnest(generate_series(1, len(cv))) AS pos FROM $candidatesRel),
      cvals AS (SELECT label, vec_id, pos, cv[pos]::DOUBLE AS v FROM cx),
      psum AS (SELECT label, pos,
                      list_reduce(list(v ORDER BY vec_id), (acc, x) -> acc + x) AS sum_v,
                      count(*) AS n
               FROM cvals GROUP BY label, pos),
      cent AS (SELECT label, list(sum_v / n ORDER BY pos) AS centroid
               FROM psum GROUP BY label)"""

  /** IVF-style ANN: route each query to its nearest centroid cell, then
    * search only that cell. At 100 TB this turns a full scan per query into
    * a 1/cells scan; cells are the shuffle key so each executor holds whole
    * cells. nprobe fixed at 1 here; raise by taking top-n cells instead. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val cents = labelCentroids(candidates)
    val wq = Window.partitionBy(col("q_id")).orderBy(col("cell_sim").desc, col("label"))
    val routed = queries.crossJoin(broadcast(cents))
      .withColumn("cell_sim", cosine("q_vec", "centroid"))
      .withColumn("cr", row_number().over(wq))
      .filter(col("cr") === 1)
      .select(col("q_id"), col("q_vec"), col("label"))
    val scored = candidates.join(broadcast(routed), "label")
      .withColumn("cos_sim", cosine("q_vec", "embedding"))
    topKPerQuery(scored, k)
  }
}
