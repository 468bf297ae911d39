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

  /** Exact ANN baseline: brute-force cosine top-k of each query against all
    * candidates. queries: (q_id, q_vec) — small, broadcast; candidates:
    * (vec_id, embedding) — scanned once. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .withColumn("cos_sim", cosine("q_vec", "embedding"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
  }

  /** Per-label centroids (element-wise mean). Order-dependent float sums →
    * Spark-only; used by the IVF path below. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("centroid"))

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
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    candidates.join(broadcast(routed), "label")
      .withColumn("cos_sim", cosine("q_vec", "embedding"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
  }
}
