package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic scale-ladder stress-set generator (VERDICT r3 "Next round
  * #1": turn the 100 TB plan claims into measured evidence).
  *
  * Derives an ~sf(K/10) set from a base sf0.1 directory as the union of K
  * key-offset copies of every fact table — the testdata itself is read-only,
  * so the ladder rung is derived, not regenerated:
  *
  *   - surrogate keys shift by `copy * 100_000_000` so copies never collide
  *     and FK joins (orders→customer, lineitem→part/supplier) stay consistent
  *     within a copy;
  *   - document text is consonant-rotated per copy (a length-preserving
  *     `translate`), so `n_chars` stays exact, token/shingle statistics are
  *     preserved, and cross-copy Jaccard is low — the corpus grows 10× while
  *     near-dup DENSITY stays constant, which is the realistic 100 TB shape
  *     (the pathological shared-boilerplate shape is SkewGen's job);
  *   - embeddings rotate by `copy` positions (norm-preserving), so cosine
  *     structure inside a copy is intact and cross-copy similarity is
  *     incidental — ANN candidate counts scale linearly;
  *   - region/nation stay fixed (TPC-H dimensions are SF-invariant).
  *
  * Every transform is a pure column expression: re-running produces
  * bit-identical output, and the result is plain parquet DuckDB can scan, so
  * the oracle gate works at stress scale too (tools/selfcheck.py globs
  * directory-style tables).
  *
  * Usage: runMain graft.tools.StressGen [baseDir] [outDir] [copies]
  */
object StressGen {

  /** Key offset per copy — far above any base-scale surrogate key. */
  val Off: Long = 100000000L

  /** 10-cycle consonant alphabet: rotations are distinct for copy 0..9, so no
    * two copies share a text transform (a 5-cycle like vowels would alias
    * copy 0 and 5 into exact duplicates). */
  private val Cons = "bcdfghjklm"

  private def rot(s: String, i: Int): String = {
    val k = i % s.length
    s.drop(k) + s.take(k)
  }

  /** Per-copy text perturbation: length-preserving consonant rotation (lower
    * and upper case). Copy 0 is the identity — the base corpus survives. */
  def perturbText(c: Column, copy: Int): Column =
    if (copy == 0) c
    else translate(c, Cons + Cons.toUpperCase, rot(Cons, copy) + rot(Cons, copy).toUpperCase)

  /** Per-copy embedding perturbation: rotate the vector left by `copy`
    * positions — norm-preserving, deterministic, distinct per copy. */
  def perturbVec(name: String, copy: Int): Column =
    if (copy == 0) col(name)
    else expr(s"concat(slice($name, ${copy + 1}, size($name) - $copy), slice($name, 1, $copy))")

  private def shift(name: String, copy: Int): Column = col(name) + lit(copy * Off)

  /** One key-offset copy of a table. */
  def copyOf(df: DataFrame, table: String, i: Int): DataFrame = table match {
    case "region" | "nation" => df // SF-invariant dimensions
    case "customer" => df.withColumn("c_custkey", shift("c_custkey", i))
    case "supplier" => df.withColumn("s_suppkey", shift("s_suppkey", i))
    case "part"     => df.withColumn("p_partkey", shift("p_partkey", i))
    case "orders" => df
      .withColumn("o_orderkey", shift("o_orderkey", i))
      .withColumn("o_custkey", shift("o_custkey", i))
    case "lineitem" => df
      .withColumn("l_orderkey", shift("l_orderkey", i))
      .withColumn("l_partkey", shift("l_partkey", i))
      .withColumn("l_suppkey", shift("l_suppkey", i))
    case "events" => df
      .withColumn("event_id", shift("event_id", i))
      .withColumn("user_id", shift("user_id", i))
    case "documents" => df
      .withColumn("doc_id", shift("doc_id", i))
      .withColumn("text", perturbText(col("text"), i))
    case "embeddings" => df
      .withColumn("vec_id", shift("vec_id", i))
      .withColumn("embedding", perturbVec("embedding", i))
    case other => sys.error(s"StressGen: unknown table $other")
  }

  /** The scaled union for one table. Loaded via Tables.load so events.ts is
    * already normalized to TimestampType — the stress parquet then carries a
    * plain timestamp column both Spark and DuckDB read identically. */
  def scaled(spark: SparkSession, baseDir: String, table: String, copies: Int): DataFrame = {
    val base = Tables.load(spark, baseDir, table)
    if (table == "region" || table == "nation") base
    else (0 until copies).map(copyOf(base, table, _)).reduce(_ unionByName _)
  }

  def generate(spark: SparkSession, baseDir: String, outDir: String, copies: Int): Unit =
    Tables.names.foreach { t =>
      val df = scaled(spark, baseDir, t, copies)
      // Fact tables land as ~cores part files — the realistic big-data layout
      // (a 100 TB table is thousands of files, never one) and what lets the
      // scan parallelize: a K-copy union would otherwise write K ~sf0.1-sized
      // files and cap effective scan width at K tasks (parquet row groups
      // don't sub-split). round-robin repartition keeps output deterministic
      // in CONTENT (per-file layout varies, but every query result is
      // row-order-free).
      val parts = spark.sparkContext.defaultParallelism
      val out = if (t == "region" || t == "nation") df else df.repartition(parts)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/stress/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.engine.Engine.session()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out, copies)
    Tables.names.foreach { t =>
      println(s"[stressgen] $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
