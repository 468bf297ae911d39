package graft.sqlapi

import org.apache.spark.sql.SparkSession

/** Debug GUCs (reference: src/debug_guc.rs:20-55 — `paradedb.disable_fdw` /
  * `paradedb.disable_executor` force either execution path). The Spark
  * analogues force observable plan changes for debugging:
  *
  *   - disable_pushdown ≙ disable_fdw: source filter pushdown off — every
  *     predicate evaluates post-scan (plans show `PushedFilters: []`).
  *   - disable_codegen ≙ disable_executor: whole-stage codegen off — the
  *     interpreted (fallback-style) execution path runs.
  */
object DebugFlags {

  val DisablePushdown = "graft.debug.disable_pushdown"
  val DisableCodegen = "graft.debug.disable_codegen"

  private val pushdownConfs = Seq(
    "spark.sql.parquet.filterPushdown",
    "spark.sql.csv.filterPushdown",
    "spark.sql.json.filterPushdown",
    "spark.sql.orc.filterPushdown")

  def set(spark: SparkSession, flag: String, on: Boolean): Unit = flag match {
    case DisablePushdown =>
      pushdownConfs.foreach(k => spark.conf.set(k, (!on).toString))
      spark.conf.set(flag, on.toString)
    case DisableCodegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", (!on).toString)
      spark.conf.set(flag, on.toString)
    case other => throw new IllegalArgumentException(
      s"unknown debug flag `$other`; valid: $DisablePushdown, $DisableCodegen")
  }

  def get(spark: SparkSession, flag: String): Boolean =
    spark.conf.getOption(flag).exists(_.toBoolean)
}
