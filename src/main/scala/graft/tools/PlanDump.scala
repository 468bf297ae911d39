package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for named SparkEntry queries to
  * files — the plans/r16/<query>_{before,after}.txt evidence the
  * optimization round commits (run once from the pre-change tree via a git
  * worktree for the "before" set, once from HEAD for "after").
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args.take(4)
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = graft.engine.Engine.defaultParallelism
    val spark = graft.engine.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    try graft.queries.FormatQueries.ensureExports(spark, sfDir)
    catch { case _: Throwable => () }
    val all = graft.SparkEntry.queries
    names.foreach { name =>
      try {
        val df = all(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
