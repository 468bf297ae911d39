package graft.tools

import org.apache.spark.sql.functions._

/** Driver-metadata ceiling measurement (VERDICT r10 "Next round #4"): every
  * native-reader plan holds one entry per live file on the driver (the same
  * O(files) local planning delta-kernel and Iceberg's planner carry). This
  * tool converts the "survives 100×" design claim into measured fact: it
  * writes a REAL native Delta and Iceberg table with N tiny files
  * (`max_file_size_rows=1`, footer-true stats/bounds per file), then
  * measures, per format:
  *
  *   - attach time (full log/manifest replay → DataFrame);
  *   - plan time for a pruned point query (`WHERE k = N/2` — forces the
  *     FileIndex to parse/evaluate the per-file stats of ALL N entries);
  *   - execution time (should open ~1 file if pruning works);
  *   - pruned-file receipt (numFiles metric) and retained driver heap.
  *
  * Usage: runMain graft.tools.MetaStress [nFiles] [outDir]
  * Prints one JSON line per (format, N). Results land in SCALE.md.
  */
object MetaStress {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def heapMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val out = args.lift(1).getOrElse("target/metastress")
    val spark = graft.engine.Engine.session()
    spark.sparkContext.setLogLevel("WARN")
    import graft.catalog.{Catalog, Sinks}

    val df = spark.range(n.toLong)
      .select(col("id").as("k"), (col("id") * 2).as("v"),
        concat(lit("row-"), col("id")).as("tag"))

    Seq("delta", "iceberg").foreach { fmt =>
      val root = s"$out/${fmt}_$n"
      val rootFile = new java.io.File(root)
      val marker = new java.io.File(rootFile,
        if (fmt == "delta") "_delta_log" else "metadata")
      val wSec =
        if (marker.exists()) -1.0
        else {
          if (rootFile.exists()) {
            import java.nio.file._
            Files.walk(rootFile.toPath)
              .sorted(java.util.Comparator.reverseOrder[Path]())
              .forEach(p => Files.deleteIfExists(p))
          }
          timed(Sinks.copyTo(df, root, fmt, Map("max_file_size_rows" -> "1")))._2
        }
      val baseHeap = heapMb()
      val (attached, aSec) = timed(
        Catalog.attach(spark, s"meta_${fmt}_$n", fmt, Map("files" -> root)))
      val attachHeap = heapMb()
      val q = attached.filter(col("k") === n / 2)
      val (_, pSec) = timed(q.queryExecution.executedPlan)
      val (rows, eSec) = timed(q.collect())
      require(rows.length == 1 && rows(0).getLong(1) == n.toLong / 2 * 2,
        s"point query wrong: ${rows.mkString(",")}")
      // pruned receipt: files actually read by the executed plan
      val scans = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val filesRead = scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(-1L)).sum
      println(s"""{"tool":"metastress","format":"$fmt","files":$n,""" +
        s""""write_sec":${f"$wSec%.1f"},"attach_sec":${f"$aSec%.2f"},""" +
        s""""plan_sec":${f"$pSec%.2f"},"exec_sec":${f"$eSec%.2f"},""" +
        s""""files_read":$filesRead,"heap_before_mb":$baseHeap,""" +
        s""""heap_after_attach_mb":$attachHeap}""")
    }
    spark.stop()
  }
}
