package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-level profiler for individual bench queries (guide §1: measure
  * first). Runs the named SparkEntry queries through the noop sink with a
  * listener that records every Spark job's wall clock, task count and task
  * time, then prints a per-query timeline: job offsets/durations plus the
  * DRIVER GAPS between jobs (planning, log replay, commit, file listing —
  * the time the cluster sits idle). The gap/job split tells you whether a
  * flat-cost query is executor-bound or driver-bound before touching it.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.QueryProfile <sfDir> <q1,q2,...> [runs]
  */
object QueryProfile {

  private case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = 0L, var tasks: Int = 0, var taskTimeMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = graft.engine.Engine.defaultParallelism
    val spark = graft.engine.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    // exact task attribution: SparkListenerJobStart declares its stage ids,
    // so map stageId → jobId instead of guessing "most recent open job"
    // (concurrent jobs — e.g. the merge writes — would misattribute there)
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        e.stageIds.foreach(sid => stageJob.put(sid, e.jobId))
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.synchronized { r.end = e.time }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (recording && e.taskMetrics != null) {
          val jid = stageJob.get(e.stageId)
          val r = if (jid != null) jobs.get(jid.intValue()) else null
          if (r != null) r.synchronized {
            r.tasks += 1; r.taskTimeMs += e.taskMetrics.executorRunTime
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val all = graft.SparkEntry.queries
    def once(name: String, dir: String): Double = {
      val fn = all(name)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      // warm-up on the tiny sf (JIT/codegen), untimed
      try once(name, "/root/testdata/sf0.001") catch { case e: Throwable =>
        System.err.println(s"[profile] warm-up failed $name: ${e.getMessage}") }
      try graft.queries.FormatQueries.ensureExports(spark, sfDir)
      catch { case _: Throwable => () }
      val walls = (1 to runs).map { pass =>
        jobs.clear()
        stageJob.clear()
        recording = true
        val wallStart = System.currentTimeMillis()
        val wall = once(name, sfDir)
        recording = false
        if (pass == runs) {
          val rs = jobs.values().toArray(Array.empty[JobRec]).sortBy(_.start)
          println(f"%n=== $name pass $pass wall=$wall%.3f s  jobs=${rs.length} ===")
          var prevEnd = wallStart
          var gapTot = 0L; var jobTot = 0L
          rs.foreach { r =>
            val gap = r.start - prevEnd
            val dur = math.max(0L, r.end - r.start)
            gapTot += math.max(0L, gap); jobTot += dur
            val flag = if (gap > 150 || dur > 300) " <<<" else ""
            println(f"  +${(r.start - wallStart) / 1000.0}%7.3f gap=${gap / 1000.0}%6.3f job=${dur / 1000.0}%7.3f tasks=${r.tasks}%4d ttime=${r.taskTimeMs / 1000.0}%7.2f  ${r.desc.take(110)}$flag")
            prevEnd = math.max(prevEnd, r.end)
          }
          val tail = wallStart + (wall * 1000).toLong - prevEnd
          println(f"  [sum] jobs=${jobTot / 1000.0}%.3f s  gaps=${gapTot / 1000.0}%.3f s  tail=${tail / 1000.0}%.3f s")
        }
        wall
      }
      println(f"[profile] $name min=${walls.min}%.3f s over $runs runs")
    }
    spark.stop()
  }
}
