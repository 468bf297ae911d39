package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local smoke check (not part of the driver contract). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Engine.session("local[4]")
    val dir = "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      try {
        val df = Tables.load(spark, dir, n)
        println(s"$n -> ${df.schema.simpleString.take(200)}")
        if (n == "events") df.show(3, false)
        if (n == "embeddings") df.show(2, false)
      } catch { case e: Throwable => println(s"$n FAILED: ${e.toString.take(300)}") }
    }
    spark.stop()
  }
}
