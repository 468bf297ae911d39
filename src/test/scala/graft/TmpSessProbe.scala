package graft
object TmpSessProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Engine.session("local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:59:59")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:29:59.999999"))
    ).toDF("k", "ts")
    val out = df.groupBy($"k", session_window($"ts", "30 minutes")).agg(count(lit(1)).as("n"))
    out.select($"k", $"session_window.start", $"session_window.end", $"n")
      .orderBy($"k", $"session_window.start").collect().foreach(r => println("ROW " + r))
    spark.stop()
  }
}
