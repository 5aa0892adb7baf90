package graft
// Dev tool: stage-level scratch profiler for plan investigation.
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    args.drop(1).foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, args(0)).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s ${times.map(t => f"$t%.2f").mkString("  ")}")
    }
    if (args.length == 2) {
      val df = SparkEntry.queries(args(1))(spark, args(0))
      df.count() // let AQE finalize before printing the executed plan
      println(df.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")
          || l.contains("Aggregate") || l.contains("Scan parquet") || l.contains("Sort"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
