package graft
// Dev tool: stage-level scratch profiler for plan investigation.
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.count()  // let AQE finalize
    println(df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")
        || l.contains("Aggregate") || l.contains("Scan parquet") || l.contains("Sort"))
      .mkString("\n"))
    spark.stop()
  }
}
