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
    // Usage: Probe <sfDir> [--time] <query>...
    //   one query          → plan inspection: ONE run (AQE-finalized), plan
    //   one query + --time → 3× timing loop, then the finalized plan
    //   many queries       → 3× timing loop each, no plan
    // (round-5 advice: the unconditional timing loop made plan-only usage
    // run the query 4×, and 3+ queries silently lost the plan print)
    val forceTime = args.contains("--time")
    val rest = args.filterNot(_ == "--time")
    val sfDir = rest(0)
    val qs = rest.drop(1)
    if (qs.length > 1 || forceTime) qs.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s ${times.map(t => f"$t%.2f").mkString("  ")}")
    }
    if (qs.length == 1) {
      val df = SparkEntry.queries(qs(0))(spark, sfDir)
      df.count() // let AQE finalize before printing the executed plan
      println(df.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")
          || l.contains("Aggregate") || l.contains("Scan parquet") || l.contains("Sort")
          || l.contains("Window") || l.contains("Limit")
          || l.contains("TakeOrdered"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
