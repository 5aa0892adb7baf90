package graft
// Dev tool (Probe/Time family): per-JOB wall-clock breakdown for one
// query — prints every Spark job's duration, stage count and task count
// so loop-query round costs can be attributed (broadcast builds,
// checkpoint materializations, probe actions) instead of guessed.
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object JobProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val lines = new scala.collection.mutable.ArrayBuffer[String]()
    var tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (System.nanoTime(), e.stageInfos.size))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        tasks.addAndGet(e.stageInfo.numTasks)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, nStages) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.synchronized {
            lines += f"  job=${e.jobId}%3d ${ms}%8.1f ms stages=$nStages"
          }
        }
      }
    })
    val sfDir = args(0)
    args.drop(1).foreach { name =>
      // warm run first, then the profiled run
      SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(500)
      lines.synchronized(lines.clear())
      tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"$name total=$total%.2f s tasks=${tasks.get()}")
      lines.synchronized(lines.foreach(println))
    }
    spark.stop()
  }
}
