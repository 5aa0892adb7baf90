package graft
// Dev tool (Probe/Time family): per-micro-batch duration breakdown for
// one s_* query — prints each progress event's durationMs map so the
// fixed cost of the streaming harness can be attributed (planning vs
// addBatch vs state commit vs wal) instead of guessed.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    val lines = new scala.collection.mutable.ArrayBuffer[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        lines += s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}"
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, args(0)).count()
      println(f"$name total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      lines.foreach(l => println(s"  $l"))
      lines.clear()
    }
    spark.stop()
  }
}
