package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime backstop behind the manual
  * salting pattern (q_join_salted): one hot key concentrated in a single
  * shuffle partition must be split by OptimizeSkewedJoin at execution
  * time. Thresholds are lowered so the tiny test dataset registers as
  * skewed; at cluster scale the defaults (256 MB) do the same job.
  */
class SkewJoinSpec extends SparkSpecBase {

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot-key partition (skew=true in the final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 95% of left rows share key 0 → one shuffle partition dwarfs the rest
      val left = spark.range(100000)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(200).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // collect() (not count()) so the inspected queryExecution is the
      // one that actually ran — count() builds a separate plan
      val n = joined.collect().length.toLong
      // correctness: only keys 0 and multiples of 20 < 100000 that also
      // exist in right (0..199) match
      val expected = left.filter(col("k") < 200).count()
      assert(n == expected)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    }
  }
}
