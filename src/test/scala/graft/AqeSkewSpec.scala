package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot key that dwarfs every other partition
  * must be split into parallel sub-partitions at runtime — the modern
  * (planner-level) answer to skew, complementing the explicit salting in
  * `operators.Skew` for cases where AQE's byte thresholds don't trigger.
  */
class AqeSkewSpec extends SparkSpec {

  test("a hot join key is split by AQE skew handling with unchanged results") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production thresholds assume 256MB partitions; scale them down so
      // the 200k-row hot key qualifies as skewed at test scale
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // one hot key (0) with 200k rows; 31 cold keys with 500 each
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("lv"))
        .unionAll(spark.range(15500).select(
          (col("id") % 31 + 1).as("k"), col("id").as("lv")))
      val right = spark.range(32).select(col("id").as("k"),
        (col("id") * 10).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS dataset so its AQE plan finalizes (count() would
      // execute a different query tree and leave this plan un-finalized)
      val n = joined.collect().length
      assert(n == 215500, s"row count changed under skew split: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew handling in final AQE plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
