package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Runtime row-level join pruning: with runtime bloom filters enabled,
  * a selective build side injects a bloom-filter probe into the fact scan,
  * so fact rows that cannot join are dropped at (or near) the scan instead
  * of surviving until the join — at 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the matching slice.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom-filter probe on the fact side") {
    val conf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val appThresh =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prevEnabled = spark.conf.get(conf)
    val prevApp = spark.conf.get(appThresh)
    val prevBcast = spark.conf.get(bcast)
    try {
      spark.conf.set(conf, "true")
      // production gates assume 10GB+ fact scans and shuffled joins; at
      // test scale force the shuffled-join shape and drop the size gate
      // so the injection logic itself is exercised
      spark.conf.set(appThresh, "0")
      spark.conf.set(bcast, "-1")
      val orders = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = Tables.lineitem(spark, sfDir)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered plan still returns exactly the join's rows
      val n = joined.count()
      spark.conf.set(conf, "false")
      assert(n == joined.count())
    } finally {
      spark.conf.set(conf, prevEnabled)
      spark.conf.set(appThresh, prevApp)
      spark.conf.set(bcast, prevBcast)
    }
  }
}
