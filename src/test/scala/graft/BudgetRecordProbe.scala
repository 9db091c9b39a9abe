package graft

import org.apache.spark.sql.SparkSession

/** Budget re-record probe (r15): prints, for the named queries (or the
  * budget tables' keys when none given), the Exchange count exactly as
  * ShuffleBudgetSpec counts it and the jobs-from-build-through-noop-write
  * exactly as JobBudgetSpec counts them, in the specs' own session config
  * (local[4], shuffle=4, sf0.001). Re-recording a budget table means
  * running this and copying the numbers — never loosening slack.
  *
  *   sbt "Test/runMain graft.BudgetRecordProbe q_dedup_clusters ..."
  */
object BudgetRecordProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-budget-record")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.queries.Registry.all.map(_.name)
    val counter = new JobCountProbe.JobCounter
    spark.sparkContext.addSparkListener(counter)
    def drained(): Long = {
      org.apache.spark.GraftListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      counter.snapshot
    }
    names.foreach { name =>
      val j0 = drained()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val exch = "Exchange".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
      df.write.format("noop").mode("overwrite").save()
      val jobs = drained() - j0
      println(s"[budget] $name exchanges=$exch jobs=$jobs")
    }
    spark.stop()
  }
}
