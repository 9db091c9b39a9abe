package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of declared
  * queries (measurement tooling for the optimization rounds — guide §1.1:
  * capture the plan shape before and after every change). Usage:
  *
  *   SPARK_GRAFT_PLAN_QUERIES=q_dedup_minhash,q_dedup_clusters \
  *   SPARK_GRAFT_PLAN_SUFFIX=before \
  *   SPARK_GRAFT_PLAN_DIR=plans/r14 \
  *   sbt "runMain graft.PlanExplain"
  *
  * Writes <dir>/<query>_<suffix>.txt. Same session config as Bench (minus
  * the timing machinery) so the dumped plans match what the bench runs.
  * NOTE: iterative operators (Dedup.clusters, Percentiles.exact) execute
  * their driver-synced jobs at BUILD time; their dumped plan is the final
  * returned query, starting from checkpointed RDD scans — same caveat as
  * PLANS.md.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val dir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r14"))
    java.nio.file.Files.createDirectories(dir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "33554432"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[planexplain] unknown query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(dir.resolve(s"${n}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[planexplain] wrote ${n}_$suffix.txt")
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[planexplain] $n failed: $e")
          }
      }
    }
    spark.stop()
  }
}
