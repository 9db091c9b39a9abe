package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway A/B probe for the clustersExactFirst sf1000 cell: times the
  * operator's exact composition with the CC stage on the driver route vs
  * the distributed loop (`driverCap` forced), same bench-like config, N
  * warm repeats per arm in one JVM. Not part of the declared surface.
  *
  * Usage: sbt "Test/runMain graft.CefProbe /root/repo/tmp/sf1000 2"
  */
object CefProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf1000")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cef-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", {
        val root = java.nio.file.Paths.get(sfDir)
        val s = java.nio.file.Files.walk(root)
        val bytes = try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum() finally s.close()
        math.min(math.max(bytes / (32L << 20), 32L), 1024L).toString
      })
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

    // the REAL operator with clusters()' driverCap plumbed through — an
    // inlined copy of its body here would silently drift from the shape
    // being attributed (the census-gated expansion broadcast already did)
    def cef(driverCap: Long) =
      Dedup.clustersExactFirst(docs, threshold = 0.5, driverCap = driverCap)

    for (arm <- Seq("driver" -> (1L << 20), "distributed" -> 0L);
         r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = cef(arm._2)
      df.orderBy("id").write.format("noop").mode("overwrite").save()
      println(f"[cef] arm=${arm._1}%-12s run=$r ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      val plan = df.queryExecution.executedPlan.toString
      if (r == 1) println("[cef] expansion-join lines: " + plan.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.take(100)).mkString(" || "))
    }
    spark.stop()
  }
}
