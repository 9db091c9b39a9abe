package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the dedup-clusters family: times pair
  * generation, edge checkpoint, and each propagation round separately so
  * bench tail work targets the stage that actually costs (not committed
  * to any declared surface — a measurement main like StreamTimer).
  *
  * Usage: sbt "Test/runMain graft.ClusterProfile /root/testdata/sf0.1"
  */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cluster-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

    // stage 1: candidate pairs (signature + band self-join), forced
    val pairs = graft.operators.Dedup.minhashPairs(docs, threshold = 0.5)
    val pairsCk = timed("minhashPairs materialize") { pairs.localCheckpoint(true) }
    println(s"[profile] pairs = ${pairsCk.count()}")

    // stage 2: CC on the materialized pairs (isolates propagation cost)
    val labels = timed("clusters on materialized") {
      graft.operators.Dedup.clusters(pairsCk)
    }
    println(s"[profile] labels = ${labels.count()}")

    // stage 3: the full declared query for reference
    timed("full q_dedup_clusters") {
      graft.operators.Dedup.clusters(
        graft.operators.Dedup.minhashPairs(docs, threshold = 0.5))
        .orderBy("id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
