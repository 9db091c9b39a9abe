package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the capped-bucket DROP counters actually incurred by the
  * minhash/simhash pair stages on a given sf dir (VERDICT r6 item 5): the
  * maxBucket cap trades recall for boundedness, and its named accumulators
  * exist precisely so the trade is observable — this main records what the
  * ScaleGen duplication corpora actually drop, plain vs exact-first
  * (the exact-first collapse should push drops to ~zero because a d-copy
  * group enters its LSH bucket as ONE representative).
  *
  * Usage: sbt "Test/runMain graft.DropAudit <sfDir>"
  * Prints one line per (algorithm, composition): dropped buckets/members,
  * largest bucket seen, and the surviving pair count.
  */
object DropAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dropaudit")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    // the exact-first representative collapse, as in
    // Dedup.survivorsExactFirst / clustersExactFirst (degenerate texts
    // bypass the pair stage there and cannot contribute drops)
    val degenerate = trim(coalesce(col("text"), lit(""))) === ""
    val reps = docs.filter(!degenerate)
      .groupBy(col("text")).agg(min(col("id")).as("id"))
      .select(col("id"), col("text"))
      .localCheckpoint(true)

    def audit(label: String, run: Dedup.DropStats => Long): Unit = {
      val st = Dedup.dropStats(spark, label)
      val t0 = System.nanoTime()
      val pairs = run(st)
      println(f"[dropaudit] $label%-24s pairs=$pairs%-9d " +
        f"dropped_buckets=${st.droppedBuckets.value}%-6d " +
        f"dropped_members=${st.droppedMembers.value}%-8d " +
        f"largest_bucket=${st.largestBucket.value}%-6d " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    audit("minhash_plain",
      st => Dedup.minhashPairs(docs, stats = Some(st)).count())
    audit("minhash_exact_first",
      st => Dedup.minhashPairs(reps, stats = Some(st)).count())
    audit("simhash_plain",
      st => Dedup.simhashPairs(docs, stats = Some(st)).count())
    audit("simhash_exact_first",
      st => Dedup.simhashPairs(reps, stats = Some(st)).count())
    spark.stop()
  }
}
