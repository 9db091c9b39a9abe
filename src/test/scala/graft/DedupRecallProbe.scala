package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the GENUINE recall of the minhash/simhash candidate pair sets
  * against the exact window-blocked Jaccard truth frame — the measurement
  * behind the r10 oracle pairing of q_dedup_minhash/q_dedup_simhash
  * (exact-plus-genuine-flag pattern; the kNN analog is KnnRecallProbe).
  * The declared flag bounds must sit well under every cell printed here.
  *
  * Usage: sbt "Test/runMain graft.DedupRecallProbe [sfDir ...]"
  */
object DedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    dirs.foreach { d =>
      val docs = graft.sources.Tables.documents(spark, d)
        .select(col("doc_id").as("id"), col("text"))
      val truth = Dedup.exactJaccardWindowPairs(docs, tau = 0.5, window = 200)
        .localCheckpoint(true)
      val nTruth = truth.count()
      Seq(
        ("minhash", Dedup.minhashPairs(docs, threshold = 0.5)),
        ("simhash", Dedup.simhashPairs(docs, maxDist = 3))
      ).foreach { case (name, pairs) =>
        val cand = pairs.filter(col("id_b") - col("id_a") <= 200)
        val nCand = cand.count()
        val hits = truth.join(cand.select("id_a", "id_b"),
          Seq("id_a", "id_b"), "left_semi").count()
        val recall = if (nTruth == 0) Double.NaN else hits.toDouble / nTruth
        println(f"[dedup-recall] $d $name truth=$nTruth " +
          f"candidates_in_window=$nCand hits=$hits recall=$recall%.3f")
      }
    }
    spark.stop()
  }
}
