package graft

import org.apache.spark.sql.functions._

/** A/B: lazy vs eager materialization of the truth frame's inner gram
  * ARRAY checkpoint (`arr` in [[graft.operators.Dedup
  * .exactJaccardWindowPairs]], measurement copy of its body below).
  *
  * Motivation (r12): every truth construct logs `Block rdd_N_p already
  * exists on this machine; not re-adding it` — under AQE's eager stage
  * submission the a-side and b-side shuffle-map stages of the inverted-
  * index self-join launch together, RACE to materialize the lazy
  * checkpoint's partitions, and each computes the full gram kernel for
  * partitions the other also computes (the losing store is discarded).
  * The scaladoc's "materialized ONCE" claim is therefore optimistic:
  * lazy = up to 2× the gram pass. An eager checkpoint computes it once
  * in a dedicated job before the join stages launch — the classic
  * job-count-vs-recompute trade the repo resolves by measurement.
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.TruthArrProbe tmp/sf10 [reps]"
  * Arms interleave (lazy, eager, lazy, eager, ...) so FS/page-cache warmth
  * is shared; read the per-arm MINS.
  */
object TruthArrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = ProbeSession.build(sfDir, "graft-truth-arr-probe")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

    def pairsCount(eagerArr: Boolean): Long = {
      val arr = graft.operators.Dedup.gramHashSets(docs)
        .localCheckpoint(eagerArr)
      val sizes = arr.select(col("id"), size(col("g")).as("n"))
      val rows = arr.select(col("id"), explode(col("g")).as("h"))
      val window = 200
      val blk = floor(col("id") / window).cast("long")
      val inter = rows
        .select(col("id").as("id_a"), col("h"),
          explode(array(blk, blk + 1)).as("blk"))
        .join(rows.select(col("id").as("id_b"), col("h"), blk.as("blk")),
          Seq("h", "blk"))
        .filter(col("id_b") > col("id_a") &&
          col("id_b") <= col("id_a") + window)
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .count()
    }

    // arm order flips per rep (lazy-first on odd reps, eager-first on
    // even) — the first run of a pair is always colder, so a fixed order
    // would hand the second arm a warmth bias (measured ~2x on this
    // host's cold-FS storms)
    for (r <- 1 to reps;
         eager <- if (r % 2 == 1) Seq(false, true) else Seq(true, false)) {
      val t0 = System.nanoTime()
      val n = pairsCount(eager)
      println(f"[arrprobe] rep $r eager=$eager%-5s pairs=$n ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
