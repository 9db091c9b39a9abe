package graft

import org.apache.spark.sql.functions._

/** Stage attribution for `q_dedup_clusters_exact_first` (VERDICT r11
  * item 1): the sf100 cell ran ×13.9/decade where the sibling pipeline
  * query is ×10.2-additive, with the ×1.4 excess attributed by prose to
  * the agreement join over 1000-copy truth clusters. This probe times the
  * query's stages separately so the excess gets a measured owner:
  *
  *   S1 truth   — exactJaccardWindowPairs materialize (shared with the
  *                sibling; linear by construction, pairs ×10/decade)
  *   S2 cc      — declared CC over the materialized truth pairs
  *   S3 ef      — clustersExactFirst over the full corpus, output
  *                materialized at ID level (the shipped r11 shape: one
  *                (id, cluster) row per clustered doc — the WHOLE corpus
  *                on a duplication-adversarial SF where every text has
  *                d copies and d ≥ 2 marks every group clustered)
  *   S4 flag    — the two truth⋈ef agreement joins + the 0.7 aggregate,
  *                r11 shape (joins against the CORPUS-SIZED ef frame)
  *   S4r flag'  — the same agreement computed against ef RESTRICTED to
  *                the ids the truth frame actually mentions (a census-
  *                gated broadcast semi-join: |truth ids| ≤ 2×pairs, and
  *                pairs are ×10/decade by construction — the corpus-sized
  *                shuffles disappear). Prints both flag values so the
  *                restriction is visibly value-preserving.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.ClusterFlagProbe tmp/sf100 [runs]"
  */
object ClusterFlagProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 1
    val spark = ProbeSession.build(sfDir, "graft-cluster-flag-probe")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[flagprobe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%9.3f s")
      r
    }

    for (run <- 1 to runs) {
      println(s"[flagprobe] === run $run sfDir=$sfDir ===")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("id"), col("text"))

      val truth = graft.operators.Dedup
        .exactJaccardWindowPairs(docs, tau = 0.5, window = 200)
        .localCheckpoint(false)
      timed("S1 truth materialize") {
        println(s"[flagprobe]   pairs = ${truth.count()}")
      }
      val declared = timed("S2 declared CC") {
        val d = graft.operators.Dedup.clusters(truth)
        println(s"[flagprobe]   labels = ${d.count()}")
        d
      }
      val ef = graft.operators.Dedup.clustersExactFirst(docs, threshold = 0.5)
        .localCheckpoint(false)
      timed("S3 ef operator") {
        println(s"[flagprobe]   ef rows = ${ef.count()}")
      }
      val flagOf = (assign: org.apache.spark.sql.DataFrame) => truth
        .join(assign.select(col("id").as("id_a"), col("cluster").as("__ca")),
          Seq("id_a"), "left")
        .join(assign.select(col("id").as("id_b"), col("cluster").as("__cb")),
          Seq("id_b"), "left")
        .agg((count(when(col("__ca") === col("__cb"), 1)) >=
          count(lit(1)).cast("double") * lit(0.7)).as("ok"))
      timed("S4 flag (corpus ef)") {
        println(s"[flagprobe]   flag = ${flagOf(ef).collect().head.getBoolean(0)}")
      }
      timed("S4r flag (restricted ef)") {
        val tids = truth.select(col("id_a").as("id"))
          .union(truth.select(col("id_b").as("id")))
          .distinct()
          .localCheckpoint(false)
        val small =
          (if (tids.count() <= (1L << 22)) broadcast(tids) else tids)
        val efSmall = ef.join(small, Seq("id"), "left_semi")
          .localCheckpoint(false)
        println(s"[flagprobe]   efSmall rows = ${efSmall.count()}")
        println(s"[flagprobe]   flag = ${flagOf(efSmall).collect().head.getBoolean(0)}")
      }
      // reference: the declared output forced like the bench does
      timed("S5 declared write") {
        declared.orderBy("id").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
