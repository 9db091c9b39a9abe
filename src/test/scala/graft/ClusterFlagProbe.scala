package graft

import org.apache.spark.sql.functions._

/** Stage attribution for `q_dedup_clusters_exact_first` (VERDICT r11
  * item 1): the sf100 cell ran ×13.9/decade where the sibling pipeline
  * query is ×10.2-additive, with the ×1.4 excess attributed by prose to
  * the agreement join over 1000-copy truth clusters. This probe times the
  * query's stages separately so the excess gets a measured owner.
  *
  * Two lessons are baked into its shape (first r12 run): CONSTRUCTION
  * lines execute real work — `clustersExactFirst` runs its censuses, CC
  * loop, and driver collect synchronously inside the call, and a lazy
  * `localCheckpoint(false)` under AQE materializes every stage but the
  * final one at creation (AdaptiveSparkPlanExec.doExecute submits all
  * shuffle stages eagerly) — so each `val` is timed as its own stage, and
  * the ef operator additionally gets an internals section that replays
  * its sub-stages (collapse census, rep-level pair+CC, label census,
  * expansion join) one materialization at a time.
  *
  *   S1c/S1 truth  — exactJaccardWindowPairs construct / count
  *   S2 cc         — declared CC over the materialized truth pairs
  *   S3c/S3 ef     — clustersExactFirst construct / count (r11 shape:
  *                   corpus-sized ID-level output)
  *   E1..E4        — ef internals, replayed
  *   S4 flag       — r11 agreement shape (two corpus-sized joins)
  *   S4r flag'     — truth-restricted agreement ([[graft.operators.Dedup
  *                   .clusterAgreementFlag]]); prints both flag values so
  *                   the restriction is visibly value-preserving
  *   S5            — declared write (noop-equivalent ordering)
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

      val truth = timed("S1c truth construct") {
        graft.operators.Dedup
          .exactJaccardWindowPairs(docs, tau = 0.5, window = 200)
          .localCheckpoint(false)
      }
      timed("S1 truth count") {
        println(s"[flagprobe]   pairs = ${truth.count()}")
      }
      val declared = timed("S2 declared CC") {
        val d = graft.operators.Dedup.clusters(truth)
        println(s"[flagprobe]   labels = ${d.count()}")
        d
      }

      // ── ef internals, replayed one materialization at a time (mirrors
      // Dedup.clustersExactFirst; measurement copy, cited there) ──
      locally {
        val nonDegenerate = docs
          .filter(trim(coalesce(col("text"), lit(""))) =!= "")
        val groups = timed("E1 collapse groupBy(text)") {
          val g = nonDegenerate.groupBy(col("text"))
            .agg(min(col("id")).as("rep"), count(lit(1)).as("grp_n"))
            .localCheckpoint(false)
          println(s"[flagprobe]   distinct texts = ${g.count()}")
          g
        }
        val repLabels = timed("E2 rep pairs + CC") {
          val r = graft.operators.Dedup.clusters(
            graft.operators.Dedup.minhashPairs(
              groups.select(col("rep").as("id"), col("text")), 0.5))
            .select(col("id").as("rep_id"), col("cluster").as("rep_cluster"))
          println(s"[flagprobe]   rep labels = ${r.count()}")
          r
        }
        val labeled = timed("E3 label census") {
          val l = groups.join(repLabels, col("rep") === col("rep_id"), "left")
            .filter(col("rep_cluster").isNotNull || col("grp_n") >= 2)
            .select(col("text"),
              coalesce(col("rep_cluster"), col("rep")).as("cluster"))
            .localCheckpoint(false)
          println(s"[flagprobe]   labeled = ${l.count()}")
          l
        }
        timed("E4 expansion join count") {
          println(s"[flagprobe]   expanded = ${nonDegenerate
            .join(broadcast(labeled), Seq("text"))
            .select(col("id"), col("cluster")).count()}")
        }
      }

      val ef = timed("S3c ef construct") {
        graft.operators.Dedup.clustersExactFirst(docs, threshold = 0.5)
          .localCheckpoint(false)
      }
      timed("S3 ef count") {
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
      timed("S4r flag (restricted)") {
        println(s"[flagprobe]   flag = ${graft.operators.Dedup
          .clusterAgreementFlag(truth, ef, 0.7, "ok")
          .collect().head.getBoolean(0)}")
      }
      timed("S5 declared write") {
        declared.orderBy("id").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
