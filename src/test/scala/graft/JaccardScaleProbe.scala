package graft

import org.apache.spark.sql.functions._

/** Decade cells for the r10 inverted-index exact-Jaccard window join
  * ([[graft.operators.Dedup.exactJaccardWindowPairs]]) — the truth-frame
  * machinery inside six oracle-paired queries' declared rows, measured on
  * the shape those queries run (tau 0.5, window 200). The scaling claim
  * to verify: pair work is bounded by shared-gram incidences (window-
  * capped per gram occurrence), so the join scales linearly in the corpus
  * at fixed window — including the documented stop-gram hot-key caveat.
  *
  * Usage: sbt "Test/runMain graft.JaccardScaleProbe [dirs...]"
  */
object JaccardScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("tmp/sf1", "tmp/sf10", "tmp/sf100")
    Bench.spinMarkerMs(1000000L)
    val spin = Bench.spinMarkerMs()
    // one bench-config session PER dir (r11): the initial-partition count
    // is sized to the directory being measured, exactly as Bench.main
    // sizes it for its SPARK_GRAFT_SF_DIR — a shared session would run
    // every cell but one under another SF's start count (the default-AQE
    // session this replaced coalesced the join shuffle into overpacked
    // partitions: 88.9 s for a subplan the bench config runs inside
    // 47–51 s queries). Session startup (~2 s) is noise at these cells'
    // scale and outside the timed region.
    dirs.foreach { d =>
      val spark = ProbeSession.build(d, "graft-jaccardscale")
      val docs = graft.sources.Tables.documents(spark, d)
        .select(col("doc_id").as("id"), col("text"))
      val n = docs.count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val res = graft.operators.Dedup
          .exactJaccardWindowPairs(docs, tau = 0.5, window = 200)
          .agg(count(lit(1)), coalesce(sum(col("jaccard")), lit(0.0))).head()
        val s = (System.nanoTime() - t0) / 1e9
        System.gc()
        (s, res.getLong(0))
      }
      println(f"[jaccardscale] $d docs=$n pairs=${times.head._2} " +
        f"best=${times.map(_._1).min}%.1f s " +
        f"(all: ${times.map(t => f"${t._1}%.1f").mkString("/")}) spin=$spin%.0f")
      spark.stop()
    }
  }
}
