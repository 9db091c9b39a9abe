package graft

import org.apache.spark.sql.functions._

/** Checkpoint-vs-recompute A/B of the exact-Jaccard truth frame's shingle
  * materialization at scale (VERDICT r10 item 4): the lazy localCheckpoint
  * at [[graft.operators.Dedup.exactJaccardWindowPairs]] keeps the
  * window-function shingle subplan to ONE execution (three consumers) but
  * doubles the ~250 M gram rows' disk footprint at sf100 — the r10 cell
  * spill-filled this host twice before completing at 194 s. The recompute
  * arm (`materialize = false`) trades 2 extra shingle executions for zero
  * checkpoint blocks. This probe measures both arms' wall time AND peak
  * bytes under a dedicated spark.local.dir (checkpoint blocks + shuffle
  * files + spills all land there), interleaved for contention fairness.
  *
  * Usage: sbt "Test/runMain graft.TruthFrameDiskProbe [dir] [runsPerArm]"
  */
object TruthFrameDiskProbe {

  /** Daemon poller: peak total file bytes under `root`, sampled every 2 s.
    * Coarse by design — checkpoint blocks live for seconds-to-minutes, so
    * a 2 s sample cannot miss the steady-state footprint, only sub-sample
    * short-lived shuffle spill churn (both arms are sampled identically).
    */
  private final class PeakDisk(root: java.nio.file.Path) {
    @volatile private var peak = 0L
    @volatile private var stop = false
    private def usage(): Long =
      try {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(p => try java.nio.file.Files.size(p) catch {
            case _: java.io.IOException => 0L // raced with deletion
          }).sum()
        finally s.close()
      } catch { case scala.util.control.NonFatal(_) => 0L }
    private val t = new Thread(() => {
      while (!stop) {
        peak = math.max(peak, usage())
        Thread.sleep(2000)
      }
    })
    t.setDaemon(true)
    t.start()
    def stopAndGet(): Long = { stop = true; math.max(peak, usage()) }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "tmp/sf100"
    val runsPerArm = if (args.length > 1) args(1).toInt else 2
    val localDir = java.nio.file.Files
      .createTempDirectory("graft-truthframe-probe")
    // bench-config session (r11, ProbeSession) + the dedicated local dir
    // the peak-bytes poller watches
    val spark = ProbeSession.build(dir, "graft-truthframe-probe",
      Map("spark.local.dir" -> localDir.toString))
    Bench.spinMarkerMs(1000000L)
    val spin = Bench.spinMarkerMs()
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text"))
    val n = docs.count()
    // interleave arms so host drift hits both equally
    val cells = (1 to runsPerArm).flatMap(_ => Seq(true, false)).map { mat =>
      val disk = new PeakDisk(localDir)
      val t0 = System.nanoTime()
      val res = graft.operators.Dedup
        .exactJaccardWindowPairs(docs, tau = 0.5, window = 200,
          materialize = mat)
        .agg(count(lit(1)), coalesce(sum(col("jaccard")), lit(0.0))).head()
      val s = (System.nanoTime() - t0) / 1e9
      // release this run's checkpoint blocks before measuring the next arm
      System.gc()
      Thread.sleep(2000)
      val peakGb = disk.stopAndGet() / 1e9
      println(f"[truthframe] $dir docs=$n materialize=$mat " +
        f"pairs=${res.getLong(0)} wall=$s%.1f s peak_disk=$peakGb%.1f GB " +
        f"spin=$spin%.0f")
      (mat, s, peakGb)
    }
    Seq(true, false).foreach { mat =>
      val arm = cells.filter(_._1 == mat)
      println(f"[truthframe] SUMMARY $dir materialize=$mat " +
        f"best=${arm.map(_._2).min}%.1f s " +
        f"peak_disk_max=${arm.map(_._3).max}%.1f GB")
    }
    spark.stop()
  }
}
