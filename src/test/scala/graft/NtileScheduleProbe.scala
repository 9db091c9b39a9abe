package graft

import org.apache.spark.sql.functions._

/** Fourth-decade residual attribution + accuracy-schedule A/B for the
  * percentile/ntile family (VERDICT r8 item 7). The ×9.0–9.3/decade cells
  * at sf1000 need two answers:
  *
  *  1. ATTRIBUTION — with `-Dgraft.percentiles.trace=true` the operator
  *     prints each eager pass's wall time (sketch agg, exact-rank probe,
  *     subset materialization, per-bisection-round) so the residual splits
  *     into "linear scans" vs "refinement depth" from the measurement
  *     itself, not from guessing.
  *
  *  2. SCHEDULE A/B — the q_ntile_approx boundary shape (T=9 discrete +
  *     broadcast binning) at three (delta, accuracy) schedules:
  *       default  δ=0.002,  acc=2000 — the shipped knobs;
  *       coarse   δ=0.008,  acc=500  — cheaper sketch, wider brackets
  *                                     (forces bisection at this n);
  *       fine     δ=0.0005, acc=8000 — costlier sketch, 4× narrower
  *                                     brackets (smaller probe subsets and
  *                                     final collects on 10× denser groups).
  *     The hypothesis the judge asked to test: on denser groups a schedule
  *     sized to n (fixed absolute bracket width) beats the fixed default.
  *
  * Protocol mirrors PercentileDecadeProbe: spin marker, best-of-2 per
  * cell, AQE with data-sized starting partitions.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.NtileScheduleProbe tmp/sf1000"
  */
object NtileScheduleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf1000")
    System.setProperty("graft.percentiles.trace", "true")
    Bench.spinMarkerMs(1000000L)
    val spinMs = Bench.spinMarkerMs()
    // initParts is derived and logged by ProbeSession (recomputing it here
    // would re-walk the whole data directory)
    val spark = ProbeSession.build(sfDir, "graft-ntilesched")
    println(f"[ntilesched] sfDir=$sfDir spin_ms=$spinMs%.0f")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    println(s"[ntilesched] events rows: ${ev.count()}") // warm footers/IO

    def binShape(delta: Double, accuracy: Int): Long = {
      val bounds = graft.operators.Percentiles.exact(
          ev, col("event_type"), col("value"),
          targets = (1 to 9).map(i => (s"bnd$i", i / 10.0)),
          delta = delta, accuracy = accuracy,
          smallFloor = 1000L, discrete = true)
        .withColumnRenamed("g", "event_type")
      val decile = (lit(1) +
        (1 to 9).map(i => (col("value") > col(s"bnd$i")).cast("int"))
          .reduce(_ + _)).cast("int")
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"), decile.as("decile"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"))
        .count()
    }

    for ((name, d, a) <- Seq(("default", 0.002, 2000),
                             ("coarse", 0.008, 500),
                             ("fine", 0.0005, 8000))) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = binShape(d, a)
        val s = (System.nanoTime() - t0) / 1e9
        System.gc()
        (s, r)
      }
      println(f"[ntilesched] CELL schedule=$name delta=$d accuracy=$a " +
        f"best=${times.map(_._1).min}%.1f s " +
        f"(runs ${times.map(t => f"${t._1}%.1f").mkString("/")}) " +
        s"rows=${times.head._2}")
    }
    spark.stop()
  }
}
