package graft

import org.apache.spark.sql.functions._

/** Fourth-decade measurement for the percentile family (VERDICT r7 item 3):
  * sf1000 was measured for q1/q6/dedup/knn only; `q_percentile`'s last
  * decade was sf100. The family's three shapes run here over the EVENTS
  * table (the per-table sf1000 chain — a real sf1000 lineitem projects to
  * ~110 GB parquet vs this host's free disk, the measured infeasibility
  * BASELINE.md r7 records; q_percentile's operator is column-agnostic, so
  * the events value column exercises identical machinery):
  *
  *  - T=2 continuous percentiles (p50/p95 per event_type) — the
  *    q_percentile operator shape on a different column;
  *  - Ntile.exact k=10 + the bench aggregate — the q_ntile shape
  *    verbatim (adaptive routing included);
  *  - T=9 discrete boundaries + broadcast binning — the q_ntile_approx
  *    shape verbatim.
  *
  * Protocol mirrors Bench: spin marker first, best-of-2 per cell, AQE
  * with data-sized starting partitions. This run also exercises the new
  * Percentiles.exact census gate in anger (few groups — the gate must
  * cost nothing and still force the tiny broadcasts).
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.PercentileDecadeProbe tmp/sf1000"
  */
object PercentileDecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf1000")
    Bench.spinMarkerMs(1000000L)
    val spinMs = Bench.spinMarkerMs()
    // initParts is derived and logged by ProbeSession (recomputing it here
    // would re-walk the whole data directory)
    val spark = ProbeSession.build(sfDir, "graft-pctdecade")
    println(f"[pctdecade] sfDir=$sfDir spin_ms=$spinMs%.0f")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("value"), col("event_id"))
    println(s"[pctdecade] events rows: ${ev.count()}") // warm footers/IO

    def timed(what: String)(body: => Long): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[pctdecade] $what: best ${times.map(_._1).min}%.1f s " +
        f"(runs ${times.map(t => f"${t._1}%.1f").mkString("/")}) -> ${times.head._2}")
      System.gc()
    }

    // q_percentile shape (T=2 continuous) on the events value column
    timed("percentile T=2 (p50/p95 per event_type)") {
      graft.operators.Percentiles.exact(ev, col("event_type"), col("value"),
        Seq("p50" -> 0.5, "p95" -> 0.95)).count()
    }
    // q_ntile shape verbatim (adaptive route + bench aggregate)
    timed("ntile exact k=10 + agg (q_ntile shape)") {
      graft.operators.Ntile.exact(ev, col("event_type"), col("value"),
          col("event_id"), 10, outCol = "decile")
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .count()
    }
    // q_ntile_approx shape verbatim (T=9 discrete + broadcast binning)
    timed("boundaries T=9 + bin (q_ntile_approx shape)") {
      val evn = ev.select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val bounds = graft.operators.Percentiles.exact(
          evn, col("event_type"), col("value"),
          targets = (1 to 9).map(i => (s"bnd$i", i / 10.0)),
          smallFloor = 1000L, discrete = true) // = StatQueries.SmallGroupFloor
        .withColumnRenamed("g", "event_type")
      val decile = (lit(1) +
        (1 to 9).map(i => (col("value") > col(s"bnd$i")).cast("int"))
          .reduce(_ + _)).cast("int")
      evn.join(broadcast(bounds), "event_type")
        .select(col("event_type"), col("value"), decile.as("decile"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"))
        .count()
    }
    spark.stop()
  }
}
