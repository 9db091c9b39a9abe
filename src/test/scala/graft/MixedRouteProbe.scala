package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mixed-route NTILE measurement (VERDICT r7 item 5): NtileSpec pins the
  * windowCap split row-for-row, but no bench cell exercised a genuinely
  * MIXED corpus — millions of small groups plus a few oversized — where
  * the router pays its semi/anti split joins for real. This probe builds
  * one at sf10-like volume and measures, best-of-2 each:
  *
  *  - mixed corpus through the adaptive route (the semi/anti split);
  *  - the small half alone (pure window route — census, no split join);
  *  - the large half alone (pure machinery route — census, no split join);
  *  - mixed with windowCap=0 (machinery everywhere, the r6 shape) as the
  *    what-if-no-routing contrast.
  *
  * mixed vs (small-alone + large-alone) isolates the routing overhead:
  * the anti-join wrapper on the window half is one broadcast pass, while
  * the semi-join wrapper on the machinery half re-executes once per
  * machinery pass (the documented trade at Ntile.scala — the alternative,
  * materializing the oversized half, has a storage cliff at 100 TB).
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.MixedRouteProbe [nSmallGroups] [largeRows]"
  */
object MixedRouteProbe {
  def main(args: Array[String]): Unit = {
    val nSmallGroups = args.headOption.map(_.toLong).getOrElse(3000000L)
    val largeRows = args.drop(1).headOption.map(_.toLong).getOrElse(3300000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(what: String)(body: => Long): Unit = {
      // best-of-2: same estimator as Bench for deterministic work
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[mixedroute] $what: best ${times.map(_._1).min}%.1f s " +
        f"(runs ${times.map(t => f"${t._1}%.1f").mkString("/")}) -> ${times.head._2}")
    }

    // small half: nSmallGroups groups x 10 rows; large half: 3 groups of
    // largeRows (> windowCap=1M default). Hash-derived doubles, unique ids.
    val smallRows = nSmallGroups * 10
    val small = spark.range(smallRows).select(
      (col("id") % nSmallGroups).as("g"),
      (pmod(xxhash64(col("id")), lit(1000000L)) / lit(1000.0)).as("v"),
      col("id").as("id"))
    val large = spark.range(largeRows * 3).select(
      (lit(nSmallGroups) + col("id") % 3).as("g"),
      (pmod(xxhash64(col("id") + smallRows), lit(1000000L)) / lit(1000.0)).as("v"),
      (col("id") + smallRows).as("id"))
    val mixed = small.unionByName(large).localCheckpoint(true)
    val smallCk = small.localCheckpoint(true)
    val largeCk = large.localCheckpoint(true)
    println(s"[mixedroute] small ${smallCk.count()} rows / $nSmallGroups groups, " +
      s"large ${largeCk.count()} rows / 3 groups, mixed ${mixed.count()}")

    val k = 10
    def run(df: org.apache.spark.sql.DataFrame, cap: Long): Long =
      graft.operators.Ntile.exact(df, col("g"), col("v"), col("id"), k,
          outCol = "tile", windowCap = cap)
        .groupBy(col("g"), col("tile")).agg(count(lit(1)))
        .count()

    timed("small half alone (pure window route)")(run(smallCk, 1000000L))
    timed("large half alone (pure machinery route)")(run(largeCk, 1000000L))
    timed("MIXED corpus, adaptive route (semi/anti split)")(run(mixed, 1000000L))
    timed("MIXED corpus, windowCap=0 (machinery everywhere)")(run(mixed, 0L))
    spark.stop()
  }
}
