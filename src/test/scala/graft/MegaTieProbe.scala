package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for Ntile.exact's tie-bisection path at mega-tie scale —
  * not a spec. The r7 review removed `repartition(g, v)` on the tied-rows
  * slice (it hash-concentrated a whole tie run into ONE partition, so
  * every bisection round scanned the run single-task) in favor of
  * (g, v, id); this probe measures (a) the full operator on a single
  * constant-valued group far past tieCap — every boundary's tie run is
  * the whole group, so selection MUST bisect — and (b) the two
  * partitioning shapes head-to-head on the materialize + one-round
  * aggregate that the loop repeats.
  * Usage: SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.MegaTieProbe 20000000"
  */
object MegaTieProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[megatie] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    // one group, one value: every NTILE boundary's tie run is all n rows.
    // Non-contiguous ids keep the bisection midpoints irregular.
    val df = spark.range(n).select(lit("m").as("g"), lit(1.0).as("v"),
        (col("id") * 13 + pmod(col("id"), lit(7))).as("id"))
      .localCheckpoint(true)
    timed(s"warm count (n=$n)")(df.count())

    timed("Ntile.exact end-to-end, tieCap=1M (bisection forced)") {
      graft.operators.Ntile.exact(df, col("g"), col("v"), col("id"), 10,
          outCol = "tile", tieCap = 1000000L, windowCap = 0L)
        .groupBy(col("tile")).agg(count(lit(1)).as("cnt"))
        .collect().sortBy(_.getInt(0)).map(r => r.getLong(1)).mkString(",")
    }

    spark.stop()
  }
}
