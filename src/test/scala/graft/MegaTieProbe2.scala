package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for MegaTieProbe's 495 s end-to-end cell. */
object MegaTieProbe2 {
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
      println(f"[megatie2] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val df = spark.range(n).select(lit("m").as("g"), lit(1.0).as("v"),
        (col("id") * 13 + pmod(col("id"), lit(7))).as("id"))
      .localCheckpoint(true)
    timed(s"warm count (n=$n)")(df.count())

    val k = 10
    // the REAL operator knobs (r7 ADVICE: an inlined copy silently
    // measures a stale shape the day Ntile's rank rule changes)
    val delta = graft.operators.Ntile.boundaryDelta
    val accuracy = graft.operators.Ntile.boundaryAccuracy
    val smallFloor = graft.operators.Ntile.boundarySmallFloor(k)
    val rankFor = graft.operators.Ntile.boundaryRankFor(k)
    val base = df.select(struct(col("g")).as("g"), col("v"), col("id"))
    timed("Percentiles.exact bounds (the ntile knobs)") {
      graft.operators.Percentiles.exact(base, col("g"), col("v"),
        targets = (1 to k - 1).map(i => (s"__bv$i", i.toDouble / k)),
        delta = delta, accuracy = accuracy, smallFloor = smallFloor,
        sliceCap = math.max(1000000L, smallFloor),
        discrete = true, rankFor = Some(rankFor))
        .localCheckpoint(true).count()
    }
    spark.stop()
  }
}
