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
    val delta = 0.002
    val accuracy = 2000
    val margin = delta - 1.0 / accuracy
    val smallFloor = math.max(10000L, math.ceil(2 * k / margin).toLong)
    val rankFor: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column = (p, nn) => {
      val i = round(p * k).cast("long")
      val q = (nn / k).cast("long")
      i * q + least(i, nn - q * k)
    }
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
