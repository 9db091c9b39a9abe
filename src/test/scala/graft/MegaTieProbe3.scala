package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer stage attribution for the post-fix Percentiles.exact cost on a
  * constant-valued 20M-row group (MegaTieProbe2 measured 50 s end-to-end
  * after the collapsed-bracket fix; sketch+probe should be ~10 s).
  */
object MegaTieProbe3 {
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
      println(f"[megatie3] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val df = spark.range(n).select(lit("m").as("g"), lit(1.0).as("v"),
        (col("id") * 13 + pmod(col("id"), lit(7))).as("id"))
      .localCheckpoint(true)
    timed(s"warm count (n=$n)")(df.count())

    val base = df.select(struct(col("g")).as("g"), col("v").as("v"))
      .filter(col("v").isNotNull)
    val k = 10
    // the REAL operator knobs (r7 ADVICE — no inlined copies)
    val delta = graft.operators.Ntile.boundaryDelta
    val accuracy = graft.operators.Ntile.boundaryAccuracy
    val pcts = (1 to k - 1).flatMap { i =>
      val p = i.toDouble / k
      Seq(math.max(0.0, p - delta), math.min(1.0, p + delta))
    }

    // stage A: the pass-1 sketch aggregate alone
    val br = timed("pass1 sketch agg (percentile_approx x18, acc=2000)") {
      val b = base.groupBy(col("g")).agg(
          count(lit(1)).as("n"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"),
          percentile_approx(col("v"), array(pcts.map(lit): _*), lit(accuracy))
            .as("qs"))
        .localCheckpoint(true)
      b.count(); b
    }

    // stage B: the pass-2 probe aggregate alone (2T conditional sums)
    timed("pass2 probe agg (18 conditional sums over wide row)") {
      val probeAggs = (0 until k - 1).flatMap { i =>
        Seq(
          sum(when(col("v") < element_at(col("qs"), i * 2 + 1), 1L)
            .otherwise(0L)).as(s"__below$i"),
          sum(when(col("v").between(element_at(col("qs"), i * 2 + 1),
            element_at(col("qs"), i * 2 + 2)), 1L).otherwise(0L))
            .as(s"__cnt$i"))
      }
      base.join(broadcast(br), "g")
        .groupBy(col("g")).agg(probeAggs.head, probeAggs.tail: _*)
        .localCheckpoint(true).count()
    }

    // stage C: full operator for reference
    timed("Percentiles.exact full (post-fix)") {
      val rankFor = graft.operators.Ntile.boundaryRankFor(k)
      graft.operators.Percentiles.exact(
        df.select(col("g"), col("v")), col("g"), col("v"),
        targets = (1 to k - 1).map(i => (s"__bv$i", i.toDouble / k)),
        delta = delta, accuracy = accuracy,
        smallFloor = graft.operators.Ntile.boundarySmallFloor(k),
        sliceCap = 1000000L, discrete = true, rankFor = Some(rankFor))
        .localCheckpoint(true).count()
    }
    spark.stop()
  }
}
