package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates MegaTieProbe3's 23 s probe-pass anomaly (20M rows, 18
  * conditional sums over a broadcast-joined sketch row): join cost vs
  * aggregate-expression cost vs codegen fallback.
  */
object MegaTieProbe4 {
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
      println(f"[megatie4] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val df = spark.range(n).select(lit("m").as("g"), lit(1.0).as("v"))
      .localCheckpoint(true)
    timed(s"warm count (n=$n)")(df.count())
    val base = df.select(struct(col("g")).as("g"), col("v"))
    val k = 10
    // the REAL operator knobs (r7 ADVICE — no inlined copies)
    val delta = graft.operators.Ntile.boundaryDelta
    val accuracy = graft.operators.Ntile.boundaryAccuracy
    val pcts = (1 to k - 1).flatMap { i =>
      val p = i.toDouble / k
      Seq(math.max(0.0, p - delta), math.min(1.0, p + delta))
    }
    val br = base.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        percentile_approx(col("v"), array(pcts.map(lit): _*), lit(accuracy))
          .as("qs"))
      .localCheckpoint(true)
    br.count()

    // A: join + one plain sum — isolates join/materialization cost
    timed("A join + single sum") {
      base.join(broadcast(br), "g").groupBy(col("g"))
        .agg(sum(col("v")).as("s")).localCheckpoint(true).count()
    }
    // B: join + 18 element_at conditional sums (the real probe shape)
    val aggsB = (0 until k - 1).flatMap { i =>
      Seq(
        sum(when(col("v") < element_at(col("qs"), i * 2 + 1), 1L)
          .otherwise(0L)).as(s"__below$i"),
        sum(when(col("v").between(element_at(col("qs"), i * 2 + 1),
          element_at(col("qs"), i * 2 + 2)), 1L).otherwise(0L))
          .as(s"__cnt$i"))
    }
    timed("B join + 18 element_at conditional sums (probe shape)") {
      base.join(broadcast(br), "g").groupBy(col("g"))
        .agg(aggsB.head, aggsB.tail: _*).localCheckpoint(true).count()
    }
    // C: project the 18 bounds to scalar columns first, then plain sums
    val proj = (0 until k - 1).flatMap { i =>
      Seq(element_at(col("qs"), i * 2 + 1).as(s"lo$i"),
        element_at(col("qs"), i * 2 + 2).as(s"hi$i"))
    }
    val aggsC = (0 until k - 1).flatMap { i =>
      Seq(
        sum(when(col("v") < col(s"lo$i"), 1L).otherwise(0L)).as(s"__below$i"),
        sum(when(col("v").between(col(s"lo$i"), col(s"hi$i")), 1L)
          .otherwise(0L)).as(s"__cnt$i"))
    }
    timed("C join + scalar-projected bounds + 18 sums") {
      base.join(broadcast(br), "g")
        .select(Seq(col("g"), col("v")) ++ proj.map(c => c): _*)
        .groupBy(col("g"))
        .agg(aggsC.head, aggsC.tail: _*).localCheckpoint(true).count()
    }
    // D: no join at all — sums against literal bounds
    val aggsD = (0 until k - 1).flatMap { i =>
      Seq(
        sum(when(col("v") < lit(1.0), 1L).otherwise(0L)).as(s"__below$i"),
        sum(when(col("v").between(lit(1.0), lit(1.0)), 1L).otherwise(0L))
          .as(s"__cnt$i"))
    }
    timed("D no join, 18 sums on literal bounds") {
      base.groupBy(col("g")).agg(aggsD.head, aggsD.tail: _*)
        .localCheckpoint(true).count()
    }
    // codegen audit of shape B: does the agg stay inside WholeStageCodegen?
    val planB = base.join(broadcast(br), "g").groupBy(col("g"))
      .agg(aggsB.head, aggsB.tail: _*)
      .queryExecution.executedPlan.toString
    println("[megatie4] B plan (first 40 lines):")
    planB.linesIterator.take(40).foreach(l => println("[megatie4]   " + l))
    spark.stop()
  }
}
