package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for Ntile.exact at scale — not a spec.
  * Attributes the exact-vs-approx gap (VERDICT r6 item 2's "within ~2×"
  * target) to stages: the shared Percentiles.exact boundary machinery,
  * the count/tie aggregate pass, the tie-id selection, and the final
  * broadcast binning, each timed over the same events table.
  * Usage: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.NtileProbe tmp/sf10"
  */
object NtileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ntileprobe] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("value"), col("event_id"))
    timed("warm scan count")(ev.filter(col("value").isNotNull).count())

    // the shared boundary machinery, at the same knobs Ntile.exact uses
    val k = 10
    // the REAL operator knobs (r7 ADVICE — this probe's inlined
    // smallFloor had ALREADY drifted: ceil(2k/delta)=10000 vs the
    // operator's ceil(2k/margin)=13334)
    val delta = graft.operators.Ntile.boundaryDelta
    // accuracy must ride along: smallFloor is DERIVED from it, and
    // pairing the operator's smallFloor with Percentiles' independent
    // default accuracy is a mixed shape the day either knob moves
    val accuracy = graft.operators.Ntile.boundaryAccuracy
    val smallFloor = graft.operators.Ntile.boundarySmallFloor(k)
    val rankFor = graft.operators.Ntile.boundaryRankFor(k)
    val base = ev.select(col("event_type").as("g"),
        col("value").cast("double").as("v"), col("event_id").cast("long").as("id"))
      .filter(col("v").isNotNull)
    var boundsDf: org.apache.spark.sql.DataFrame = null
    timed("percentiles.exact bounds (ntile ranks)") {
      boundsDf = graft.operators.Percentiles.exact(base, col("g"), col("v"),
        targets = (1 to k - 1).map(i => (s"__bv$i", i.toDouble / k)),
        delta = delta, accuracy = accuracy, smallFloor = smallFloor,
        sliceCap = math.max(1000000L, smallFloor),
        discrete = true, rankFor = Some(rankFor)).localCheckpoint(true)
      boundsDf.count()
    }
    timed("percentiles.exact bounds (2nd call, warm)") {
      graft.operators.Percentiles.exact(base, col("g"), col("v"),
        targets = (1 to k - 1).map(i => (s"__bv$i", i.toDouble / k)),
        delta = delta, accuracy = accuracy, smallFloor = smallFloor,
        sliceCap = math.max(1000000L, smallFloor),
        discrete = true, rankFor = Some(rankFor)).localCheckpoint(true).count()
    }

    // stage-by-stage replica of Ntile.exact's body over the checkpointed
    // bounds, so each job's cost is visible separately
    timed("counted pass (37 aggs)") {
      val aggs = Seq(count(lit(1)).as("n")) ++ (1 to k - 1).flatMap { i =>
        Seq(
          sum(when(col("v") < col(s"__bv$i"), 1L).otherwise(0L)).as(s"__below$i"),
          sum(when(col("v") === col(s"__bv$i"), 1L).otherwise(0L)).as(s"__m$i"),
          min(when(col("v") === col(s"__bv$i"), col("id"))).as(s"__idlo$i"),
          max(when(col("v") === col(s"__bv$i"), col("id"))).as(s"__idhi$i"))
      }
      base.join(broadcast(boundsDf), "g")
        .groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
        .localCheckpoint(true).count()
    }
    timed("tiedRows scan + collect") {
      val bvCols = (1 to k - 1).map(i => col(s"__bv$i"))
      base.join(broadcast(boundsDf), "g")
        .filter(bvCols.map(col("v") === _).reduce(_ || _))
        .groupBy(col("g"), col("v"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .localCheckpoint(true).count()
    }

    // full operator, then the caller-side aggregate — the bench shape
    timed("Ntile.exact end-to-end + agg") {
      graft.operators.Ntile.exact(ev, col("event_type"), col("value"),
          col("event_id"), k, outCol = "decile")
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"))
        .count()
    }
    timed("Ntile.exact end-to-end + agg (2nd, warm)") {
      graft.operators.Ntile.exact(ev, col("event_type"), col("value"),
          col("event_id"), k, outCol = "decile")
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"))
        .count()
    }

    // isolate Percentiles.exact's internal passes: the sketch aggregate at
    // two accuracies, and pass 2's long (×T row amplification) vs wide
    // (one groupBy, 2T conditional aggs) probe shapes
    val pcts = (1 to 9).flatMap(i =>
      Seq(i / 10.0 - delta, i / 10.0 + delta)).map(p =>
      math.min(1.0, math.max(0.0, p)))
    for (acc <- Seq(10000, 2000, 1000)) {
      timed(s"sketch pass, accuracy=$acc") {
        base.groupBy(col("g")).agg(
          count(lit(1)).as("n"), min(col("v")), max(col("v")),
          percentile_approx(col("v"), array(pcts.map(lit): _*), lit(acc)))
          .localCheckpoint(true).count()
      }
    }
    val st0 = base.groupBy(col("g")).agg(count(lit(1)).as("n"),
        percentile_approx(col("v"), array(pcts.map(lit): _*), lit(10000))
          .as("qs"))
      .select(col("g"), explode(array((0 until 9).map(i =>
        struct(lit(s"t$i").as("t"),
          element_at(col("qs"), i * 2 + 1).as("lo"),
          element_at(col("qs"), i * 2 + 2).as("hi"))): _*)).as("b"))
      .select(col("g"), col("b.t").as("t"), col("b.lo").as("lo"),
        col("b.hi").as("hi"))
      .localCheckpoint(true)
    timed("probe pass, long shape (x9 join + groupBy(g,t))") {
      base.join(broadcast(st0), "g")
        .groupBy(col("g"), col("t"))
        .agg(sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("below"),
          sum(when(col("v").between(col("lo"), col("hi")), 1L).otherwise(0L))
            .as("cnt"))
        .localCheckpoint(true).count()
    }
    timed("probe pass, wide shape (1:1 join + 2T aggs)") {
      val wideCols = (0 until 9).flatMap(i => Seq(
        first(when(col("t") === s"t$i", col("lo"))).as(s"lo$i"),
        first(when(col("t") === s"t$i", col("hi"))).as(s"hi$i")))
      val wide = st0.groupBy(col("g")).agg(wideCols.head, wideCols.tail: _*)
      val aggs = (0 until 9).flatMap(i => Seq(
        sum(when(col("v") < col(s"lo$i"), 1L).otherwise(0L)).as(s"below$i"),
        sum(when(col("v").between(col(s"lo$i"), col(s"hi$i")), 1L)
          .otherwise(0L)).as(s"cnt$i")))
      base.join(broadcast(wide), "g")
        .groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
        .localCheckpoint(true).count()
    }

    // the approx sibling's shape for reference
    timed("approx sibling end-to-end + agg") {
      val e2 = ev.select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val b2 = graft.operators.Percentiles.exact(e2, col("event_type"),
          col("value"), targets = (1 to 9).map(i => (s"bnd$i", i / 10.0)),
          smallFloor = 10000L, discrete = true)
        .withColumnRenamed("g", "event_type")
      val decile = (lit(1) + (1 to 9).map(i =>
        (col("value") > col(s"bnd$i")).cast("int")).reduce(_ + _)).cast("int")
      e2.join(broadcast(b2), "event_type")
        .groupBy(col("event_type"), decile.as("decile"))
        .agg(count(lit(1)).as("n"))
        .count()
    }
    spark.stop()
  }
}
