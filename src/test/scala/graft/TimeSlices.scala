package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The time-ordered slice-replay builder shared by the streaming scale
  * probes (SessionScaleProbe, StreamStateProbe — r9 review: the ~50-line
  * protocol had been duplicated wholesale, and protocol fixes must land
  * in every probe at once).
  *
  * Writes `ev` (any column set that includes a `ts` timestamp) into `dir`
  * as quantile-cut time ranges written sequentially, so file mod-time
  * order == event-time order (the FileStreamSource replay order), then
  * appends one far-future sentinel row (every LongType column −1, ts =
  * max + 1 day) that advances the watermark past every real row so the
  * tail flushes/evicts. Reuses an existing slice dir when its
  * non-sentinel row count matches. Returns maxFilesPerTrigger for a
  * one-slice-per-micro-batch replay.
  */
object TimeSlices {

  def rmTree(d: String): Unit = {
    val f = new java.io.File(d)
    if (f.exists()) {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(f)
    }
  }

  /** @param sentinelKey the LongType column the reuse check filters with
    *   `>= 0` to exclude the sentinel row (ADVICE r9: this was a
    *   hard-coded `user_id` — an implicit contract a caller without that
    *   column would fail on). NOTE the sentinel row sets EVERY LongType
    *   column (not just this one) to −1, so no keyed Long column can
    *   collide with real data; a caller whose Long columns legitimately
    *   hold −1 must not use this protocol.
    * @return files per micro-batch, ceiling-divided so the replay takes at
    *   most nSlices micro-batches (ADVICE r9: floor division could reach
    *   ~2× nSlices batches when part files don't divide evenly, silently
    *   truncating recentProgress's ~100-entry state fold). */
  def ensure(spark: SparkSession, ev: DataFrame, nEvents: Long,
      dir: String, nSlices: Int, tag: String,
      sentinelKey: String = "user_id"): Int = {
    require(ev.schema.fields.exists(f =>
        f.name == sentinelKey && f.dataType == LongType),
      s"sentinelKey=$sentinelKey must be a LongType column of ev")
    val existing = new java.io.File(dir).exists() &&
      (try spark.read.parquet(dir).filter(col(sentinelKey) >= 0).count() == nEvents
       catch { case scala.util.control.NonFatal(_) => false })
    if (existing)
      println(s"[$tag] reusing slices in $dir")
    else {
      rmTree(dir)
      val t = unix_micros(col("ts"))
      // slice cuts need no exactness (any time partition replays
      // correctly); epsilon 0 at 1e8+ rows degenerates into an exact
      // all-distinct sketch — 1e-3 cuts the build from >12 min to seconds
      val qs = ev.select(t.as("t"))
        .stat.approxQuantile("t",
          (1 until nSlices).map(_.toDouble / nSlices).toArray, 0.001)
      val preds = (Option(Long.MinValue) +: qs.map(q => Option(q.toLong)))
        .zip(qs.map(q => Option(q.toLong)) :+ Option(Long.MaxValue))
        .map { case (lo, hi) => t >= lit(lo.get) && t < lit(hi.get) }
      preds.foreach { pred =>
        ev.filter(pred).write.mode("append").parquet(dir)
      }
      val wrote = spark.read.parquet(dir).count()
      require(wrote == nEvents, s"slice partition lost rows: $wrote vs $nEvents")
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinel = ev.schema.fields.foldLeft(ev.limit(1)) { (df, f) =>
        if (f.dataType == LongType) df.withColumn(f.name, lit(-1L)) else df
      }.withColumn("ts",
        lit(new java.sql.Timestamp(maxTs.getTime + 86400000L)))
      sentinel.coalesce(1).write.mode("append").parquet(dir)
      println(s"[$tag] sliced into $dir")
      System.gc() // let the ContextCleaner drop the slice job's shuffles
    }
    val nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // per-slice writes keep their natural task parallelism, so file
    // counts can differ per slice; if they don't divide evenly, a
    // micro-batch can end mid-slice and watermark-drop the remainder as
    // late — the probes' fp/set pins turn that into a VISIBLE failed
    // cell, but name the hazard here so a red pin on a healthy operator
    // points at replay alignment first
    if (nFiles % nSlices != 0)
      System.err.println(s"[$tag] WARNING: $nFiles part files not " +
        s"divisible by $nSlices slices — batch boundaries may drift off " +
        "slice boundaries; a failed correctness pin may be replay " +
        "lateness, not the operator")
    // ceiling division: batches = ceil(nFiles / filesPerTrigger) ≤ nSlices
    math.max(1, (nFiles + nSlices - 1) / nSlices)
  }
}
