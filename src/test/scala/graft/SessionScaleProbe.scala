package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** At-scale measurement for [[graft.streaming.StreamRunner.sessionizeOpenTail]]
  * (the r8 production sessionizer): replay a time-ordered multi-file events
  * table as a genuinely incremental stream and record, per micro-batch, the
  * state-store row count the EventTimeTimeout handler actually keeps.
  *
  * The contrast this exists to measure: the session_window AGGREGATE keeps
  * every in-allowance session in state (~one entry per event at this
  * corpus's 10-minute-gap density — the heap store served 1e8 entries and
  * OOM'd an 80 GB heap at 3e8, BASELINE.md r7), while the open-tail
  * handler keeps only OPEN islands per user and emits the moment the
  * watermark passes last + gap. Replayed in event-time order, its state
  * must track ACTIVE USERS in the gap horizon, not events — the probe
  * prints max(numRowsTotal) next to total events and distinct users so the
  * bound is a measured number, not scaladoc prose.
  *
  * Correctness at scale rides along: emitted sessions are folded through
  * count + bit_xor(xxhash64(user, start, n)) per batch (no driver-side
  * row collection) and compared against the batch session_window result's
  * same fingerprint — plus a far-future sentinel user (as StreamingSpec)
  * so the tail sessions flush; the sentinel's own open island is the one
  * row allowed to remain in state.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.SessionScaleProbe tmp/sf100 [heap|rocksdb] [nSlices]"
  */
object SessionScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf10")
    val provider = args.lift(1).getOrElse("heap")
    val nSlices = args.lift(2).map(_.toInt).getOrElse(8)
    // the RESULT line folds max state over q.recentProgress, which Spark
    // caps at ~100 entries — more slices than that would silently drop
    // the earliest batches from the fold and under-state the bound
    require(nSlices <= 64, s"nSlices=$nSlices would overflow recentProgress")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = (provider match {
      case "rocksdb" => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      case "heap" => builder
      case other => sys.error(s"provider=$other; use heap|rocksdb")
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[sessionscale] sfDir=$sfDir provider=$provider slices=$nSlices")

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
    val Seq(nEvents, nUsers) =
      ev.agg(count(lit(1)), count_distinct(col("user_id"))).head()
        .toSeq.map(_.asInstanceOf[Long])
    println(s"[sessionscale] events=$nEvents distinct_users=$nUsers")

    // time-ordered slice files via the shared TimeSlices protocol (r9:
    // the builder was extracted so protocol fixes land in every probe);
    // each slice keeps its natural write parallelism and
    // maxFilesPerTrigger is sized to one slice per batch
    val dir = s"/tmp/graft-sessionscale-${new java.io.File(sfDir).getName}"
    val filesPerSlice =
      TimeSlices.ensure(spark, ev, nEvents, dir, nSlices, "sessionscale")

    // batch fingerprint to pin the stream against (session_window agg —
    // the oracle-checked q_stream_session shape)
    val batchFp = graft.streaming.StreamRunner.sessionAgg(ev)
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("user_id"), col("session_start_us"),
          col("n_events"))).as("fp"))
      .head()
    println(s"[sessionscale] batch sessions=${batchFp.getLong(0)} fp=${batchFp.getLong(1)}")
    // the fingerprint's session shuffle is ~event-scale on this corpus
    // (avg 1.015 events/session); nudge the ContextCleaner so its shuffle
    // files are deleted before the stream adds its own per-batch shuffles
    // (the first sf1000 attempt hit ENOSPC with both on disk at once)
    System.gc()
    Thread.sleep(3000)

    var streamN = 0L
    var streamFp = 0L
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", filesPerSlice.toString)
      .parquet(dir)
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamRunner.sessionizeOpenTail(spark, stream)
      .filter(col("user_id") >= 0)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("user_id"),
          col("session_start_us"), col("n_events")))).head()
        streamN += r.getLong(0)
        if (!r.isNullAt(1)) streamFp ^= r.getLong(1)
        ()
      }
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress
    prog.foreach { p =>
      val st = p.stateOperators.headOption
      println(f"[sessionscale]   batch ${p.batchId}%3d in=${p.numInputRows}%10d " +
        f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%9d " +
        f"updated=${st.map(_.numRowsUpdated).getOrElse(-1L)}%9d " +
        f"removed=${st.map(_.numRowsRemoved).getOrElse(-1L)}%9d")
    }
    val maxState = prog.flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      .foldLeft(0L)(math.max)
    println(f"[sessionscale] RESULT provider=$provider wall=$wall%.1f s " +
      s"batches=${prog.map(_.batchId).distinct.length} " +
      s"events=$nEvents users=$nUsers maxStateRows=$maxState " +
      s"streamSessions=$streamN batchSessions=${batchFp.getLong(0)} " +
      s"fpMatch=${streamFp == batchFp.getLong(1) && streamN == batchFp.getLong(0)}")
    spark.stop()
  }
}
