package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** At-scale state measurement for the two B19 shapes with no decade cell
  * (VERDICT r8 item 3): the stream-stream interval join
  * ([[graft.streaming.StreamRunner.purchaseAfterErrorJoin]]) and
  * watermarked dedup ([[graft.streaming.StreamRunner.dedupWithinWatermark]]).
  *
  * Protocol = SessionScaleProbe's: replay a time-ordered multi-file slice
  * of the events table as a genuinely incremental stream (one slice per
  * micro-batch), read per-batch state rows from the progress metrics, and
  * pin correctness per run against the batch form of the same operator —
  * never by collecting data rows to the driver.
  *
  * The claims these cells exist to measure:
  *  - interval join: each side buffers only rows newer than
  *    (watermark − interval), so state is O(rows in the ~2×10-minute
  *    recent horizon), NOT O(stream). Max state rows is printed next to
  *    the total error+purchase row count — the would-be unwatermarked
  *    buffer size.
  *  - dedupWithinWatermark: state holds keys seen within the 30-minute
  *    horizon — ≤ the global distinct key count, never O(events). This
  *    corpus keeps every user active all span, so horizon-keys ≈ all keys:
  *    the WORST case for the bound, same posture as the sessionizer cell.
  *
  * Correctness folds:
  *  - join: time-ordered replay means no row is ever late, so stream ≡
  *    batch exactly — pinned by count + bit_xor(xxhash64(err_id, pur_id)).
  *  - dedup: multi-batch emission may legitimately re-emit a key whose
  *    state the watermark evicted between duplicates (that IS the
  *    operator's contract), so the pin is set-level: emitted keys ≡ the
  *    batch distinct key set (both directions via except().isEmpty over a
  *    parquet spool of the emitted rows), plus emitted-row count between
  *    |keys| and events.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.StreamStateProbe join|dedup tmp/sf100 [heap|rocksdb] [nSlices]"
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("join")
    require(mode == "join" || mode == "dedup", s"mode=$mode; use join|dedup")
    val sfDir = args.lift(1).getOrElse("tmp/sf10")
    val provider = args.lift(2).getOrElse("heap")
    val nSlices = args.lift(3).map(_.toInt).getOrElse(32)
    // recentProgress caps at ~100 entries; the state fold reads it
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
    println(s"[streamstate] mode=$mode sfDir=$sfDir provider=$provider slices=$nSlices")

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val Seq(nEvents, nUsers) =
      ev.agg(count(lit(1)), count_distinct(col("user_id"))).head()
        .toSeq.map(_.asInstanceOf[Long])
    println(s"[streamstate] events=$nEvents distinct_users=$nUsers")

    // time-ordered slice files (the shared TimeSlices protocol, plus the
    // event_id/event_type columns these operators key on)
    val dir = s"/tmp/graft-streamstate-${new java.io.File(sfDir).getName}"
    val filesPerSlice =
      TimeSlices.ensure(spark, ev, nEvents, dir, nSlices, "streamstate")
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", filesPerSlice.toString)
      .parquet(dir)

    mode match {
      case "join" =>
        // batch pin: count + order-insensitive pair fingerprint
        val batchR = graft.streaming.StreamRunner.purchaseAfterErrorJoin(ev)
          .agg(count(lit(1)).as("n"),
            bit_xor(xxhash64(col("err_id"), col("pur_id"))).as("fp")).head()
        val batchN = batchR.getLong(0)
        // bit_xor over zero pairs is NULL (r9 review) — fold to 0, the
        // same identity the stream side's isNullAt guard uses
        val batchFp = if (batchR.isNullAt(1)) 0L else batchR.getLong(1)
        val joinInputs = ev.filter(
          col("event_type").isin("error", "purchase")).count()
        println(s"[streamstate] batch pairs=$batchN " +
          s"fp=$batchFp joinInputRows=$joinInputs")
        System.gc()
        var streamN = 0L; var streamFp = 0L
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamRunner.purchaseAfterErrorJoin(stream)
          .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("err_id"),
              col("pur_id")))).head()
            streamN += r.getLong(0)
            if (!r.isNullAt(1)) streamFp ^= r.getLong(1)
            ()
          }.start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress
        prog.foreach { p =>
          val st = p.stateOperators.headOption
          println(f"[streamstate]   batch ${p.batchId}%3d in=${p.numInputRows}%10d " +
            f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%9d " +
            f"removed=${st.map(_.numRowsRemoved).getOrElse(-1L)}%9d")
        }
        val maxState = prog.flatMap(_.stateOperators.headOption)
          .map(_.numRowsTotal).foldLeft(0L)(math.max)
        println(f"[streamstate] RESULT mode=join provider=$provider wall=$wall%.1f s " +
          s"batches=${prog.map(_.batchId).distinct.length} events=$nEvents " +
          s"joinInputRows=$joinInputs maxStateRows=$maxState " +
          s"streamPairs=$streamN batchPairs=$batchN " +
          s"fpMatch=${streamFp == batchFp && streamN == batchN}")

      case "dedup" =>
        val keys = ev.select("user_id", "event_type").distinct().count()
        println(s"[streamstate] batch distinct keys=$keys")
        System.gc()
        val spool = s"$dir-emitted"
        // drop the spool AND its checkpoint: a leftover committed
        // checkpoint makes the next provider's run consider all input
        // processed and emit nothing (the first rocksdb cell failed this
        // way — empty spool, schema-inference error)
        Seq(spool, s"$spool-ckpt").foreach(TimeSlices.rmTree)
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamRunner.dedupWithinWatermark(stream)
          .filter(col("user_id") >= 0)
          .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
          .format("parquet").option("path", spool)
          .option("checkpointLocation", s"$spool-ckpt")
          .start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress
        prog.foreach { p =>
          val st = p.stateOperators.headOption
          println(f"[streamstate]   batch ${p.batchId}%3d in=${p.numInputRows}%10d " +
            f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%9d " +
            f"removed=${st.map(_.numRowsRemoved).getOrElse(-1L)}%9d")
        }
        val maxState = prog.flatMap(_.stateOperators.headOption)
          .map(_.numRowsTotal).foldLeft(0L)(math.max)
        val emitted = spark.read.parquet(spool)
        val nEmitted = emitted.count()
        val batchKeys = ev.select("user_id", "event_type").distinct()
        val missing = batchKeys.except(emitted).count()
        val phantom = emitted.distinct().except(batchKeys).count()
        println(f"[streamstate] RESULT mode=dedup provider=$provider wall=$wall%.1f s " +
          s"batches=${prog.map(_.batchId).distinct.length} events=$nEvents " +
          s"distinctKeys=$keys maxStateRows=$maxState emittedRows=$nEmitted " +
          s"missingKeys=$missing phantomKeys=$phantom " +
          s"setMatch=${missing == 0 && phantom == 0 && nEmitted >= keys && nEmitted <= nEvents}")
    }
    spark.stop()
  }
}
