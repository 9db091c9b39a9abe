package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade cells for the multimodal codec family (VERDICT r8 item 5) — the
  * one operator family with no at-scale measurement. The registered
  * queries synthesize media IN-QUERY from the documents table
  * ([[graft.operators.Multimodal.imageTable]]/[[graft.operators.Multimodal.audioTable]]
  * encode each doc as a genuine PNG / RIFF-WAVE payload) and decode it
  * back, so a decade cell needs only a documents table at scale — the
  * measurement is pure codec + mapPartitions throughput. Both passes are
  * shuffle-free by construction (ShuffleBudgetSpec pins
  * q_multimodal_decode/q_multimodal_audio at 1 Exchange — the output
  * sort), so the expectation to verify is embarrassingly-parallel LINEAR
  * scaling across decades.
  *
  * Protocol = Bench's: spin marker first, noop-write forcing, best-of-2
  * per cell. The ORDER BY in the registered queries is dropped here (it
  * is presentation-only; keeping the probe shuffle-free isolates the
  * codec cost the cell exists to measure — the plain decode pipelines).
  *
  * Usage: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.MultimodalScaleProbe tmp/sf10 [runs]"
  */
object MultimodalScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf10")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.spinMarkerMs(1000000L)
    val spin = Bench.spinMarkerMs()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val nDocs = docs.count() // also warms the parquet footers/page cache
    // coalesce: sum() over an empty table returns NULL and getLong NPEs
    // (ADVICE r9 — same empty-input pattern fixed in Percentiles r9)
    val totalChars =
      docs.agg(coalesce(sum(length(col("text"))), lit(0L))).head().getLong(0)
    println(f"[mmscale] sfDir=$sfDir docs=$nDocs chars=$totalChars spin=$spin%.0f ms")

    def cell(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        System.gc()
        s
      }
      val best = times.min
      println(f"[mmscale] CELL $name sf=$sfDir docs=$nDocs best=$best%.1f s " +
        f"(all: ${times.map(t => f"$t%.1f").mkString("/")}) " +
        f"docs_per_s=${nDocs / best}%.0f")
    }

    cell("decode_image") {
      graft.operators.Multimodal.decodeImages(spark,
        graft.operators.Multimodal.imageTable(docs)).toDF()
    }
    cell("decode_audio") {
      graft.operators.Multimodal.decodeAudio(spark,
        graft.operators.Multimodal.audioTable(docs)).toDF()
    }
    cell("frames") {
      graft.operators.Multimodal.sampleFrames(
        graft.operators.Multimodal.mediaTable(docs), stride = 2)
        .select(col("media_id"), col("frame_no"),
          md5(col("frame_bytes")).as("frame_md5"))
    }
    spark.stop()
  }
}
