package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.streaming.StreamRunner
import graft.sources.Tables

/** True incremental streaming: the events table split across several
  * files, drained one file per micro-batch (maxFilesPerTrigger=1) — the
  * windowed aggregation over all micro-batches must equal the one-shot
  * batch aggregation over the union.
  */
class IncrementalStreamSpec extends SparkSpec {

  test("multi-micro-batch tumbling aggregation equals the batch result") {
    val dir = "/tmp/graft-stream-multi"
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
    // three files, split by event_id ranges (arrival order != time order
    // within a batch is fine; watermark only drops data later than the
    // 10-minute lateness bound, and ranges keep time roughly monotonic)
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    def writeSplit(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$dir/_tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      var moved = false
      while (part.hasNext) {
        val f = part.next()
        if (f.getFileName.toString.endsWith(".parquet")) {
          Files.createDirectories(Paths.get(dir))
          Files.move(f, Paths.get(dir, s"$name.parquet"))
          moved = true
        }
      }
      assert(moved, s"no parquet part written for $name")
    }
    writeSplit(ev.filter(col("event_id") < n / 3), "f1")
    writeSplit(ev.filter(col("event_id") >= n / 3 && col("event_id") < 2 * n / 3), "f2")
    writeSplit(ev.filter(col("event_id") >= 2 * n / 3), "f3")

    val stream = StreamRunner.runToMemory(spark,
      StreamRunner.tumblingAgg(
        spark.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir)),
      "spec_incremental")
      .orderBy("window_start_us").collect()

    val batch = ev
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("total_value"))
      .orderBy("window_start_us").collect()

    assert(stream.length == batch.length)
    assert(stream.sameElements(batch))
  }
}
