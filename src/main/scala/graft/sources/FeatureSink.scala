package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch sink (SURVEY.md §2 A14): the reference POSTs the transformed
  * FeatureCollection to the CloudTAK ETL API in one `submit()` call
  * (`/root/reference/task.ts:154-159`). The Spark shape is
  * foreachPartition: each partition serializes its rows into one
  * FeatureCollection document and delivers it — so delivery parallelism ==
  * partition count and nothing funnels through the driver. The transport
  * is pluggable; the default writes files (an HTTP POST swaps `deliver`,
  * nothing else).
  */
object FeatureSink {

  /** Serialize every row of `df` (struct-per-row -> GeoJSON Feature JSON)
    * and deliver one FeatureCollection document per partition into
    * `outDir`. Returns nothing driver-side except Spark's job result — no
    * collect().
    */
  /** `prefix` scopes the delivery (e.g. a streaming micro-batch id) so
    * successive submits into one directory never collide on partition ids.
    */
  def submit(df: DataFrame, outDir: String, prefix: String = "featurecollection"): Unit = {
    Files.createDirectories(Paths.get(outDir))
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("feature"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val body = rows.map(_.getString(0))
            .mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
          deliver(outDir, prefix, TaskContext.getPartitionId(), body)
        }
      }
  }

  /** Transport: one document per partition. File-backed here; an HTTP
    * implementation POSTs `body` instead.
    */
  private def deliver(outDir: String, prefix: String, partitionId: Int,
      body: String): Unit =
    Files.write(
      Paths.get(outDir, f"$prefix-$partitionId%05d.json"),
      body.getBytes(StandardCharsets.UTF_8))
}
