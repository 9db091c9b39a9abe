package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DSv2 source for GeoJSON FeatureCollection documents (SURVEY.md §2
  * A1): the reference's scan is an HTTP GET of one CalTopo map's state
  * (`/root/reference/task.ts:68-88`); this is the productionized Spark
  * shape — a TableProvider whose partitions are fetch units. Here the fetch
  * unit is either a local file or an http(s) URL (one unit = one
  * InputPartition = one task); [[DocTransport]] dispatches on the scheme,
  * so the same scan reads a directory of documents or a list of live map
  * endpoints.
  *
  * Row shape: (id, feature_type, properties_json, geom_type, geom_coords) —
  * properties stay raw JSON so the strict typed decode (A2,
  * `from_json(featureSchema)`) is a downstream, catalyst-optimizable step,
  * exactly like the reference's envelope-then-`typed()` split.
  *
  * Usage: spark.read.format("graft.sources.GeoJsonSource").load(path).
  */
class GeoJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GeoJsonTable(GeoJsonSource.pathsFrom(properties))
}

object GeoJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("feature_type", StringType),
    StructField("properties_json", StringType),
    StructField("geom_type", StringType),
    StructField("geom_coords", StringType)))

  private[sources] def pathsFrom(props: util.Map[String, String]): Seq[String] = {
    val single = Option(props.get("path")).toSeq
    val multi = Option(props.get("paths")).toSeq.flatMap { js =>
      new ObjectMapper().readTree(js).elements().asScala
        .map(_.asText()).toSeq
    }
    (single ++ multi).distinct
  }
}

class GeoJsonTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"geojson(${paths.mkString(",")})"
  override def schema(): StructType = GeoJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // fetch retry policy rides the per-read options (`.option("fetch.maxAttempts", ...)`)
    () => new GeoJsonScan(paths,
      options.getInt("fetch.maxAttempts", 3),
      options.getLong("fetch.backoffMs", 100L))
}

class GeoJsonScan(paths: Seq[String], maxAttempts: Int, backoffMs: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = GeoJsonSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => GeoJsonPartition(p, maxAttempts, backoffMs): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[GeoJsonPartition]
      new GeoJsonReader(p.path, p.maxAttempts, p.backoffMs)
    }
}

case class GeoJsonPartition(path: String, maxAttempts: Int = 3,
    backoffMs: Long = 100L) extends InputPartition

/** Parses one FeatureCollection document into feature rows. Accepts either
  * a bare FeatureCollection or the reference's envelope
  * `{result: {state: <FeatureCollection>}}` (`task.ts:71-88`).
  */
class GeoJsonReader(path: String, maxAttempts: Int = 3, backoffMs: Long = 100L)
    extends PartitionReader[InternalRow] {
  private val features: Iterator[JsonNode] = {
    // the fetch: transport picked by scheme (file, or live HTTP GET for
    // http(s):// fetch units — reference task.ts:70); transient faults
    // (I/O, 5xx) retry in place (Fetch.withRetry), permanent faults (4xx,
    // malformed document) abort the task — reference fetch().typed()
    // semantics split across transport, retry, and decode layers
    val root = Fetch.withRetry(maxAttempts, backoffMs) {
      val in = DocTransport.forTarget(path).open(path)
      try new ObjectMapper().readTree(in) finally in.close()
    }
    val fc =
      if (root.has("result")) root.path("result").path("state") else root
    fc.path("features").elements().asScala
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!features.hasNext) false
    else {
      val f = features.next()
      def str(n: JsonNode): UTF8String =
        if (n.isMissingNode || n.isNull) null
        else UTF8String.fromString(if (n.isTextual) n.asText() else n.toString)
      val geom = f.path("geometry")
      current = new GenericInternalRow(Array[Any](
        str(f.path("id")),
        str(f.path("type")),
        str(f.path("properties")),
        if (geom.isMissingNode || geom.isNull) null else str(geom.path("type")),
        if (geom.isMissingNode || geom.isNull) null
        else str(geom.path("coordinates"))))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
