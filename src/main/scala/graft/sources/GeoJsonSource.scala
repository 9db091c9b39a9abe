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
  * Incremental cursor: the reference URL embeds `since/<timestamp>`
  * (`task.ts:68` — it always passes `-500`, i.e. full state, and CalTopo's
  * server returns only features updated since T otherwise). The same
  * semantics are declared here as a `since` read option applied AT THE
  * FETCH UNIT, before rows ever enter the scan: a negative T is the
  * reference's full-state pull, a non-negative T keeps exactly the
  * features whose `properties.updated >= T` (features without a numeric
  * `updated` stamp cannot prove recency and are excluded, matching a
  * post-hoc `updated >= T` filter's NULL semantics — SourceSinkSpec pins
  * the equivalence). [[graft.Config.stateUrl]] renders the reference URL
  * from the same cursor.
  *
  * Usage: spark.read.format("graft.sources.GeoJsonSource").load(path)
  *   [.option("since", t)].
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
    // fetch retry policy + incremental cursor ride the per-read options
    // (`.option("fetch.maxAttempts", ...)`, `.option("since", t)`)
    () => new GeoJsonScan(paths,
      options.getInt("fetch.maxAttempts", 3),
      options.getLong("fetch.backoffMs", 100L),
      options.getLong("since", -500L),
      // the reference's `verbose: DEBUG` fetch pass-through (task.ts:87);
      // Config.scanOptions renders it from Config.debug
      options.getBoolean("verbose", false))
}

class GeoJsonScan(paths: Seq[String], maxAttempts: Int, backoffMs: Long,
    since: Long, verbose: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = GeoJsonSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p =>
      GeoJsonPartition(p, maxAttempts, backoffMs, since, verbose): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[GeoJsonPartition]
      new GeoJsonReader(p.path, p.maxAttempts, p.backoffMs, p.since, p.verbose)
    }
}

case class GeoJsonPartition(path: String, maxAttempts: Int = 3,
    backoffMs: Long = 100L, since: Long = -500L, verbose: Boolean = false)
  extends InputPartition

/** Parses one FeatureCollection document into feature rows. Accepts either
  * a bare FeatureCollection or the reference's envelope
  * `{result: {state: <FeatureCollection>}}` (`task.ts:71-88`).
  */
class GeoJsonReader(path: String, maxAttempts: Int = 3, backoffMs: Long = 100L,
    since: Long = -500L, verbose: Boolean = false)
  extends PartitionReader[InternalRow] {
  private val features: Iterator[JsonNode] = {
    // the fetch: transport picked by scheme (file, or live HTTP GET for
    // http(s):// fetch units — reference task.ts:70); transient faults
    // (I/O, 5xx) retry in place (Fetch.withRetry), permanent faults (4xx,
    // malformed document) abort the task — reference fetch().typed()
    // semantics split across transport, retry, and decode layers;
    // `verbose` gates per-exchange logging (the reference's
    // `verbose: DEBUG`, task.ts:87)
    val root = Fetch.withRetry(maxAttempts, backoffMs, verbose) {
      val in = DocTransport.forTarget(path).open(path, verbose)
      try new ObjectMapper().readTree(in) finally in.close()
    }
    val fc =
      if (root.has("result")) root.path("result").path("state") else root
    // since/<T> cursor (task.ts:68): negative = full state; otherwise keep
    // features updated at/after T — applied here at the fetch unit, so a
    // downstream scan never sees stale rows
    fc.path("features").elements().asScala.filter { f =>
      since < 0 || {
        val u = f.path("properties").path("updated")
        u.isNumber && u.asLong() >= since
      }
    }
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
