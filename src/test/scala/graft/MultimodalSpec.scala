package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Binary-payload plumbing: schema, deterministic stub decode, frame
  * sampling shape (q_multimodal_decode is rows-only in the oracle check).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sfDir))

  test("media table: payload is binary, metadata struct is typed") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("metadata").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "n_bytes", "origin", "tag"))
  }

  test("stub decode: features deterministic, normalized, n_bytes correct") {
    val feats = Multimodal.decodeFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == media.count())
    rows.foreach { f =>
      assert(f.features.length == Multimodal.FakeDecoder.featureDim)
      val s = f.features.map(_.toDouble).sum
      assert(math.abs(s - 1.0) < 1e-3) // histogram fractions sum to ~1
    }
    // deterministic across runs
    val again = Multimodal.decodeFeatures(spark, media).collect()
    assert(rows.sortBy(_.id).zip(again.sortBy(_.id)).forall {
      case (a, b) => a.id == b.id && a.features.sameElements(b.features)
    })
  }

  test("decode matches driver-side recompute for one row") {
    val (id, payload) = media.select("media_id", "payload")
      .orderBy("media_id").first() match {
        case r => (r.getLong(0), r.getAs[Array[Byte]](1))
      }
    val expected = Multimodal.FakeDecoder.decode(id, payload)
    val got = Multimodal.decodeFeatures(spark, media)
      .filter(col("id") === id).first()
    assert(got.n_bytes == expected.n_bytes)
    assert(got.n_frames == expected.n_frames)
    assert(got.features.sameElements(expected.features))
  }

  test("resize: byte decimation by factor, deterministic, schema-stable") {
    val resized = Multimodal.resize(media, factor = 4).toDF("media_id", "payload")
    val sizes = media.select(col("media_id"), octet_length(col("payload")).as("n"))
      .join(resized.select(col("media_id"),
        octet_length(col("payload")).as("rn")), "media_id")
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      val (n, rn) = (r.getInt(1), r.getInt(2))
      assert(rn == (n + 3) / 4, s"media ${r.getLong(0)}: $n -> $rn")
    }
    // resized media feeds the same decode operator
    val feats = Multimodal.decodeFeatures(spark,
      resized.withColumn("metadata",
        struct(lit("application/octet-stream").as("mime"),
          octet_length(col("payload")).as("n_bytes"),
          lit("resized").as("origin"), lit("x").as("tag"))))
    assert(feats.count() == media.count())
  }

  test("frame sampling: stride-2 chunk rows with correct sizes") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val one = frames.filter(col("media_id") === 1)
      .orderBy("frame_no").collect()
    val nBytes = media.filter(col("media_id") === 1)
      .select(octet_length(col("payload"))).first().getInt(0)
    val expectFrames = (0 until math.max((nBytes + 255) / 256, 1) by 2).toSeq
    assert(one.map(_.getInt(1)).toSeq == expectFrames)
    one.foreach { r =>
      val fb = r.getAs[Array[Byte]](2)
      assert(fb.length <= 256 && fb.nonEmpty)
    }
  }
}
