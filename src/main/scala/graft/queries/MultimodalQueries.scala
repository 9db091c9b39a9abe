package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** SURVEY.md §2 B23 — the multimodal operator surface over the binary
  * payload table ([[graft.operators.Multimodal.mediaTable]]). The corpus text is ASCII, so
  * byte offsets == char offsets and the frame-sampling oracle can mirror
  * the binary slicing with plain substr + md5.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // Frame sampling: every 2nd 256-byte chunk, md5 per frame.
    Q("q_multimodal_frames",
      """WITH m AS (
  SELECT doc_id AS media_id, text,
    greatest(CAST(ceil(octet_length(encode(text)) / 256.0) AS INT), 1) AS n_frames
  FROM documents)
SELECT media_id, CAST(u.frame_no AS INT) AS frame_no, md5(substr(text, u.frame_no * 256 + 1, 256)) AS frame_md5
FROM m, UNNEST(range(0, n_frames, 2)) AS u(frame_no)
ORDER BY media_id, frame_no""") { (s, d) =>
      Multimodal.sampleFrames(
          Multimodal.mediaTable(Tables.documents(s, d)), stride = 2)
        .select(col("media_id"), col("frame_no"),
          md5(col("frame_bytes")).as("frame_md5"))
        .orderBy("media_id", "frame_no")
    },

    // Stubbed decode via mapPartitions (typed Dataset path) — deterministic
    // byte-histogram features; not SQL-replicable batch-for-batch, so
    // rows-only here and value-pinned in MultimodalSpec.
    Q.noOracle("q_multimodal_decode") { (s, d) =>
      Multimodal.decodeFeatures(s,
          Multimodal.mediaTable(Tables.documents(s, d)))
        .toDF()
        .select(col("id"), col("n_bytes"), col("n_frames"),
          element_at(col("features"), 1).as("f0"))
        .orderBy("id")
    }
  )
}
