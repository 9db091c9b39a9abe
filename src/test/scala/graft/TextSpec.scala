package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Corpus assumptions that q_dedup_ngram_jaccard's hashed-gram equivalence
  * relies on (single-space separation, lowercase, no sub-shingle docs), and
  * the gram-hash/string-gram 1-1 property itself.
  */
class TextSpec extends SparkSpec {

  test("documents corpus: single-space separated, lowercase, >= 3 words") {
    val bad = Tables.documents(spark, sfDir)
      .filter(col("text").contains("  ") ||
        col("text").startsWith(" ") || col("text").endsWith(" ") ||
        col("text") =!= lower(col("text")) ||
        size(split(col("text"), " ")) < 3)
      .count()
    assert(bad == 0)
  }

  test("chunking boundaries: 1 word, exactly chunkSize, chunkSize+1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "solo"),
      (2L, (1 to 32).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 33).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.queries.TextQueries.chunk(docs, chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // 1 word -> one chunk of 1; windows start at every multiple of the
    // stride below n (same formula as the oracle), so 32 words emit the
    // full chunk plus the 8-word tail window at 25, and 33 words the
    // 9-word tail
    assert(got.toSeq == Seq((1L, 0L, 1), (2L, 0L, 32), (2L, 1L, 8),
      (3L, 0L, 32), (3L, 1L, 9)))
  }

  test("chunking covers every word: overlapped chunks reconstruct the document") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = graft.queries.TextQueries.chunk(docs, chunkSize = 32, stride = 24)
      .orderBy("chunk_id").collect()
    // consecutive chunks overlap by chunkSize - stride = 8 words; dropping
    // the overlap from each non-first chunk must rebuild the doc exactly
    val rebuilt = chunks.head.getString(2) +: chunks.tail.map(
      _.getString(2).split(" ").drop(8).mkString(" "))
    // a tail window shorter than the overlap contributes nothing new
    assert(rebuilt.filter(_.nonEmpty).mkString(" ") ==
      docs.first().getString(1))
  }

  test("gram-hash sets have the same sizes as string trigram sets") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
    val hashed = Dedup.gramHashSets(docs)
      .select(col("id"), size(col("g")).as("n"))
    val strings = docs
      .select(col("id"),
        size(Dedup.shingles(split(col("text"), " "), 3)).as("n"))
    assert(hashed.exceptAll(strings).count() == 0)
    assert(strings.exceptAll(hashed).count() == 0)
  }
}
