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
