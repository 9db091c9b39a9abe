package graft

import org.apache.spark.sql.functions._
import graft.functions.TextExprs
import graft.operators.Dedup
import graft.sources.Tables

/** Pins the native gram kernel ([[TextExprs.gramHashes]]) bitwise-equal
  * to the composed built-in form it replaced — the r10 window shape's
  * hash compositions expressed in-array. The composed reference here
  * binds the word-hash array in its own projection (an inline reference
  * re-evaluates the transform per element_at access — the O(n²) trap the
  * kernel exists to avoid), and explodes per doc so the comparison is
  * order-sensitive per row.
  */
class GramHashSpec extends SparkSpec {
  import spark.implicits._

  /** Composed built-in reference: distinct trigram hashes over bound
    * word hashes, first-occurrence order — the exact expression the
    * kernel's scaladoc claims identity with.
    */
  private def referenceGrams(docs: org.apache.spark.sql.DataFrame) = {
    val wh = col("wh")
    val n = size(wh)
    docs.filter(trim(coalesce(col("text"), lit(""))) =!= "")
      .select(col("id"),
        transform(Dedup.words(col("text")), w => xxhash64(w)).as("wh"))
      .select(col("id"), array_distinct(
        when(n >= 3,
          transform(sequence(lit(0), n - 3), i =>
            xxhash64(element_at(wh, i + 1), element_at(wh, i + 2),
              element_at(wh, i + 3))))
          .when(n === 2, array(xxhash64(element_at(wh, 1), element_at(wh, 2))))
          .otherwise(array(xxhash64(element_at(wh, 1))))).as("g"))
  }

  private def assertSame(docs: org.apache.spark.sql.DataFrame): Unit = {
    val native = docs
      .filter(trim(coalesce(col("text"), lit(""))) =!= "")
      .select(col("id"), TextExprs.gramHashes(col("text")).as("g"))
    // order-sensitive per row: compare the arrays as values
    val diff = native.join(referenceGrams(docs).withColumnRenamed("g", "g_ref"),
        Seq("id"), "full")
      .filter(col("g").isNull || col("g_ref").isNull ||
        col("g") =!= col("g_ref"))
    assert(diff.count() == 0)
  }

  test("native kernel equals the composed built-in form on the test corpus") {
    assertSame(Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text")))
  }

  test("native kernel equals the composed form on whitespace/unicode edges") {
    assertSame(Seq(
      1L -> "one",
      2L -> "two words",
      3L -> "three words here",
      4L -> "a b c d e f g",
      5L -> "  leading and trailing   ",
      6L -> "tabs\tand\nnewlines\r\nmixed   spaces",
      7L -> "MiXeD CaSe ÅÄÖ ß İstanbul ΣΊΣΥΦΟΣ",
      8L -> "répé tée répé tée répé tée",
      9L -> "emoji 🙂 and 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 sūpplęmęntāry planes",
      10L -> "same same same same same",
      11L -> "  nbsp is not regex whitespace? it is:  x"
    ).toDF("id", "text"))
  }

  test("degenerate domain: null/blank absent, empty array only for wordless") {
    // gramHashes itself (pre-filter) on a wordless-but-nonnull text
    val got = Seq(1L -> "   ", 2L -> "", 3L -> null.asInstanceOf[String],
        4L -> "x")
      .toDF("id", "text")
      .select(col("id"), TextExprs.gramHashes(col("text")).as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(got(1L) != null && got(1L).isEmpty) // spaces: no words
    assert(got(2L) != null && got(2L).isEmpty) // empty string
    assert(got(3L) == null)                    // null text -> null
    assert(got(4L).length == 1)                // one word -> one gram
  }
}
