package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text kernels (SURVEY.md §7.5's escape hatch, same
  * discipline as [[VectorExprs]]: drop to a custom Expression only where
  * the built-in formulation measurably can't hold the hot path).
  *
  * The dedup gram pass is that case. The r10 shape computed word-trigram
  * hashes with a lead()-window over exploded word rows — fully codegen'd,
  * but it shuffled EVERY gram occurrence by doc id just to line up
  * consecutive words (the ~21.5 GB sort spill of the sf100 truth-frame
  * cell was exactly that exchange). The shuffle-free reformulation —
  * per-doc arrays via transform()/element_at — kept the values but ran
  * INTERPRETED: higher-order-function lambdas don't participate in
  * codegen and get no subexpression reuse, so the array pass measured
  * ~5 s where the window shape paid well under 1 s of CPU at sf0.1
  * (and an inline — unbound — word-hash array re-evaluated the whole
  * words→hash transform per element_at access: O(n²) per doc, 12× on
  * the dedup family). This expression is the third corner: zero
  * shuffles AND a tight primitive loop in both eval modes.
  */
object TextExprs {

  /** Whitespace tokenizer pattern — identical to split(text, "\\s+")
    * (String.split delegates to Pattern for multi-char regexes;
    * precompiling just hoists the per-row compile).
    */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Distinct word-trigram hashes of `text`, first-occurrence order —
    * bitwise-identical to the composed built-in form
    *
    * {{{
    * array_distinct(transform(seq, i => xxhash64(wh[i], wh[i+1], wh[i+2])))
    *   where wh = transform(filter(split(lower(trim(text)), "\\s+"),
    *                               w => length(w) > 0), w => xxhash64(w))
    * }}}
    *
    * with the [[graft.operators.Dedup.shingles]] degenerate case (docs
    * shorter than one trigram get a single whole-suffix gram: the 2-word
    * and 1-word hash compositions). Identity holds because every step
    * reuses Spark's own kernels: UTF8String.trim/toLowerCase for the
    * normalization, Pattern("\\s+") for the split (what String.split
    * compiles to), and XXH64 seed-chaining exactly as the XxHash64
    * expression folds its children — hashLong(w3, hashLong(w2,
    * hashLong(w1, 42))). GramHashSpec pins the equality per row on the
    * test corpus plus whitespace/unicode edge cases. Null text → null;
    * no words → empty array.
    */
  def gramHashes(text: UTF8String): ArrayData = {
    val toks = Whitespace.split(text.trim().toLowerCase().toString, -1)
    var m = 0
    val wh = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) {
        val w = UTF8String.fromString(toks(i))
        wh(m) = XXH64.hashUnsafeBytes(
          w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    if (m == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    if (m == 1) return ArrayData.toArrayData(
      Array(XXH64.hashLong(wh(0), 42L)))
    if (m == 2) return ArrayData.toArrayData(
      Array(XXH64.hashLong(wh(1), XXH64.hashLong(wh(0), 42L))))
    val out = new Array[Long](m - 2)
    val seen = new java.util.HashSet[java.lang.Long](((m - 2) * 2).max(8))
    var k = 0
    var j = 0
    while (j <= m - 3) {
      val h = XXH64.hashLong(wh(j + 2),
        XXH64.hashLong(wh(j + 1), XXH64.hashLong(wh(j), 42L)))
      if (seen.add(h)) { out(k) = h; k += 1 }
      j += 1
    }
    ArrayData.toArrayData(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  /** `gramHashes` as a Catalyst expression: string → array<bigint>,
    * null-intolerant, codegen'd as one static call (the work is a
    * data-dependent loop — inlining it buys nothing over the call, and
    * the call keeps the surrounding projection inside whole-stage
    * codegen).
    */
  case class GramHashes(child: Expression) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"gram_hashes expects string, got ${other.catalogString}")
      }

    override def nullSafeEval(t: Any): Any =
      TextExprs.gramHashes(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val cls = TextExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"${ev.value} = $cls.gramHashes($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): GramHashes =
      copy(child = newChild)
  }

  def gramHashes(text: Column): Column =
    GraftSqlBridge.column(GramHashes(GraftSqlBridge.expression(text)))
}
