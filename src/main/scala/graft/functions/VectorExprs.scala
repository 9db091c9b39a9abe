package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels (SURVEY.md §7.5's escape hatch, used
  * where it measurably pays): the higher-order-function formulation of a
  * dot product (`aggregate(zip_with(...))`) runs interpreted — one lambda
  * dispatch per element. These expressions compile to a tight primitive
  * loop inside whole-stage codegen.
  *
  * Arithmetic contract: identical to the HOF/oracle formulation — each
  * float element cast to double, products accumulated LEFT TO RIGHT into a
  * 0.0-seeded double — so results are bitwise-equal to both the previous
  * implementation and the DuckDB oracle's list_reduce fold (KnnSpec and
  * the q_knn_cosine/q_vector_norm oracles pin this).
  */
object VectorExprs {

  /** dot(a, b) over array<float> columns, double accumulator. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}_acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}_acc +=
           |    ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = ${ev.value}_acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm over an array<float> column, double accumulator. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"l2_norm expects array<float>, got ${other.catalogString}")
      }

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val v = ctx.freshName("v")
        s"""
           |double ${ev.value}_acc = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  ${ev.value}_acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)
  }

  /** All `tables` sign-LSH bucket ids of a float-array column in ONE pass
    * (array<long> of length `tables`): for table t, bit p of the bucket is
    * the sign of the projection onto pseudo-random hyperplane t*bits+p.
    * Plane components are ±1 from a murmur-finalized mix of (plane, dim) —
    * deterministic, no RNG state, no stored plane matrix. The HOF
    * formulation of this ran ~15M interpreted lambda steps per 5k vectors
    * (SURVEY.md §7.5's "profiling shows HOF overhead" case — this is the
    * codegen'd replacement).
    */
  case class LshBuckets(child: Expression, bits: Int, tables: Int)
      extends UnaryExpression {
    require(bits > 0 && bits <= 63 && tables > 0)

    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"lsh_buckets expects array<float>, got ${other.catalogString}")
      }

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < bits) {
          var s = 0.0
          var i = 0
          while (i < x.numElements()) {
            s += x.getFloat(i).toDouble *
              VectorExprs.planeSign(t * bits + p, i)
            i += 1
          }
          if (s > 0) bucket |= 1L << p
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val bucket = ctx.freshName("bucket")
        val cls = VectorExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |long[] $out = new long[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  long $bucket = 0L;
           |  for (int $p = 0; $p < $bits; $p++) {
           |    double $s = 0.0;
           |    for (int $i = 0; $i < $a.numElements(); $i++) {
           |      $s += ((double) $a.getFloat($i))
           |        * $cls.planeSign($t * $bits + $p, $i);
           |    }
           |    if ($s > 0) $bucket |= 1L << $p;
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): LshBuckets =
      copy(child = newChild)
  }

  /** Count of pairwise-equal slots between two array<bigint> columns — the
    * MinHash signature agreement kernel. The HOF formulation
    * (`aggregate(zip_with(a, b, eq), 0, +)`) pays one interpreted lambda
    * dispatch per slot per candidate PAIR plus a materialized 64-slot
    * intermediate array; at high duplication factors the pair count
    * explodes and that fold dominated the dedup family's cost. This is a
    * tight primitive loop in both eval modes (it runs inside the
    * pair-emission HOF lambda, so interpreted eval matters as much as
    * codegen). Result is identical to the fold: slots compared up to the
    * shorter length (signatures are fixed-width in practice), and a NULL
    * slot on either side counts as NOT equal — the fold's `x === y`
    * yields NULL there, which its sum counted as 0 (ADVICE r4: the
    * unguarded getLong read a null slot's backing value as 0, silently
    * equating two null slots; unreachable from minhash signatures, which
    * are min-aggregates of non-null xxhash64 values, but the kernel is
    * public).
    */
  case class EqualSlots(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(org.apache.spark.sql.types.LongType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"equal_slots expects array<bigint> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var c = 0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
          c += 1
        i += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
           |      $a.getLong($i) == $b.getLong($i)) $c++;
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): EqualSlots =
      copy(left = newLeft, right = newRight)
  }

  /** ±1 hyperplane component for (plane, dim): murmur64-finalized mix of
    * the pair, lowest bit decides the sign. Public: called from generated
    * code.
    */
  def planeSign(plane: Int, dim: Int): Double = {
    var h = plane * 0x9E3779B97F4A7C15L + dim * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  def lshBuckets(a: Column, bits: Int, tables: Int): Column =
    GraftSqlBridge.column(LshBuckets(GraftSqlBridge.expression(a), bits, tables))

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def equalSlots(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      EqualSlots(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def l2norm(a: Column): Column =
    GraftSqlBridge.column(L2Norm(GraftSqlBridge.expression(a)))
}
