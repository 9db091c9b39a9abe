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

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def l2norm(a: Column): Column =
    GraftSqlBridge.column(L2Norm(GraftSqlBridge.expression(a)))
}
