package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * The portable formulation (`aggregate(zip_with(a, b, *), 0d, +)`) runs
  * through interpreted higher-order-function evaluation with per-element
  * lambda dispatch; this expression generates a tight primitive loop inside
  * whole-stage codegen instead. Arithmetic is kept bit-identical to the
  * portable version (float multiply, double accumulate), so the
  * DuckDB-oracle-exact results are unchanged.
  *
  * This is the one custom Catalyst Expression the engine carries (SURVEY.md
  * §2.10): a scalar kernel on the retrieval/ANN/link hot path where the
  * built-in operators genuinely can't reach codegen.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += (x.getFloat(i) * y.getFloat(i)).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double)($a.getFloat($i) * $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot of an `array<float>` column against an `array<double>`
  * column (the LSH hyperplane projection kernel). Same bit-contract as the
  * HOF form it replaces (`zip_with(v, planes, x*p)` + double accumulate):
  * the float widens exactly, products and the accumulator are double — so
  * every projection SIGN matches the DuckDB oracle's replica unchanged,
  * while the 36-plane bucket computation leaves interpreted per-element
  * lambda dispatch for a tight generated loop.
  */
case class FloatDoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fddot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double)$a.getFloat($i)) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Register `graft_fdot` for SQL use (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fdot", exprs => FloatVectorDot(exprs.head, exprs(1)), "built-in")

  /** Dot product Column over two array<float> columns (codegen'd). */
  def fdot(a: Column, b: Column): Column =
    Bridge.column(FloatVectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Dot of an array<float> column against an array<double> column
    * (codegen'd) — the hyperplane projection kernel.
    */
  def fddot(a: Column, b: Column): Column =
    Bridge.column(FloatDoubleDot(Bridge.expression(a), Bridge.expression(b)))

  /** The portable higher-order-function formulation (same arithmetic). */
  def portableDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
  }
}
