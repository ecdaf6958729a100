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

/** Sign-LSH bucket id in one pass: bit b of the result is the sign of the
  * projection of the float vector onto plane b — bit-identical to the
  * portable `(0 until bits).map(b => when(fddot(v, planeLit_b) >= 0,
  * lit(1 << b)).otherwise(0)).reduce(_ + _)` form (same fddot arithmetic:
  * float widened to double, double accumulate, length = min of the two),
  * including its null contract (a null vector buckets to 0, the portable
  * chain's `otherwise` path). The portable form built bits × dim literal
  * nodes per bucket column — at 6 tables × 10 bits × 64 dims per join side
  * that was a ~100 KB plan per LSH query, seconds of analysis per run and
  * megabyte task binaries (round 6; the s8/s9 PqKernels finding applied to
  * the LSH family).
  */
case class SignBucket(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sign_bucket"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vv = child.eval(input)
    if (vv == null) return 0 // the portable when-chain's otherwise(0) path
    val v = vv.asInstanceOf[ArrayData]
    var bucket = 0
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(v.numElements(), p.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) acc += v.getFloat(i).toDouble * p(i)
        i += 1
      }
      if (acc >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  /** All-planes sign-LSH bucket id (one expression node — see [[SignBucket]]). */
  def signBucket(v: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(SignBucket(Bridge.expression(v), planes))

  /** The portable higher-order-function formulation (same arithmetic). */
  def portableDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
  }
}
