package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Tight per-row kernels for the PQ/IVF-PQ ANN family (s8/s9, and s10
  * transitively): the portable forms build m·ksub literal `aggregate(
  * zip_with(...))` trees — ~4000 expression nodes analyzed/optimized per
  * plan and walked interpreted per row. Each kernel here is one expression
  * node holding the (driver-bounded) codebook as a plain Scala array and
  * computing the identical exact-integer arithmetic in a primitive loop:
  * strict `<` argmins keep the FIRST minimum, matching both the literal
  * form's `array_position(d, array_min(d))` and the oracle's
  * `(d ASC, code ASC)` ranking. All inputs/outputs are exact BIGINTs, so
  * results are bit-identical (KernelEquivalenceSpec pins each).
  */
object PqKernels {

  private[functions] def l2sq(v: ArrayData, off: Int, cent: Array[Long], len: Int): Long = {
    var d = 0L
    var i = 0
    while (i < len) {
      val df = v.getLong(off + i) - cent(i)
      d += df * df
      i += 1
    }
    d
  }

  def pqCodes(q: Column, cb: Array[Array[Array[Long]]], dsub: Int): Column =
    Bridge.column(PqCodes(Bridge.expression(q), cb, dsub))

  def pqLut(q: Column, cb: Array[Array[Array[Long]]], dsub: Int): Column =
    Bridge.column(PqLut(Bridge.expression(q), cb, dsub))

  def l2Dists(q: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(L2Dists(Bridge.expression(q), cents))

  def subCentroid(q: Column, cell: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(SubCentroid(Bridge.expression(q), Bridge.expression(cell), cents))
}

/** PQ encode: code[s] = first argmin over ksub codebook centroids of the
  * integer L2² between subvector s and the centroid — bit-identical to the
  * literal-tree form `array(s => (array_position(dists_s, array_min(dists_s))
  * - 1).cast(int))`. Returns array<int> of m codes.
  */
case class PqCodes(child: Expression, cb: Array[Array[Array[Long]]], dsub: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(qv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val d = PqKernels.l2sq(q, s * dsub, cents(c), dsub)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side ADC lookup table: lut[s][c] = integer L2²(subvector s,
  * centroid c) — bit-identical to the nested-literal form. Returns
  * array<array<long>> (m × ksub).
  */
case class PqLut(child: Expression, cb: Array[Array[Array[Long]]], dsub: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(qv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val m = cb.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      val row = new Array[Long](cents.length)
      var c = 0
      while (c < cents.length) {
        row(c) = PqKernels.l2sq(q, s * dsub, cents(c), dsub)
        c += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full-dimension integer L2² distances to each coarse centroid (the s9
  * cell-assignment/probe kernel) — bit-identical to
  * `array(cents.map(cv => l2sqLit(q, cv)))`. Returns array<long>.
  */
case class L2Dists(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_l2_dists"

  override def nullSafeEval(qv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val out = new Array[Long](cents.length)
    var c = 0
    while (c < cents.length) {
      out(c) = PqKernels.l2sq(q, 0, cents(c), cents(c).length)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual against a coarse centroid: q − cents[cell] elementwise — the
  * nested-literal `zip_with(q, element_at(coarseLit, cell+1), x−y)` as one
  * node. Returns array<long>.
  */
case class SubCentroid(left: Expression, right: Expression,
                       cents: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sub_centroid"

  override def nullSafeEval(qv: Any, cellv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val cent = cents(cellv.asInstanceOf[Int])
    val out = new Array[Long](cent.length)
    var i = 0
    while (i < cent.length) {
      out(i) = q.getLong(i) - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
