package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight per-row kernels for the text-analysis hot paths (d18/d20/d21),
  * replacing interpreted higher-order-function chains with single-pass Java
  * loops — the [[FloatVectorDot]] precedent applied to the gram/fingerprint
  * family. Every kernel is BIT-IDENTICAL to the portable `functions._` form
  * it replaces (KernelEquivalenceSpec pins each equality property-style), so
  * the DuckDB-oracle-exact results are unchanged.
  *
  * All kernels extend CodegenFallback: the per-row work is one virtual call
  * into a hand-written loop, so codegen of the loop itself would buy nothing
  * — the interpreted cost these remove was the per-ELEMENT lambda dispatch
  * (one Catalyst eval tree walk per array element per enclosing HOF level),
  * not the per-row call.
  */
object TextKernels {

  /** 60-bit md5 hash of a byte string — first 15 hex chars of the digest as
    * an unsigned long (`CAST('0x'||substring(md5(x),1,15) AS BIGINT)`): the
    * first 8 digest bytes big-endian, shifted right 4. Exactly
    * [[graft.operators.Sketches.kmvHash]]'s arithmetic.
    */
  private[functions] def md5_60(bytes: Array[Byte]): Long = {
    val d = localMd5.get()
    d.reset()
    val h = d.digest(bytes)
    val top = ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    top >>> 4
  }

  /** MessageDigest is stateful and expression instances are shared across
    * tasks in one executor JVM — thread-local, constructed once per thread.
    */
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = UTF8String.fromString(" ")

  /** The k-gram UTF8String at word index i0 — `concat_ws(" ", w[i0..i0+k-1])`
    * including its skip-null semantics (separator only between non-null
    * elements), though split() never yields nulls.
    */
  private[functions] def gramAt(words: ArrayData, i0: Int, k: Int): UTF8String = {
    val parts = new Array[UTF8String](k)
    var j = 0
    while (j < k) {
      parts(j) = if (words.isNullAt(i0 + j)) null else words.getUTF8String(i0 + j)
      j += 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  def gramHashes(words: Column, k: Int): Column =
    Bridge.column(GramHash60(Bridge.expression(words), k))

  def gramStrings(words: Column, k: Int): Column =
    Bridge.column(GramStrings(Bridge.expression(words), k))

  def winnowFingerprints(hashes: Column, w: Int): Column =
    Bridge.column(WinnowFp(Bridge.expression(hashes), w))

  def removeCovered(words: Column, covered: Column): Column =
    Bridge.column(RemoveCovered(Bridge.expression(words), Bridge.expression(covered)))

  def minHashPick(adj: Column, prefix: Column): Column =
    Bridge.column(MinHashPick(Bridge.expression(adj), Bridge.expression(prefix)))
}

/** Hashed word k-grams in one pass: bit-identical to
  * `transform(gramsCol(words, k), g => Sketches.kmvHash(g))` — the gram is
  * the `concat_ws(" ", ...)` rendering, the hash the 60-bit md5 recipe.
  * A null or shorter-than-k words array yields the EMPTY array (the
  * `gramsCol` guard's semantics), so this expression is never null.
  */
case class GramHash60(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_hashes"

  private val empty = new GenericArrayData(Array.empty[Long])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty
    val words = v.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < k) return empty
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = TextKernels.md5_60(TextKernels.gramAt(words, i, k).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word k-grams as strings in one pass: bit-identical to
  * `gramsCol(words, k)` (same null/short-array guard as [[GramHash60]]).
  */
case class GramStrings(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_strings"

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty
    val words = v.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < k) return empty
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = TextKernels.gramAt(words, i, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (d20) in one pass over the hashed-gram
  * array: for each window start i ∈ [1, max(n−w+1, 1)] the FIRST position of
  * the window minimum, deduped, paired with its hash — bit-identical to the
  * portable form
  * `array_distinct(transform(starts, i => (i-1) + array_min(filter(...))))`
  * + `transform(sel, p => struct(p, element_at(hs, p)))`.
  *
  * Dedup is the consecutive-equality check: selected positions are
  * non-decreasing across sliding windows (if window i keeps its minimum,
  * every candidate left of it was already > min; if a new element becomes
  * the minimum it sits at the window's right edge), so distinct ==
  * drop-consecutive-duplicates. O(n·w) per row in a primitive loop.
  * Returns array<struct<pos:long, fp:long>>; empty input → empty array.
  */
case class WinnowFp(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_winnow"

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return empty
    val nStarts = math.max(n - w + 1, 1)
    val out = new java.util.ArrayList[Any](nStarts)
    var last = -1
    var i0 = 0
    while (i0 < nStarts) {
      val end = math.min(i0 + w, n)
      var mi = i0
      var mv = hs.getLong(i0)
      var j = i0 + 1
      while (j < end) {
        val x = hs.getLong(j)
        if (x < mv) { mv = x; mi = j }
        j += 1
      }
      if (mi != last) {
        out.add(new GenericInternalRow(Array[Any]((mi + 1).toLong, mv)))
        last = mi
      }
      i0 += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** d21's word surgery in O(n_words + n_cov·log n_cov): keep word j (1-based)
  * iff j is not in the covered-position array — bit-identical to
  * `filter(w, (_, i) => !array_contains(cov, i+1))`, which rescans `cov`
  * once per word (the per-row quadratic flagged in round 5's verdict: a
  * 30k-word fully-covered doc did ~9·10⁸ comparisons in one task). Here
  * `cov` is sorted once per row and consumed by a single merge pointer —
  * sound because the probe sequence j = 1, 2, … is ascending.
  */
case class RemoveCovered(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_remove_covered"

  override def nullSafeEval(wv: Any, cv: Any): Any = {
    val words = wv.asInstanceOf[ArrayData]
    val cov0 = cv.asInstanceOf[ArrayData]
    val n = words.numElements()
    val m = cov0.numElements()
    val cov = new Array[Long](m)
    var i = 0
    while (i < m) { cov(i) = cov0.getLong(i); i += 1 }
    java.util.Arrays.sort(cov)
    val out = new java.util.ArrayList[Any](n)
    var p = 0 // merge pointer into sorted cov
    var j = 1L // 1-based word position
    i = 0
    while (i < n) {
      while (p < m && cov(p) < j) p += 1
      if (p >= m || cov(p) != j)
        out.add(if (words.isNullAt(i)) null else words.getUTF8String(i))
      i += 1
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The seeded random-walk next-hop draw (kg30) as one in-row argmin over the
  * adjacency array: pick the neighbor minimizing the 60-bit md5 of
  * `prefix || neighbor`, ties to the FIRST array position — with the
  * adjacency sorted ascending this is exactly the window form's
  * `(hash asc, dst asc)` order. Null/empty adjacency → null (a dead end).
  */
case class MinHashPick(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_minhash_pick"

  override def nullSafeEval(av: Any, pv: Any): Any = {
    val adj = av.asInstanceOf[ArrayData]
    val prefix = pv.asInstanceOf[UTF8String].getBytes
    val n = adj.numElements()
    if (n == 0) return null
    var best: UTF8String = null
    var bestH = Long.MaxValue
    var i = 0
    while (i < n) {
      if (!adj.isNullAt(i)) {
        val d = adj.getUTF8String(i)
        val db = d.getBytes
        val buf = new Array[Byte](prefix.length + db.length)
        System.arraycopy(prefix, 0, buf, 0, prefix.length)
        System.arraycopy(db, 0, buf, prefix.length, db.length)
        val h = TextKernels.md5_60(buf)
        if (h < bestH) { bestH = h; best = d }
      }
      i += 1
    }
    if (best == null) null else best.clone()
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
