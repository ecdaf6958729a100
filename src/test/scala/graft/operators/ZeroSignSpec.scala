package graft.operators

import graft.SparkTestBase
import graft.link.Linker
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IEEE signed-zero contract of the rounded-score gate columns.
  *
  * Round 3's one red oracle row (kg3_links, 3 of 7,572 rows) was a `-0.0`
  * vs `0.0` byte mismatch: DuckDB's `round(-1e-9, 6)` preserves the sign of
  * zero, Spark's round goes through BigDecimal (which has no signed zero).
  * The fix is two-sided: the oracle SQL appends `+ 0` to every rounded
  * possibly-negative score (`-0.0 + 0` is `+0.0` under IEEE 754 — see the
  * SparkEntry.oracleSql scaladoc), and this spec pins the ENGINE side —
  * a planted tiny-negative cosine must come out of each rounded score path
  * with the exact bit pattern of positive zero, so the class of zero-sign
  * flips stays closed.
  */
class ZeroSignSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def bitsOf(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
  private val posZeroBits = bitsOf(0.0)
  assert(bitsOf(-0.0) != posZeroBits) // sanity: the test can tell them apart

  test("Spark round(x, 6) emits positive zero for tiny-negative doubles") {
    val vals = Seq(-1e-9, -0.0, 0.0, 1e-9, -4.9e-7).toDF("x")
      .select(round(col("x"), 6).as("r")).as[Double].collect()
    vals.foreach(v => assert(bitsOf(v) == posZeroBits, s"got bits ${bitsOf(v)}"))
  }

  test("scoreTopK + round (the kg3 engine path) never emits -0.0") {
    // ctx ⊥ vec up to a −1e-9 component: cosine ≈ −1e-9, rounds to zero
    val mentions = Seq(("u1", 0, 5, "surf", "Q1", Seq(1.0f, 0.0f)))
      .toDF("url", "begin", "end", "surface", "qid", "ctx_vec")
    val vecs = Seq(("Q1", Seq(-1e-9f, 1.0f))).toDF("id", "vec")
    val out = Linker.scoreTopK(mentions, vecs, k = 5)
      .withColumn("score", round(col("score"), 6))
      .select("score").as[Double].collect()
    assert(out.length == 1)
    assert(out.forall(s => bitsOf(s) == posZeroBits),
      s"tiny-negative cosine rounded to bits ${out.map(bitsOf).mkString(",")}")
  }

  test("cosineWithNorms + round (the kg11/s3/s4 rounding) never emits -0.0") {
    val pairs = Seq((Seq(1.0f, 0.0f), Seq(-1e-9f, 1.0f)))
      .toDF("a", "b")
      .withColumn("na", Similarity.norm(col("a")))
      .withColumn("nb", Similarity.norm(col("b")))
      .select(round(Similarity.cosineWithNorms(col("a"), col("b"), col("na"), col("nb")), 6).as("r"))
      .as[Double].collect()
    assert(pairs.forall(v => bitsOf(v) == posZeroBits))
  }

  test("the oracle-side `round(x, 6) + 0` guard is value-preserving IEEE arithmetic") {
    // DuckDB can't run inside sbt; this pins the arithmetic identity the
    // guard relies on (`-0.0 + 0 == +0.0`, non-zero values unchanged),
    // which is IEEE 754 and engine-independent. The end-to-end DuckDB
    // byte-compare is the driver's CORRECTNESS gate.
    val r = Seq((-0.0, 0.123456, -0.123456)).toDF("z", "p", "n")
      .select((col("z") + lit(0)).as("z2"), (col("p") + lit(0)).as("p2"), (col("n") + lit(0)).as("n2"))
      .as[(Double, Double, Double)].collect()(0)
    assert(bitsOf(r._1) == posZeroBits)
    assert(r._2 == 0.123456 && r._3 == -0.123456)
  }
}
