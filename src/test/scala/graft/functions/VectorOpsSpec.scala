package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("codegen fdot is bit-identical to the portable zip_with/aggregate form") {
    val rnd = new java.util.Random(99)
    val rows = (0 until 500).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
    val got = df.select(col("id"),
      VectorOps.fdot(col("a"), col("b")).as("fast"),
      VectorOps.portableDot(col("a"), col("b")).as("portable"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, fast, portable) =>
      assert(java.lang.Double.doubleToLongBits(fast) == java.lang.Double.doubleToLongBits(portable),
        s"row $id: $fast vs $portable")
    }
  }

  test("fdot handles empty and mismatched-length arrays") {
    val df = Seq(
      (1L, Seq.empty[Float], Seq.empty[Float]),
      (2L, Seq(1f, 2f, 3f), Seq(2f)),
      (3L, Seq(1f, 2f), Seq(3f, 4f))).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorOps.fdot(col("a"), col("b")))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0 && got(2L) == 2.0 && got(3L) == 11.0)
  }

  test("graft_fdot works from SQL after registration") {
    VectorOps.ensureRegistered(spark)
    val r = spark.sql("SELECT graft_fdot(array(cast(1.5 as float), cast(2 as float)), " +
      "array(cast(2 as float), cast(3 as float))) AS d").collect().head.getDouble(0)
    assert(r == 9.0)
  }
}
