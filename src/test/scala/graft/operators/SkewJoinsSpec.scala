package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("salted join == plain join on a hot-key distribution") {
    // 10k facts, 95% pointing at one hot key (the "human" shape)
    val facts = spark.range(10000)
      .select(col("id"),
        when(pmod(col("id"), lit(20)) < 19, lit("Q5"))
          .otherwise(concat(lit("Q"), pmod(col("id"), lit(7)))).as("key"))
    val dim = Seq(("Q5", "human"), ("Q0", "zero"), ("Q1", "one"), ("Q2", "two"),
      ("Q3", "three"), ("Q4", "four"), ("Q5x", "unused"), ("Q6", "six"))
      .toDF("key", "label")

    val plain = facts.join(dim, Seq("key")).select("id", "key", "label")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoins.saltedJoin(facts, dim, "key", saltBy = col("id"), buckets = 8)
      .select("id", "key", "label").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)

    // left join with misses preserved
    val factsMiss = facts.withColumn("key",
      when(col("id") < 100, lit("QMISSING")).otherwise(col("key")))
    val plainL = factsMiss.join(dim, Seq("key"), "left").select("id", "key", "label")
      .collect().map(_.toString).sorted.toSeq
    val saltedL = SkewJoins.saltedJoin(factsMiss, dim, "key", col("id"), 8, "left")
      .select("id", "key", "label").collect().map(_.toString).sorted.toSeq
    assert(saltedL == plainL)
  }
}
