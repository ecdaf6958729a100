package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget mixture sampling: the distributed prefix-sum path must be
  * bit-identical to the independent window form at any partition count, and
  * the boundary semantics must match hand computation. The DuckDB oracle
  * (d13) replays the window form relationally on the full corpus.
  */
class MixtureSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Long)] =
    df.as[(Long, String, Long, Long)].collect().sortBy(r => (r._2, r._4)).toSeq

  test("prefix-sum path == window form, across partition counts (incl. 1 and many)") {
    val expected = rows(Mixture.tokenBudgetWindowed(
      spark, corpus, Mixture.defaultBudgets, Mixture.defaultBudgetOther))
    assert(expected.nonEmpty)
    for (nParts <- Seq(1, 3, 17)) {
      val got = rows(Mixture.tokenBudget(
        spark, corpus, Mixture.defaultBudgets, Mixture.defaultBudgetOther, nParts))
      assert(got == expected, s"nParts=$nParts")
    }
  }

  test("every stratum keeps and drops docs (budgets are meaningful both ways)") {
    val kept = Mixture.d13TokenBudget(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = corpus.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept.keySet == all.keySet, "no stratum starved to zero")
    kept.foreach { case (lang, n) =>
      assert(n > 0 && n < all(lang), s"$lang kept $n of ${all(lang)}")
    }
  }

  test("boundary: the doc that would cross its stratum's budget is dropped") {
    // token counts 4,4,4 under budget 10: hash order decides which two fit;
    // the third crosses 8+4=12 > 10 and must be dropped mid-stream
    val docs = Seq(
      (1L, "a b c d", "xx", "s"), (2L, "e f g h", "xx", "s"),
      (3L, "i j k l", "xx", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = rows(Mixture.tokenBudget(spark, docs, Map.empty, 10L, numPartitions = 2))
    assert(got.map(_._3) == Seq(4L, 4L) && got.map(_._4) == Seq(4L, 8L))
    // and the kept set is the hash-order prefix, not an arbitrary pair
    val order = rows(Mixture.tokenBudgetWindowed(spark, docs, Map.empty, 100L))
      .map(_._1)
    assert(got.map(_._1) == order.take(2))
  }

  test("adding a doc only perturbs the tail: earlier-hash selections are stable") {
    val base = rows(Mixture.d13TokenBudget(spark, sfDir)).map(r => (r._1, r._2, r._3)).toSet
    // re-run over the corpus minus one non-selected doc: selection identical
    val selectedIds = base.map(_._1)
    val someDropped = corpus.select("doc_id").as[Long].collect()
      .filterNot(selectedIds).head
    val again = rows(Mixture.tokenBudget(
      spark, corpus.filter(s"doc_id <> $someDropped"),
      Mixture.defaultBudgets, Mixture.defaultBudgetOther))
      .map(r => (r._1, r._2, r._3)).toSet
    assert(again == base, "removing a never-selected doc must not change the sample")
  }
}
