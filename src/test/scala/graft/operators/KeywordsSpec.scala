package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** d15 per-document keyword extraction: hand-checkable corpus, rank
  * semantics (tf desc, df asc, word asc), salience arithmetic, and the
  * cache-release contract.
  */
class KeywordsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("hand-computed corpus: tf breaks first, then rarity (df), then word") {
    // 3 docs. "common" appears in all (df=3); "rare" only in doc a (df=1).
    // In doc a both have tf=2 → rare must outrank common despite the tie.
    val docs = Seq(
      ("a", "rare common rare common unique"),
      ("b", "common common solo"),
      ("c", "common"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    docs.write.mode("overwrite").parquet("target/tmp_kw/documents.parquet")

    val out = TextAnalysis.d15Keywords(spark, "target/tmp_kw", k = 5)
      .as[(String, String, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._6)).toSeq

    val a = out.filter(_._1 == "a")
    // doc a: rare(tf2,df1) > common(tf2,df3) > unique(tf1,df1)
    assert(a.map(r => (r._2, r._3, r._4, r._6)) == Seq(
      ("rare", 2L, 1L, 1L), ("common", 2L, 3L, 2L), ("unique", 1L, 1L, 3L)))
    // salience = tf*(N+1)/(df+1), N=3: rare = 2*4/2 = 4.0
    assert(a.head._5 == 4.0)
    val b = out.filter(_._1 == "b")
    assert(b.map(r => (r._2, r._6)) == Seq(("common", 1L), ("solo", 2L)))
    // doc c gets its single word even though k=5
    assert(out.filter(_._1 == "c").map(_._2) == Seq("common"))
  }

  test("real corpus: ≤ k rows per doc, dense ranks, salience positive, no cache left") {
    spark.catalog.clearCache()
    val out = TextAnalysis.d15Keywords(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Double, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.size <= 5, s"doc=$doc")
      assert(rs.map(_._6).sorted == (1L to rs.size).toSeq, s"doc=$doc ranks")
    }
    assert(out.forall(_._5 > 0.0))
    assert(org.apache.spark.sql.graftbridge.Bridge.cacheIsEmpty(spark),
      "d15 left the tf frame cached")
  }
}
