package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the distributed two-pass prefix-sum form must be
  * bit-identical to the global-window reference form at any partition
  * count, match hand computation on a boundary-heavy fixture, and carry
  * the documented empty-doc and oversize-doc semantics.
  */
class PackingSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private type Row6 = (Long, Long, Long, Option[Long], Option[Long], Long)
  private def rows(df: DataFrame): Seq[Row6] =
    df.as[Row6].collect().sortBy(_._1).toSeq

  test("pack == packWindowed on the real corpus at several partition counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val want = rows(Packing.packWindowed(docs, capacity = 512))
    for (nParts <- Seq(1, 3, 32)) {
      val got = rows(Packing.pack(spark, docs, capacity = 512, numPartitions = nParts))
      assert(got == want, s"nParts=$nParts")
    }
    // sanity: the corpus genuinely exercises both straddling docs and
    // multi-doc windows at this capacity
    assert(want.exists(_._6 > 1), "expected a doc spanning >1 window")
    assert(want.groupBy(_._4).exists(_._2.size > 1), "expected a window holding >1 doc")
  }

  test("hand fixture: offsets, window ranges, empty docs, oversize docs") {
    // capacity 10; token counts: 4, 4, 4 → third doc straddles w0/w1;
    // doc 4 is empty (no window); doc 5 has 25 tokens (spans w1..w3)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "e f g h"),
      (3L, "i j k l"),
      (4L, ""),
      (5L, (1 to 25).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = rows(Packing.pack(spark, docs, capacity = 10))
    assert(got == Seq(
      (1L, 4L, 0L, Some(0L), Some(0L), 1L),
      (2L, 4L, 4L, Some(0L), Some(0L), 1L),
      (3L, 4L, 8L, Some(0L), Some(1L), 2L),   // straddles the w0/w1 cut
      (4L, 0L, 12L, None, None, 0L),          // empty: occupies nothing
      (5L, 25L, 12L, Some(1L), Some(3L), 3L)))// oversize: 3 windows
    assert(got == rows(Packing.packWindowed(docs, capacity = 10)))
  }

  test("total window count == ceil(total tokens / capacity)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = rows(Packing.pack(spark, docs, capacity = 97))
    val totalTokens = got.map(_._2).sum
    val lastWindow = got.flatMap(_._5).max
    assert(lastWindow == (totalTokens - 1) / 97,
      "the final cut must land exactly at the prefix-sum end")
  }
}
