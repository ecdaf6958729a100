package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The bucketed interval join must produce exactly the pairs the range
  * predicate defines — each exactly once (the bucket rendezvous must never
  * duplicate a pair that spans buckets) — across bucket widths, boundary
  * timestamps (start inclusive, end exclusive), empty intervals, and the
  * keyless (pure range-lookup) shape.
  */
class RangeJoinSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("bucketed join == brute-force range predicate, once per pair, any width") {
    val rnd = new scala.util.Random(20260817L)
    val points = (1 to 300).map(i =>
      (i.toLong, ts(rnd.nextInt(200000).toLong), (rnd.nextInt(5) + 1).toLong))
    val intervals = (1 to 80).map { i =>
      val s = rnd.nextInt(200000).toLong
      (i.toLong * 100, ts(s), ts(s + rnd.nextInt(40000).toLong), (rnd.nextInt(5) + 1).toLong)
    } :+ ((9999L, ts(500), ts(500), 1L)) // empty [t, t) interval: matches nothing
    val want = (for {
      (pid, t, pk) <- points
      (iid, s, e, ik) <- intervals
      if pk == ik && !t.before(s) && t.before(e)
    } yield (pid, iid)).toSet

    val pDf = points.toDF("pid", "t", "pk")
    val iDf = intervals.toDF("iid", "s", "e", "ik")
    for (widthUs <- Seq(1000000L, 7777000L, 86400000000L)) {
      val got = RangeJoin.bucketedIntervalJoin(pDf, iDf,
        pointTime = col("t"), start = col("s"), end = col("e"),
        pointKey = col("pk"), intervalKey = col("ik"), bucketUs = widthUs,
        maxBucketsPerInterval = 100000L) // the 1s-width leg legitimately spans 40k
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.distinct.length, s"width $widthUs: duplicated pairs")
      assert(got.toSet == want, s"width $widthUs: ${got.length} vs ${want.size}")
    }
    // keyless shape: pure range lookup
    val wantAll = (for {
      (pid, t, _) <- points; (iid, s, e, _) <- intervals
      if !t.before(s) && t.before(e)
    } yield (pid, iid)).toSet
    val gotAll = RangeJoin.bucketedIntervalJoin(pDf, iDf,
      pointTime = col("t"), start = col("s"), end = col("e"), bucketUs = 7777000L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(gotAll.length == gotAll.distinct.length)
    assert(gotAll.toSet == wantAll)
  }

  test("bucket assignment is exact past 2^53 microseconds (no double rounding)") {
    // base epoch ~5e17 us (> 2^53): a double floor-div misassigns buckets
    // here; the integer (us - pmod) div path must keep boundary semantics
    val baseS = 500000000001L // odd seconds so the microsecond values are not
                              // multiples of a double ulp at this magnitude
    val w = 10000000L // 10s buckets
    val pDf = Seq((1L, ts(baseS + 10)), (2L, ts(baseS + 20)), (3L, ts(baseS + 30)))
      .toDF("pid", "t")
    val iDf = Seq((100L, ts(baseS + 10), ts(baseS + 30))).toDF("iid", "s", "e")
    val got = RangeJoin.bucketedIntervalJoin(pDf, iDf,
      pointTime = col("t"), start = col("s"), end = col("e"), bucketUs = w)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("an interval spanning too many buckets fails loudly, not OOM") {
    val pDf = Seq((1L, ts(10))).toDF("pid", "t")
    val iDf = Seq((100L, ts(0), ts(10000000L))).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.bucketedIntervalJoin(pDf, iDf,
        pointTime = col("t"), start = col("s"), end = col("e"),
        bucketUs = 1000000L, maxBucketsPerInterval = 100L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("buckets")), e.toString)
  }

  test("boundary semantics: start inclusive, end exclusive, at bucket edges") {
    val w = 10000000L // 10s buckets
    val pDf = Seq((1L, ts(10)), (2L, ts(20)), (3L, ts(30))).toDF("pid", "t")
    val iDf = Seq((100L, ts(10), ts(30))).toDF("iid", "s", "e") // [10, 30)
    val got = RangeJoin.bucketedIntervalJoin(pDf, iDf,
      pointTime = col("t"), start = col("s"), end = col("e"), bucketUs = w)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // 30 excluded: end-exclusive at an exact bucket edge
  }
}
