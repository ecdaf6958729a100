package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The union+window as-of join must agree with a driver-side brute force
  * (latest right row at-or-before each left row, per key) on seeded random
  * data — including keys with no right history, right-only keys, and exact
  * timestamp ties (inclusive semantics) — and be partition-invariant.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("asOfBackward == brute force (ties inclusive, missing history, invariant)") {
    val rnd = new scala.util.Random(20260817L)
    val events = (1 to 400).map { i =>
      (i.toLong, ts(rnd.nextInt(1000000).toLong * 1000L), (rnd.nextInt(12) + 1).toLong)
    }
    // keys 1..12 on the left; right history only for 1..9, plus right-only key 99
    val orders = ((1 to 120).map { i =>
      ((rnd.nextInt(9) + 1).toLong, ts(rnd.nextInt(1000000).toLong * 1000L), i.toLong * 10)
    } :+ ((99L, ts(5000L), 999L))).distinct
    // force exact-tie cases: an order at precisely some events' timestamps
    val tied = events.take(5).map { case (_, t, k) => (k, t, 7777L) }
    val right0 = (orders ++ tied).groupBy(x => (x._1, x._2))
      .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toSeq // unique per (key, time)

    val l = events.toDF("eid", "ets", "k")
    val r = right0.toDF("rk", "rts", "oid")
    val got = AsOfJoin.asOfBackward(l, r, col("k"), col("rk"), col("ets"), col("rts"))
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap

    val want = events.map { case (eid, et, k) =>
      val cand = right0.filter(o => o._1 == k && !o._2.after(et))
      eid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got == want)
    assert(got.size == events.size, "left-join must keep every event")

    val got2 = AsOfJoin.asOfBackward(l.repartition(17), r.repartition(5),
      col("k"), col("rk"), col("ets"), col("rts"))
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
    assert(got2 == want)
  }

  test("null keys/times follow SQL semantics: match nothing, left rows kept") {
    val l = Seq((1L, Some(ts(100000L)), Some(5L)), (2L, Some(ts(100000L)), None),
      (3L, None, Some(5L)))
      .toDF("eid", "et", "ek")
    val r = Seq((Some(5L), Some(ts(50000L)), 10L), (None, Some(ts(1L)), 20L),
      (Some(5L), None, 30L))
      .toDF("rk", "rt", "oid")
    val got = AsOfJoin.asOfBackward(l, r, col("ek"), col("rk"), col("et"), col("rt"))
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
    // eid 1: normal match; eid 2 (null key) and eid 3 (null time): no match,
    // and NEVER the null-key/null-time right rows (oid 20/30)
    assert(got == Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("hot-key time-split (timeSplits=4) is bit-identical to the single-window form on a 90%-one-key fixture") {
    val rnd = new scala.util.Random(20260818L)
    val hot = 42L
    // one key carries 90% of both sides — the single-window form funnels it
    // through one partition; the split form must spread it and still match
    val events = (1 to 1000).map { i =>
      val k = if (i % 10 == 0) (i % 7 + 1).toLong else hot
      (i.toLong, ts(rnd.nextInt(1000000).toLong * 1000L), k)
    }
    val orders = ((1 to 300).map { i =>
      val k = if (i % 10 == 0) (i % 7 + 1).toLong else hot
      (k, ts(rnd.nextInt(1000000).toLong * 1000L), i.toLong * 10)
    }).groupBy(x => (x._1, x._2))
      .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toSeq
    val l = events.toDF("eid", "ets", "k")
    val r = orders.toDF("rk", "rts", "oid")
    val single = AsOfJoin.asOfBackward(l, r, col("k"), col("rk"), col("ets"), col("rts"))
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
    for (splits <- Seq(2, 4, 16)) {
      val split = AsOfJoin.asOfBackward(l, r, col("k"), col("rk"), col("ets"), col("rts"),
        timeSplits = splits)
        .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
      assert(split == single, s"timeSplits=$splits")
    }
    // boundary carry-over is real, not incidental: all history in the first
    // tenth of the timeline, probes spread across the whole of it — most
    // ranges have NO right rows and depend entirely on the carried payload
    val rEarly = orders.map { case (k, t, o) => (k, ts(t.getTime % 100000L), o) }
      .groupBy(x => (x._1, x._2)).map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toSeq
      .toDF("rk", "rts", "oid")
    val s1 = AsOfJoin.asOfBackward(l, rEarly, col("k"), col("rk"), col("ets"), col("rts"))
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
    val s4 = AsOfJoin.asOfBackward(l, rEarly, col("k"), col("rk"), col("ets"), col("rts"),
      timeSplits = 8)
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
    assert(s4 == s1)
  }

  test("plan: the split form's main window partitions by (key, range) — the hot key spans >1 partition") {
    // pin the splitMatched seam (asOfBackward eagerly materializes the
    // split result, which would hide the window behind a checkpoint scan)
    val u = Seq((5L, ts(1000L), 1, 7L), (5L, ts(500L), 0, 10L))
      .toDF("_k", "_t", "_tag", "payload")
      .select(col("_k"), col("_t"), col("_tag"),
        when(col("_tag") === 1, struct(col("payload").as("eid"))).as("_l"),
        when(col("_tag") === 0, struct(col("payload").as("oid"))).as("_r"))
      .drop("payload")
    val plan = AsOfJoin.splitMatched(u, timeSplits = 4)
      .queryExecution.executedPlan.toString
    // the data-carrying window's partition spec must include the range
    // column (hashpartitioning(_k, _s)); the single form never has _s
    assert("hashpartitioning\\(_k#\\d+L?, _s#\\d+".r.findFirstIn(plan).isDefined,
      s"expected a (_k, _s) hash partitioning in:\n$plan")
    val l = Seq((1L, ts(1000L), 5L)).toDF("eid", "ets", "k")
    val r = Seq((5L, ts(500L), 10L)).toDF("rk", "rts", "oid")
    val singlePlan = AsOfJoin.asOfBackward(l, r, col("k"), col("rk"), col("ets"), col("rts"))
      .queryExecution.executedPlan.toString
    assert(!singlePlan.contains("_s#"))
  }

  test("column-name collision is a hard error") {
    val l = Seq((1L, ts(1L), "x")).toDF("k", "t", "shared")
    val r = Seq((1L, ts(1L), "y")).toDF("rk", "rt", "shared")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(l, r, col("k"), col("rk"), col("t"), col("rt"))
    }
    assert(e.getMessage.contains("shared"))
  }
}
