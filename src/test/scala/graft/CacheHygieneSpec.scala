package graft

import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** Persist-lifecycle audit: every SparkEntry query must release whatever it
  * persisted by the time its result is consumed. Round 3 shipped two leaks
  * of this class (KgQueries.links / linksLsh kept a full-corpus texts cache
  * alive per call) and the round-2 advice found two more — a long-lived
  * driver serving these queries accumulates one cached corpus frame per
  * call until the block manager evicts under pressure. The rule each
  * operator follows: persist for the duration of the call, eagerly
  * materialize the (small) result (`localCheckpoint(true)`), unpersist
  * before returning. This spec is the 20-line closure of the class: run
  * every query, then assert the SQL cache registry is empty.
  */
class CacheHygieneSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query entry leaves the cache registry empty after consumption") {
    spark.catalog.clearCache() // other suites share the session
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(s"query $name: ") {
        fn(spark, dir).count() // consume: any lazy internal persists fire here
        assert(Bridge.cacheIsEmpty(spark),
          s"$name left cached plans behind (persist without a paired unpersist)")
      }
    }
  }
}
