package graft.operators

import graft.SparkTestBase
import graft.pipeline.PagesGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural expectations for the corpus-stats (A1) and sub-triple (P6)
  * queries, derived independently from the PagesGen generation rules.
  */
class KgQueriesSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val n = KgQueries.nPages

  test("kg9 stats: per-PID / per-class / per-site counts match generator rules") {
    val stats = KgQueries.stats(spark, "")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

    // every item has exactly one P1082 / P17 / P361 / P571 / P1448 claim
    Seq("P1082", "P17", "P361", "P571", "P1448").foreach { pid =>
      assert(stats(("claims_per_pid", pid)) == n, pid)
    }
    // P31: one normal each + preferred for i%7==0; deprecated (i%13==0)
    // dropped — stats walk the DB-cleaned claims, like the reference's
    // stats notebook over the stored wikidata table
    val p31 = n + (0L until n).count(_ % 7 == 0)
    assert(stats(("claims_per_pid", "P31")) == p31)
    // sameAs twin edges
    assert(stats(("claims_per_pid", PagesGen.sameAsPid)) == (0L until n).count(_ % 12 == 1))
    // sitelinks: every item except the gated ones
    assert(stats(("sitelinks_per_site", "enwiki")) == (0L until n).count(_ % 10 != 7))
    // instance counts partition the P31 claim rows
    val instSum = stats.collect { case (("instances_per_class", _), c) => c }.sum
    assert(instSum == p31)

    // --- per-language families (ref Get_Wikidata_Stats.py:335-371) ---
    val withWiki = (0L until n).count(_ % 10 != 7)
    // item_type: n item pages (Q) + one page per property (P)
    assert(stats(("item_type", "Q")) == n)
    assert(stats(("item_type", "P")) == PagesGen.properties.size)
    // labels: en/ar always, mul every 5th, de except every 6th≡2
    assert(stats(("labels_per_lang", "en")) == n)
    assert(stats(("labels_per_lang", "ar")) == n)
    assert(stats(("labels_per_lang", "mul")) == (0L until n).count(_ % 5 == 0))
    assert(stats(("labels_per_lang", "de")) == (0L until n).count(_ % 6 != 2))
    // descriptions: en/de/ar on every item
    Seq("en", "de", "ar").foreach(l => assert(stats(("descs_per_lang", l)) == n, l))
    // label∩desc: mul has no description, de misses every 6th≡2
    assert(stats(("labeldesc_per_lang", "en")) == n)
    assert(stats(("labeldesc_per_lang", "de")) == (0L until n).count(_ % 6 != 2))
    assert(!stats.contains(("labeldesc_per_lang", "mul")))
    // wikipedia langs: only enwiki exists; 'total' = entities with ≥1 link
    assert(stats(("wikipedia_per_lang", "en")) == withWiki)
    assert(stats(("wikipedia_per_lang", "total")) == withWiki)
    // wiki-only variants gate every family on ≥1 wikipedia link
    assert(stats(("labeldesc_per_lang_wikionly", "en")) == withWiki)
    assert(stats(("labeldesc_per_lang_wikionly", "de")) ==
      (0L until n).count(i => i % 6 != 2 && i % 10 != 7))
    assert(stats(("claims_per_pid_wikionly", "P17")) == withWiki)
    val instWikiSum = stats.collect { case (("instances_per_class_wikionly", _), c) => c }.sum
    assert(instWikiSum == withWiki + (0L until n).count(i => i % 7 == 0 && i % 10 != 7))
    // labeldesc ∩ wikipedia langs: en is the only wikipedia lang
    assert(stats(("labeldesc_wikipedia_per_lang", "en")) == withWiki)
    assert(!stats.contains(("labeldesc_wikipedia_per_lang", "de")))
  }

  test("kg8 triplets: main/qualifier/reference parts match generator rules") {
    val parts = KgQueries.triplets(spark, "")
      .groupBy("part").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap

    // references: one P580 reference snak on P17 for every 3rd item
    assert(parts("reference") == (0L until n).count(_ % 3 == 0))
    // qualifiers: one P580 qualifier on every item's P17 claim
    assert(parts("qualifier") == n)
    // mains: unlike P5, get_triplets keeps deprecated ranks — P31 deprecated
    // rows for i%13==0 are present
    val mains = KgQueries.triplets(spark, "")
      .filter(col("part") === "main" && col("pid") === "P31").count()
    assert(mains == n + (0L until n).count(_ % 7 == 0) + (0L until n).count(_ % 13 == 0))
  }

  test("kg29 propertyProfileStats: cardinality + kind stats from planted claim rows") {
    val kinds = Seq(
      ("Q1", "P17", true), ("Q2", "P17", true),                      // functional, entity-valued
      ("Q1", "P39", true), ("Q1", "P39", true), ("Q2", "P39", true), // multi-valued on Q1
      ("Q1", "P1082", false), ("Q2", "P1082", true)                  // mixed kinds: extraction bug
    ).toDF("qid", "pid", "isQidValue")
    val got = KgQueries.propertyProfileStats(kinds)
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == Map(
      "P17" -> ((2L, 2L, 1L, 2L, 1.0, true)),
      "P39" -> ((3L, 2L, 2L, 3L, 1.5, false)),
      "P1082" -> ((2L, 2L, 1L, 1L, 1.0, true))))
    // corpus-level: P17 is one-per-item (functional); P31 carries an extra
    // preferred claim for the i%7==0 family (not functional)
    val prof = KgQueries.propertyProfile(spark, "")
      .select("pid", "functional").as[(String, Boolean)].collect().toMap
    assert(prof("P17") && !prof("P31"))
  }

  test("kg18 danglingStats: planted broken references fire the dangling column") {
    val refs = Seq(
      ("Q1", "P17", "Q2"), ("Q1", "P17", "QMISSING"), // one resolved, one dangling
      ("Q2", "P31", "Q1"), ("Q3", "P31", "Q1"),       // all resolved
      ("Q3", "P99", "QGONE")                           // fully dangling pid
    ).toDF("qid", "pid", "valueScalar")
    val known = Seq("Q1", "Q2", "Q3").toDF("id")
    val got = KgQueries.danglingStats(refs, known)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "P17" -> ((2L, 1L, 1L)),
      "P31" -> ((2L, 2L, 0L)),
      "P99" -> ((1L, 0L, 1L))))
    // on the self-consistent generated corpus the production query must
    // see every reference resolve (and at least one pid row must exist)
    val full = KgQueries.dangling(spark, "").as[(String, Long, Long, Long)].collect()
    assert(full.nonEmpty)
    assert(full.forall(_._4 == 0L), "generated corpus should have no danglers")
    assert(full.map(_._2).sum == full.map(_._3).sum)
  }
}
