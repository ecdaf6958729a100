package graft.operators

import graft.SparkTestBase
import graft.canon.ConnectedComponents
import graft.pipeline.PagesGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-crawl package: crawl-2 generator contract, revisit
  * consolidation, SCD-2 triple history, and the incremental
  * connected-components fold (== full recompute, property-pinned).
  */
class IncrementalCrawlSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val mapper = graft.model.WikidataJson.mapper
  private val n = 120L

  // ── PagesGen crawl-2 contract ──────────────────────────────────────────

  test("crawl 2 re-serves byte-identical payloads outside the change families") {
    // i = 3: re-crawled (3 % 3 == 0), neither i%6==0 nor i%24==1
    assert(PagesGen.entityJson(3, n, mapper) == PagesGen.entityJson(3, n, mapper, crawl = 2))
  }

  test("crawl 2 revises P1082 for the i%6==0 family and ONLY that claim's value") {
    val c1 = PagesGen.entityJson(6, n, mapper)
    val c2 = PagesGen.entityJson(6, n, mapper, crawl = 2)
    assert(c1 != c2)
    assert(c2.contains(s"+${2000000 + 6 % 999000}"))
    // every later rnd-derived claim unchanged: strip only the population
    // amount from both and the remainders must agree byte for byte
    def stripPop(s: String) = s.replaceAll(""""amount":"\+\d+","unit":"1"""", "")
    assert(stripPop(c1) == stripPop(c2))
  }

  test("crawl 2 adds the bridging sameAs edge for the i%24==1 family") {
    val c1 = PagesGen.entityJson(25, n, mapper)
    val c2 = PagesGen.entityJson(25, n, mapper, crawl = 2)
    assert(!c1.contains(PagesGen.qid(37)) && c2.contains(PagesGen.qid(37)))
  }

  test("pagesDelta is deterministic and restricted to the re-crawl set") {
    val a = PagesGen.pagesDelta(spark, n, partitions = 3)
    val b = PagesGen.pagesDelta(spark, n, partitions = 7)
    assert(a.select("url").as[String].collect().sorted.toSeq ==
      b.select("url").as[String].collect().sorted.toSeq)
    val ids = a.select("url").as[String].collect()
      .map(_.substring("https://fixture.test/wiki/Q".length).toLong - 100000L)
    assert(ids.forall(i => i % 3 == 0 || i % 24 == 1))
    assert(ids.exists(_ % 24 == 1))
  }

  // ── Revisit consolidation ──────────────────────────────────────────────

  test("revisit: changed iff the latest digest differs from the first") {
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val snaps = Seq(
      ("u1", ts(1000L), "aaaa"), ("u1", ts(2000L), "bbbb"), // changed
      ("u2", ts(1000L), "cccc"), ("u2", ts(2000L), "cccc"), // re-fetch, same bytes
      ("u3", ts(1000L), "dddd"),                            // never revisited
      ("u4", ts(1000L), "eeee"), ("u4", ts(1500L), "ffff"), ("u4", ts(2000L), "eeee"))
    val got = Revisit.latest(snaps.toDF("url", "warc_ts", "digest"))
      .select("url", "n_snapshots", "changed")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "u1" -> ((2L, true)), "u2" -> ((2L, false)),
      "u3" -> ((1L, false)),
      // u4 bounced back to its first content: latest == first → unchanged
      "u4" -> ((3L, false))))
  }

  test("kg19 over the corpus: unchanged re-crawls false, P1082 family true") {
    val out = KgQueries.revisit(spark, "")
      .select("url", "n_snapshots", "changed")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def u(i: Long) = PagesGen.urlOf(PagesGen.qid(i))
    assert(out(u(6)) == ((2L, true)))   // population revised
    assert(out(u(3)) == ((2L, false)))  // re-crawled, byte-identical
    assert(out(u(25)) == ((2L, true)))  // gained the sameAs claim
    assert(out(u(5)) == ((1L, false)))  // not re-crawled
    assert(out.size == KgQueries.nPages + PagesGen.properties.size)
  }

  test("kg28 recrawl priority: rate and class from planted snapshot histories") {
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val snaps = Seq(
      ("u1", ts(1000L), "a"), ("u1", ts(2000L), "b"), ("u1", ts(3000L), "c"),
      ("u2", ts(1000L), "a"), ("u2", ts(2000L), "a"), ("u2", ts(3000L), "b"),
      ("u3", ts(1000L), "a"), ("u3", ts(2000L), "a"), ("u3", ts(3000L), "a"),
      ("u3", ts(4000L), "b"),
      ("u4", ts(1000L), "a"), ("u4", ts(2000L), "a"),
      ("u5", ts(1000L), "a"))
    val got = KgQueries.recrawlPriorityFrame(snaps.toDF("url", "warc_ts", "digest"))
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "u1" -> ((3L, 2L, 1.0, "high")),       // changed every revisit
      "u2" -> ((3L, 1L, 0.5, "high")),       // exactly at the 0.5 boundary
      "u3" -> ((4L, 1L, 1.0 / 3.0, "medium")),
      "u4" -> ((2L, 0L, 0.0, "low")),        // revisited, never changed
      "u5" -> ((1L, 0L, 0.0, "unknown"))))   // no pair evidence
  }

  test("kg28 over the corpus: revised urls high, re-serves low, single-crawl unknown") {
    val out = KgQueries.recrawlPriority(spark, "")
      .select("url", "priority").as[(String, String)].collect().toMap
    def u(i: Long) = PagesGen.urlOf(PagesGen.qid(i))
    assert(out(u(6)) == "high")    // population revised between crawls
    assert(out(u(3)) == "low")     // re-crawled, byte-identical
    assert(out(u(5)) == "unknown") // not re-crawled
  }

  test("kg23: exact-dup groups are exactly the unchanged re-serves, multiplicity 2") {
    val got = KgQueries.exactDupGroups(spark, "")
      .select("n_copies", "n_urls", "rep_url")
      .as[(Long, Long, String)].collect().toSeq
    // every group is one url re-served byte-identically across the crawls
    assert(got.nonEmpty, "the two-crawl corpus must contain exact dupes")
    assert(got.forall { case (c, u, _) => c == 2L && u == 1L })
    // membership = re-crawled (i%3==0 or i%24==1) minus the two change
    // families: i%6==0 revises P1082; i%24==1 gains a sameAs edge only
    // when its target qid(i+12) exists (i+12 < n) — the boundary entity
    // re-serves unchanged
    val n = KgQueries.nPages
    val want = (0L until n)
      .filter(i => (i % 3 == 0 || i % 24 == 1) && i % 6 != 0 &&
        !(i % 24 == 1 && i + 12 < n))
      .map(i => PagesGen.urlOf(PagesGen.qid(i))).toSet
    assert(got.map(_._3).toSet == want)
  }

  // ── SCD-2 intervals ────────────────────────────────────────────────────

  test("scd: change points version, re-assertions extend, NULLs version once") {
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val obs = Seq(
      ("k1", Some("a"), ts(1L)), ("k1", Some("a"), ts(2L)), ("k1", Some("b"), ts(3L)),
      ("k1", Some("a"), ts(4L)), // back to a — NEW interval, not a merge
      ("k2", None: Option[String], ts(1L)), ("k2", None, ts(2L)), ("k2", Some("x"), ts(3L)))
      .toDF("k", "v", "ts")
    val got = Scd.intervals(obs, Seq("k"), "v", "ts")
      .select(col("k"), col("value"),
        unix_micros(col("valid_from")).as("f"), unix_micros(col("valid_to")).as("t"))
      .as[(String, Option[String], Long, Option[Long])].collect().toSet
    assert(got == Set(
      ("k1", Some("a"), 1000L, Some(3000L)),
      ("k1", Some("b"), 3000L, Some(4000L)),
      ("k1", Some("a"), 4000L, None),
      ("k2", None, 1000L, Some(3000L)),
      ("k2", Some("x"), 3000L, None)))
  }

  test("kg20 over the corpus: revised entities carry two intervals, others one") {
    val out = KgQueries.tripleScd(spark, "")
    val perQid = out.groupBy("qid").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(perQid(PagesGen.qid(6)) == 2L)   // population revised in crawl 2
    assert(perQid(PagesGen.qid(3)) == 1L)   // re-crawled unchanged
    assert(perQid(PagesGen.qid(5)) == 1L)   // not re-crawled
    // exactly the i%6==0 family versions twice
    val twos = perQid.filter(_._2 == 2L).keys
      .map(_.substring(1).toLong - 100000L).toSet
    assert(twos == (0L until KgQueries.nPages).filter(_ % 6 == 0).toSet)
    // open (current) intervals: exactly one per entity
    val open = out.filter(col("valid_to").isNull).groupBy("qid").count()
      .as[(String, Long)].collect()
    assert(open.forall(_._2 == 1L) && open.length == perQid.size)
  }

  test("kg22 as-of: the between-crawls probe sees crawl-1 values, after sees current") {
    val asOf = KgQueries.tripleAsOf(spark, "")
      .as[(String, String, String, Long)].collect().toSeq
    val between = asOf.filter(_._1 == "between_crawls").map(r => r._2 -> r._3).toMap
    val after = asOf.filter(_._1 == "after_crawl2").map(r => r._2 -> r._3).toMap
    // exactly one value per entity per probe (snapshots are functional)
    assert(asOf.groupBy(r => (r._1, r._2)).forall(_._2.size == 1))
    assert(between.keySet == after.keySet, "both snapshots cover every entity")
    // the i%6==0 family was revised in crawl 2: snapshots must DISAGREE
    // there and agree everywhere else
    val changed = asOf.map(_._2).distinct
      .filter(q => (q.substring(1).toLong - 100000L) % 6 == 0).toSet
    changed.foreach(q => assert(between(q) != after(q), s"$q should differ"))
    (between.keySet -- changed).foreach(q =>
      assert(between(q) == after(q), s"$q should be stable"))
    // and the between-probe values are exactly the FIRST (crawl-1) versions
    val first = KgQueries.tripleScd(spark, "")
      .filter(col("valid_from") < org.apache.spark.sql.functions.lit("2025-01-01 13:00:00").cast("timestamp"))
      .select("qid", "value").as[(String, String)].collect().toMap
    assert(between == first)
  }

  test("kg24 triple diff: exactly the two change families, added/removed paired") {
    val both = PagesGen.pages(spark, n).unionByName(PagesGen.pagesDelta(spark, n))
    val got = KgQueries.tripleDiffFrame(KgQueries.claimObservations(spark, both))
      .as[(String, String, String, String)].collect().toSeq
    def idx(q: String) = q.substring(1).toLong - 100000L
    // population revisions: one removed old + one added new P1082 per i%6==0
    val pops = got.filter(_._2 == "P1082")
    val popIdx = (0L until n).filter(_ % 6 == 0)
    assert(pops.filter(_._4 == "added").map(r => idx(r._1)).sorted == popIdx)
    assert(pops.filter(_._4 == "removed").map(r => idx(r._1)).sorted == popIdx)
    pops.filter(_._4 == "added").foreach { r =>
      assert(r._3 == s"+${2000000 + idx(r._1) % 999000}")
    }
    // old and new populations differ (the removal is real, not a re-key)
    popIdx.foreach { i =>
      val vs = pops.filter(r => idx(r._1) == i).map(_._3).distinct
      assert(vs.size == 2, s"entity $i must swap one value for another")
    }
    // new identity evidence: one added sameAs per i%24==1 (target exists)
    val same = got.filter(_._2 == PagesGen.sameAsPid)
    assert(same.forall(_._4 == "added"))
    assert(same.map(r => idx(r._1)).sorted ==
      (0L until n).filter(i => i % 24 == 1 && i + 12 < n))
    same.foreach(r => assert(r._3 == PagesGen.qid(idx(r._1) + 12)))
    // and NOTHING else changed
    assert(got.size == pops.size + same.size)
  }

  // ── incremental connected components ───────────────────────────────────

  private def assignMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("id", "component").as[(String, String)].collect().toMap

  test("incremental fold == full recompute (seeded random graphs)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nodes = (0 until 40).map(i => f"n$i%02d")
      val base = Seq.fill(25)((nodes(rnd.nextInt(40)), nodes(rnd.nextInt(40))))
        .filter(e => e._1 != e._2)
      val delta = Seq.fill(12)((nodes(rnd.nextInt(40)), nodes(rnd.nextInt(40))))
        .filter(e => e._1 != e._2)
      val baseAssign = ConnectedComponents.run(spark,
        base.toDF("src", "dst"), nodes.toDF("id"))
      val inc = assignMap(ConnectedComponents.runIncremental(spark,
        baseAssign, delta.toDF("src", "dst")))
      val full = assignMap(ConnectedComponents.run(spark,
        (base ++ delta).toDF("src", "dst"), nodes.toDF("id")))
      assert(inc == full, s"trial $trial: incremental != full recompute")
    }
  }

  test("incremental fold: delta-only nodes and re-asserted edges") {
    val baseAssign = ConnectedComponents.run(spark,
      Seq("b" -> "c").toDF("src", "dst"), Seq("a", "b", "c").toDF("id"))
    // re-assert b–c (self-loop after contraction), bridge c–a, introduce z–a
    val inc = assignMap(ConnectedComponents.runIncremental(spark, baseAssign,
      Seq("c" -> "b", "c" -> "a", "z" -> "a").toDF("src", "dst")))
    assert(inc == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "a"))
  }

  test("kg21 over the corpus: two crawl-1 twin pairs merge into one component") {
    val out = KgQueries.canonDelta(spark, "")
      .as[(String, String)].collect().toMap
    // i=25 (i%24==1) bridges pairs {24,25} and {36,37}: min id Q100024
    assert(out(PagesGen.qid(25)) == PagesGen.qid(24))
    assert(out(PagesGen.qid(36)) == PagesGen.qid(24))
    assert(out(PagesGen.qid(37)) == PagesGen.qid(24))
    // i=1 bridges {0,1} with {12,13}: crawl-1 component Q100012 is remapped
    assert(out(PagesGen.qid(13)) == PagesGen.qid(0))
    assert(out(PagesGen.qid(12)) == PagesGen.qid(0))
  }
}
