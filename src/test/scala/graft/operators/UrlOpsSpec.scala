package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Canonicalizer semantics on planted messy urls + idempotency over the
  * generated corpus. The DuckDB oracle independently replays every rule on
  * the full corpus (w1/w2); these pin the rule DEFINITIONS on adversarial
  * cases the deterministic generator does not produce.
  */
class UrlOpsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")
    df.select(org.apache.spark.sql.functions.col("doc_id"),
        UrlOps.canonicalize(org.apache.spark.sql.functions.col("url")).as("c"))
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
  }

  test("canonicalize: case, port, www, fragment, tracking params") {
    val got = canon(
      "HTTPS://WWW.Site.COM:443/A/b?utm_source=x&id=9&utm_campaign=y#frag",
      "http://site.com:80/path",
      "https://site.com:8443/keep-nondefault-port",
      "https://a.com/p?utm_a=1&utm_b=2&id=3",       // consecutive tracking params
      "https://a.com/p?id=5&ref=mail",              // trailing tracking param
      "https://a.com/p?utm_only=1",                 // query vanishes entirely
      "https://a.com/p?href=x&preference=1",        // href/preference are NOT ref/utm
      "https://a.com/p#only-frag",
      "https://a.com/a&b?id=1",                     // literal & in PATH (RFC 3986 pchar)
      "https://a.com/a&b",                          // path &, no query at all
      "https://a.com/a&b?utm_a=1&id=2")             // path & + tracking removal
    assert(got == Seq(
      "https://site.com/A/b?id=9",                  // path case preserved
      "http://site.com/path",
      "https://site.com:8443/keep-nondefault-port", // non-default port kept
      "https://a.com/p?id=3",
      "https://a.com/p?id=5",
      "https://a.com/p",
      "https://a.com/p?href=x&preference=1",
      "https://a.com/p",
      "https://a.com/a&b?id=1",                     // path untouched
      "https://a.com/a&b",
      "https://a.com/a&b?id=2"))
  }

  test("canonicalize is idempotent over the generated corpus") {
    val w1 = UrlOps.w1Frame(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet"))
    val twice = w1.select(
      org.apache.spark.sql.functions.col("canon_url"),
      UrlOps.canonicalize(org.apache.spark.sql.functions.col("canon_url")).as("c2"))
    assert(twice.filter("canon_url <> c2").count() == 0)
  }

  test("w3 host quality: planted bad docs flip their host's blocked verdict") {
    // host is doc_id % 13 of the generated url; plant all-bad docs on host 1
    // (token-starved), mixed docs on host 2 (1 bad of 4 → not blocked)
    val docs = (Seq(
      (1L, "one two", "en", "s"), (14L, "x", "en", "s"),          // host 1: 2/2 bad
      (2L, "a clean document with plenty of words here", "en", "s"),
      (15L, "another perfectly ordinary sentence of words", "en", "s"),
      (28L, "more regular prose keeps this host healthy", "en", "s"),
      (41L, "1234567890 99 88", "en", "s")) // host 2: 1/4 bad (digit-heavy)
      ).toDF("doc_id", "text", "lang", "source")
    val got = UrlOps.w3Frame(docs)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("host1.example.com") == (("host1.example.com", 2L, 2L, 1.0, true)))
    assert(got("host2.example.com") == (("host2.example.com", 4L, 1L, 0.25, false)))
  }

  test("w4 boilerplate: a planted template gram wins its host; df counts docs once") {
    val docs = (Seq(
      // host 1: 3 of 4 docs stamped with a footer template (one repeats the
      // gram twice in-doc — must still count ONCE toward df)
      (1L, "alpha beta all rights reserved", "en", "s"),
      (14L, "all rights reserved gamma all rights reserved", "en", "s"),
      (27L, "delta epsilon all rights reserved zeta", "en", "s"),
      (40L, "nothing shared here at all", "en", "s"),
      // host 2: no repeated gram → argmax falls to lexicographic tie-break
      (2L, "bbb ccc ddd", "en", "s"),
      (15L, "aaa bbb zzz", "en", "s"),
      // host 3: every doc too short for a 3-gram → host absent from output
      (3L, "too short", "en", "s"), (16L, "also short", "en", "s"))
      ).toDF("doc_id", "text", "lang", "source")
    val got = UrlOps.w4Frame(docs)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("host1.example.com", "host2.example.com"))
    assert(got("host1.example.com") ==
      (("host1.example.com", "all rights reserved", 3L, 4L, 0.75, true)))
    // host 2: all grams df=1; smallest gram lexicographically wins
    val (_, g2, c2, n2, _, b2) = got("host2.example.com")
    assert(g2 == "aaa bbb zzz" && c2 == 1L && n2 == 2L && !b2)
  }

  test("w5 robots filter: prefix semantics, longest-match precedence, host isolation") {
    // host k disallows /src{k} and /src{(k+7)%20}; every third host allows
    // the longer /src{k}/doc. doc_id picks the host (id % 13); source picks
    // the path segment.
    val docs = Seq(
      (0L, "t", "en", "src0"),   // host 0: disallow /src0 BUT allow /src0/doc is longer → allowed
      (13L, "t", "en", "src5"),  // host 0, /src5 → no rule matches
      (7L, "t", "en", "src14"),  // host 7, /src14 → blocked (7+7=14; 7%3≠0, no allow)
      (1L, "t", "en", "src18"),  // host 1: rules /src1,/src8; /src1 PREFIX-matches /src18
      (2L, "t", "en", "src18"))  // host 2: rules /src2,/src9 → allowed
      .toDF("doc_id", "text", "lang", "source")
    val got = UrlOps.w5Frame(docs, UrlOps.robotsRules(spark))
      .select("doc_id", "blocked", "rule", "rule_type")
      .as[(Long, Boolean, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((false, Some("/src0/doc"), Some("allow"))),
      "the longer Allow must override the Disallow it nests inside")
    assert(got(13L) == ((false, None, None)))
    assert(got(7L) == ((true, Some("/src14"), Some("disallow"))))
    assert(got(1L) == ((true, Some("/src1"), Some("disallow"))),
      "robots prefix match covers /src18")
    assert(got(2L) == ((false, None, None)), "rules are per-host")
  }

  test("w5 precedence details: equal-length tie → Allow wins; longer Disallow beats shorter Allow") {
    // (two DISTINCT equal-length prefixes of one path are impossible — equal
    // length prefixes of the same string are equal — so the rpath tie-break
    // leg of the ordering is pure determinism belt, not testable semantics)
    val docs = Seq(
      (3L, "t", "en", "src3"),  // host 3: equal-length allow vs disallow
      (4L, "t", "en", "src4"))  // host 4: longer disallow vs shorter allow
      .toDF("doc_id", "text", "lang", "source")
    val rules = Seq(
      ("host3.example.com", "disallow", "/src3"),
      ("host3.example.com", "allow", "/src3"),
      ("host3.example.com", "allow", "/srcX"), // control: does not match
      ("host4.example.com", "allow", "/src4"),
      ("host4.example.com", "disallow", "/src4/doc"))
      .toDF("rhost", "rtype", "rpath")
    val got = UrlOps.w5Frame(docs, rules)
      .select("doc_id", "blocked", "rule", "rule_type")
      .as[(Long, Boolean, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(3L) == ((false, Some("/src3"), Some("allow"))),
      "RFC 9309 tie rule: equal length → least restrictive (Allow) wins")
    assert(got(4L) == ((true, Some("/src4/doc"), Some("disallow"))),
      "longest match wins regardless of type")
  }

  test("w6 frontier schedule: blocked urls get no slot, per-host slots are dense and path-ordered") {
    val sched = UrlOps.w6FrontierSchedule(spark, "/root/testdata/sf0.001")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val verdicts = UrlOps.w5RobotsFilter(spark, "/root/testdata/sf0.001")
      .select("doc_id", "blocked").as[(Long, Boolean)].collect().toMap
    // exactly the allowed urls are scheduled
    assert(sched.map(_._1).toSet == verdicts.filter(!_._2).keySet)
    sched.groupBy(_._2).foreach { case (host, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4) == (1L to rows.size), s"host=$host slots dense")
      assert(sorted.map(r => (r._3, r._1)) == rows.map(r => (r._3, r._1)).sorted,
        s"host=$host slot order is (path, doc_id)")
      assert(sorted.forall(r => r._5 == (r._4 - 1) * 1000L), s"host=$host timetable")
    }
  }

  test("w2 host rollup: every doc lands in exactly one of the 13 hosts") {
    val w2 = UrlOps.w2HostStats(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect()
    assert(w2.length == 13)
    assert(w2.map(_._2).sum == 500)
    w2.foreach { case (h, n, u) =>
      assert(h.matches("host\\d+\\.example\\.com"))
      assert(u <= n && u > 0)
    }
  }

  test("w7 budget allocation == driver largest-remainder replay; invariants hold") {
    // hand frame: blocked host, zero-weight host, remainder ties
    val hq = Seq(
      ("a.com", 70L, 10L, false), // weight 60
      ("b.com", 25L, 0L, false),  // weight 25
      ("c.com", 16L, 1L, false),  // weight 15
      ("d.com", 99L, 80L, true),  // blocked -> weight 0
      ("e.com", 5L, 5L, false))   // weight 0 (all bad, not blocked)
      .toDF("host", "n_docs", "n_bad", "blocked")
    for (budget <- Seq(0L, 1L, 7L, 100L, 997L)) {
      val got = UrlOps.w7Frame(hq, budget)
        .as[(String, Boolean, Long, Long)].collect()
        .map(r => r._1 -> r._4).toMap
      // independent replay
      val ws = Seq("a.com" -> 60L, "b.com" -> 25L, "c.com" -> 15L,
        "d.com" -> 0L, "e.com" -> 0L)
      val tw = ws.map(_._2).sum
      val fl = ws.map { case (h, w) => (h, w * budget / tw, w * budget % tw) }
      val lo = budget - fl.map(_._2).sum
      val plusOne = fl.sortBy { case (h, _, r) => (-r, h) }.take(lo.toInt).map(_._1).toSet
      val want = fl.map { case (h, f, _) => h -> (f + (if (plusOne(h)) 1L else 0L)) }.toMap
      assert(got == want, s"budget=$budget: got $got want $want")
      assert(got.values.sum == budget, s"sum must equal budget at $budget")
      assert(got("d.com") == 0L && got("e.com") == 0L)
    }
    // degenerate: every host blocked -> all quotas 0, no leftovers invented
    val allBlocked = Seq(("x.com", 5L, 5L, true)).toDF("host", "n_docs", "n_bad", "blocked")
    assert(UrlOps.w7Frame(allBlocked, 10L)
      .as[(String, Boolean, Long, Long)].collect().head._4 == 0L)
  }
}
