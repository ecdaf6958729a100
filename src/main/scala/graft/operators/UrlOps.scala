package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level crawl analytics — the web-corpus
  * maintenance ops a crawl pipeline runs before any content dedup (the same
  * page fetched as `HTTPS://WWW.Host:443/x?utm_source=feed#frag` and
  * `https://host/x` must collide BEFORE MinHash ever sees the bytes).
  * Generalizes the reference's url-keyed tables (urls are its primary key
  * throughout, e.g. the per-url upsert in docker/3_Add_Wikidata_to_AstraDB/
  * run.py) to the messy-url reality of an open crawl.
  *
  * The fixture corpus carries no url column, so [[withRawUrls]] derives a
  * deterministic messy url per document (mixed-case scheme/host, www
  * prefix, default :443 port, `utm_x` and `ref` tracking params in every
  * position, fragments — all keyed off doc_id so the DuckDB oracle rebuilds
  * the SAME strings and replays the canonicalizer rule-for-rule).
  *
  * 100 TB shape: the canonicalizer is a chain of codegen'd regexp_replace
  * columns — one narrow projection over the scan, zero shuffles; the host
  * rollup shuffles only (host, canon_url) scalar pairs. Every regex is
  * written to the Java∩RE2 common dialect (no lookahead/backrefs in the
  * PATTERN) so the oracle replays it exactly.
  */
object UrlOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Deterministic messy raw url for a document row (pure function of
    * doc_id/source/lang — the oracle mirrors it verbatim). */
  def rawUrl(docId: Column, source: Column, lang: Column): Column = {
    val id = docId.cast("string")
    val scheme = when(docId % 2 === 0, "HTTPS").otherwise("https")
    val www = when(docId % 3 === 0, "WWW.").otherwise("")
    val port = when(docId % 5 === 0, ":443").otherwise("")
    val host = concat(lit("Host"), (docId % 13).cast("string"), lit(".Example.com"))
    val path = concat(lit("/"), source, lit("/doc/"), id)
    val query = when(docId % 4 === 0,
        concat(lit("?utm_source=feed&id="), id, lit("&utm_campaign=x")))
      .when(docId % 4 === 1, concat(lit("?id="), id, lit("&ref="), lang))
      .when(docId % 4 === 2, lit("?utm_medium=a"))
      .otherwise(concat(lit("?id="), id))
    val frag = when(docId % 7 === 0, concat(lit("#sec"), (docId % 5).cast("string")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), www, host, port, path, query, frag)
  }

  /** Canonical form of a url: lowercase scheme+authority, default ports
    * stripped, leading `www.` stripped, fragment dropped, `utm_*`/`ref`
    * tracking params removed (with the first surviving param re-anchored to
    * `?`), dangling separators trimmed. Idempotent (spec-pinned).
    *
    * The tracking-param pass operates on the QUERY alone: the url is split
    * at the first `?`, every param is uniformly prefixed `&k=v`, tracking
    * spans are removed globally, and the first survivor is re-anchored to
    * `?`. The path is never touched — a literal `&` is a legal path
    * character (RFC 3986 pchar), and an earlier whole-url rewrite corrupted
    * `/a&b`-style paths into bogus queries (spec-pinned now).
    */
  def canonicalize(url: Column): Column = {
    // 1. lowercase scheme://authority (everything before the first /?#)
    val lowered = concat(
      lower(regexp_extract(url, "^([^/?#]*://[^/?#]*)", 1)),
      regexp_replace(url, "^[^/?#]*://[^/?#]*", ""))
    // 2. default ports ($2 = rest-of-url group; empty when non-participating)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/?#:]+):443([/?#].*)?$", "$1$2"),
      "^(http://[^/?#:]+):80([/?#].*)?$", "$1$2")
    // 3. www prefix
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // 4. fragment
    val noFrag = regexp_replace(noWww, "#.*$", "")
    // 5. split at the first '?'; the query (sans '?') is processed alone
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val rawQ = when(noFrag.contains("?"),
      regexp_replace(noFrag, "^[^?]*\\?", "")).otherwise(lit(""))
    // 6. uniform '&k=v' params → strip tracking → re-anchor to '?'; a query
    //    that was all tracking (or empty/dangling '?') vanishes entirely
    val qClean = regexp_replace(concat(lit("&"), rawQ), "&(utm_[a-z]+|ref)=[^&]*", "")
    val qOut = regexp_replace(qClean, "^&", "?")
    concat(base, when(rawQ === "", lit("")).otherwise(qOut))
  }

  /** Registrable host of a canonical url. */
  def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z]+://([^/?#]+)", 1)

  /** The documents frame extended with its deterministic raw url. */
  def withRawUrls(documents: DataFrame): DataFrame =
    documents.withColumn("raw_url",
      rawUrl(col("doc_id"), col("source"), col("lang")))

  /** w1: per-document url canonicalization — raw, canonical, host. */
  def w1UrlCanon(spark: SparkSession, dir: String): DataFrame =
    w1Frame(docs(spark, dir))

  /** [[w1UrlCanon]] over any (doc_id, source, lang) frame. */
  def w1Frame(documents: DataFrame): DataFrame =
    withRawUrls(documents).select(
      col("doc_id"),
      col("raw_url"),
      canonicalize(col("raw_url")).as("canon_url"))
      .withColumn("host", hostOf(col("canon_url")))

  /** w2: host-level rollup over canonical urls — doc count and distinct
    * canonical urls per host (the crawl-frontier / politeness view). */
  def w2HostStats(spark: SparkSession, dir: String): DataFrame =
    w1Frame(docs(spark, dir))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("canon_url")).as("n_unique_urls"))

  /** w3: host-level quality rollup + blocklist verdict (the C4/RefinedWeb
    * domain-filter step): score each document with the d5 quality signals,
    * call it bad when it is token-starved or punctuation/digit-heavy, and
    * block a host when over a quarter of its documents are bad. The bad-doc
    * and blocked predicates are written in cross-multiplied INTEGER form
    * (`10*n_punct > n_char`, `4*n_bad > n_docs`) so no rounding is involved
    * anywhere; `bad_frac` divides two exact integers, which IEEE doubles
    * reproduce bit-for-bit in any engine.
    *
    * 100 TB shape: host extraction and the quality signals are computed in
    * the SAME narrow projection over the scan (no self-join of documents
    * with their own urls), then ONE scalar-only groupBy(host) with map-side
    * partial aggregation — a host holding 10% of the crawl contributes one
    * partial row per task, not 10% of the shuffle (plan-pinned: exactly one
    * Exchange, no join).
    */
  def w3HostQuality(spark: SparkSession, dir: String): DataFrame =
    w3Frame(docs(spark, dir))

  /** w4: per-host boilerplate detection — the template-removal signal of a
    * web pipeline: for each host, the word 3-gram present in the largest
    * number of its documents (document frequency, each doc counts a gram
    * once) and the share of the host's docs carrying it. A navigation bar /
    * footer template stamped on every page of a host surfaces as a gram
    * with df_share near 1.0; `boilerplate` fires when a strict majority of
    * the host's docs share the gram.
    *
    * 100 TB shape: grams are built in-row (the d11/d12 higher-order
    * kernel), the only wide ops are the (host, gram) count — whose partial
    * aggregation collapses each task's repeats before the shuffle — and a
    * host-keyed argmax done as `min(struct(-count, gram))`, a plain
    * aggregate: NO per-host window, so a host with millions of distinct
    * grams never funnels through one partition. Ties break to the
    * lexicographically smallest gram on both engines.
    */
  def w4HostBoilerplate(spark: SparkSession, dir: String): DataFrame =
    w4Frame(docs(spark, dir))

  /** [[w4HostBoilerplate]] over any (doc_id, source, lang, text) frame. */
  def w4Frame(documents: DataFrame): DataFrame = {
    val base = documents.select(
      hostOf(canonicalize(rawUrl(col("doc_id"), col("source"), col("lang"))))
        .as("host"),
      TextAnalysis.wordsCol(col("text")).as("w"))
    val grams = base.select(
      col("host"),
      // single-pass gram kernel (round 6): bit-identical to the interpreted
      // gramsCol transform it replaces (KernelEquivalenceSpec)
      array_distinct(graft.functions.TextKernels.gramStrings(col("w"), 3)).as("grams"))
    val hostTotals = grams.groupBy("host").agg(count(lit(1)).as("n_docs"))
    // explode_outer + null filter: a plain explode would make the optimizer
    // push inferred size/isnotnull filters below the gram projection with
    // the kernel substituted (the d12 lesson, plan-pinned there)
    val counts = grams
      .select(col("host"), explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy("host", "gram")
      .agg(count(lit(1)).as("c"))
    val top = counts
      .groupBy("host")
      .agg(min(struct((-col("c")).as("negc"), col("gram").as("g"))).as("m"))
      .select(col("host"), col("m.g").as("top_gram"), (-col("m.negc")).as("n_docs_with_gram"))
    top.join(hostTotals, Seq("host"))
      .select(
        col("host"), col("top_gram"), col("n_docs_with_gram"), col("n_docs"),
        (col("n_docs_with_gram").cast("double") / col("n_docs").cast("double"))
          .as("df_share"),
        (col("n_docs_with_gram") * 2 > col("n_docs")).as("boilerplate"))
  }

  /** [[w3HostQuality]] over any (doc_id, source, lang, text) frame. */
  def w3Frame(documents: DataFrame): DataFrame = {
    val nChar = length(col("text"))
    val nTokens = TextAnalysis.tokenCount(col("text"))
    val nPunct = nChar - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    val nDigit = nChar - length(regexp_replace(col("text"), "[0-9]", ""))
    val bad = nTokens < 5 || nPunct * 10 > nChar || nDigit * 5 > nChar
    documents
      .select(
        hostOf(canonicalize(rawUrl(col("doc_id"), col("source"), col("lang"))))
          .as("host"),
        bad.cast("long").as("is_bad"))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_bad")).as("n_bad"))
      .select(
        col("host"), col("n_docs"), col("n_bad"),
        (col("n_bad").cast("double") / col("n_docs").cast("double")).as("bad_frac"),
        (col("n_bad") * 4 > col("n_docs")).as("blocked"))
  }

  /** Deterministic robots rules (rhost, rtype, rpath): host k disallows
    * path prefixes `/src{k}` and `/src{(k+7) mod 20}`, and every third host
    * ALLOWS the longer `/src{k}/doc` — an Allow nested inside a Disallowed
    * subtree, so longest-match precedence is observable on the fixture.
    * Plain arithmetic throughout, so the oracle rebuilds the identical rule
    * table with `range(13)`.
    */
  def robotsRules(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 13).flatMap { k =>
      Seq((s"host$k.example.com", "disallow", s"/src$k"),
        (s"host$k.example.com", "disallow", s"/src${(k + 7) % 20}")) ++
        (if (k % 3 == 0) Seq((s"host$k.example.com", "allow", s"/src$k/doc"))
         else Nil)
    }.toDF("rhost", "rtype", "rpath")
  }

  /** w5: robots-compliance frontier filter — the crawl stage that drops
    * urls a host's robots rules disallow. Rules are PATH-PREFIX matches
    * (real robots.txt semantics: `/src1` also covers `/src18/...`) with
    * Allow/Disallow LONGEST-MATCH precedence (RFC 9309 §2.2.2): among all
    * rules matching a path, the longest rpath wins; on equal length Allow
    * beats Disallow (the standard's least-restrictive tie rule — which is
    * also 'allow' < 'disallow' lexicographically, so one ordering handles
    * both); remaining ties break to the lexicographically smallest rpath.
    * A path matching no rule is allowed.
    *
    * 100 TB shape: the rule table is robots.txt-sized — a bounded
    * broadcast — and the match is a narrow broadcast left-join on
    * (host equality × prefix predicate) over the canonicalized scan; the
    * winner is a per-doc min(struct) AGGREGATE of scalar rows (argmax by
    * (length, type, path) — the w4 trick, no per-doc window), and a doc
    * matches at most a handful of rules so the aggregate input stays
    * O(docs).
    */
  def w5RobotsFilter(spark: SparkSession, dir: String): DataFrame =
    w5Frame(docs(spark, dir), robotsRules(spark))

  /** [[w5RobotsFilter]] over any doc frame and (rhost, rtype, rpath) rules. */
  def w5Frame(documents: DataFrame, rules: DataFrame): DataFrame = {
    val d = w1Frame(documents)
      .withColumn("path",
        regexp_extract(col("canon_url"), "^[a-z]+://[^/?#]+([^?#]*)", 1))
    d.join(broadcast(rules),
        d("host") === rules("rhost") && d("path").startsWith(rules("rpath")),
        "left")
      .groupBy("doc_id", "host", "path")
      // the whole struct is nulled for unmatched rows so min() skips them
      // (a struct OF nulls would otherwise compare and win)
      .agg(min(when(col("rpath").isNotNull,
        struct((-length(col("rpath"))).as("negl"),
          col("rtype").as("t"), col("rpath").as("p")))).as("m"))
      .select(col("doc_id"), col("host"), col("path"),
        coalesce(col("m.t") === "disallow", lit(false)).as("blocked"),
        col("m.p").as("rule"), col("m.t").as("rule_type"))
  }

  /** w6: politeness-scheduled fetch plan over the robots-filtered frontier —
    * the step after w5 in a crawler: each host's allowed urls get sequential
    * fetch slots, one fetch per `delayMs` per host (crawl-delay semantics),
    * so the whole frontier becomes an executable per-host timetable.
    *
    * 100 TB shape: the per-host `row_number` window is the one inherently
    * serial structure here — politeness IS sequential per host, so the
    * window partitioning matches the problem exactly (group count = host
    * count, cluster-wide parallel), and only (host, path, doc_id) scalars
    * enter the sort. Composes w5: blocked urls never receive a slot.
    */
  def w6FrontierSchedule(spark: SparkSession, dir: String,
                         delayMs: Long = 1000L): DataFrame =
    w6Frame(w5Frame(docs(spark, dir), robotsRules(spark)), delayMs)

  /** [[w6FrontierSchedule]] over any w5-verdict frame. */
  def w6Frame(verdicts: DataFrame, delayMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host").orderBy(col("path"), col("doc_id"))
    verdicts.filter(!col("blocked"))
      .withColumn("slot", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("host"), col("path"), col("slot"),
        ((col("slot") - 1L) * delayMs).as("fetch_at_ms"))
  }

  /** w7: crawl-budget allocation — the planning step between host quality
    * (w3) and the frontier schedule (w6): split a global fetch budget B
    * across hosts proportionally to quality-weighted demand
    * (weight = good docs = n_docs − n_bad; blocked hosts weigh 0), with the
    * largest-remainder (Hamilton) method so quotas are integers and
    * Σ quota == B EXACTLY. The entire allocation is integer arithmetic —
    * floor share = (weight·B) div W, remainder = (weight·B) mod W, the B −
    * Σfloor leftovers go to the largest remainders (ties to the smaller
    * host) — so both engines replay it bit-for-bit with no float anywhere.
    *
    * 100 TB shape: rides w3's single scalar-only groupBy(host); the totals
    * are 1-row broadcast cross joins (the KeywordSearch precedent); the
    * remainder ranking is one global sort of |hosts| SCALAR rows — hosts
    * are ~10^7 at web scale, noise next to the corpus scan (and the same
    * inherently-global step every budget allocator pays). Σ remainder ≡ 0
    * (mod W) guarantees leftovers ≤ count(rem > 0), so a zero-weight host
    * can never draw a +1.
    */
  def w7CrawlBudget(spark: SparkSession, dir: String, budget: Long = 1000L): DataFrame =
    w7Frame(w3Frame(docs(spark, dir)), budget)

  /** [[w7CrawlBudget]] over any (host, n_docs, n_bad, blocked) frame. */
  def w7Frame(hostQuality: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // eager checkpoint of the host-scalar frame: totals, floors, leftovers
    // and the final select all reuse it — without the cut, each 1-row
    // aggregate branch would re-run the upstream rollup and re-scan the
    // corpus (the self-join recompute trap; plan-pinned to ≤1 exchange)
    val w = hostQuality.select(col("host"), col("blocked"),
      when(col("blocked"), lit(0L))
        .otherwise(col("n_docs") - col("n_bad")).as("weight"))
      .localCheckpoint(true)
    val t = w.agg(sum("weight").cast("long").as("tw"))
    val b = w.crossJoin(broadcast(t))
      .select(col("host"), col("blocked"), col("weight"), col("tw"),
        when(col("tw") > 0L, expr(s"(weight * $budget) div tw"))
          .otherwise(lit(0L)).as("fl"),
        when(col("tw") > 0L, (col("weight") * lit(budget)) % col("tw"))
          .otherwise(lit(0L)).as("rem"))
    val l = b.agg(
      when(max("tw") > 0L, lit(budget) - sum("fl")).otherwise(lit(0L)).as("lo"))
    val rk = row_number().over(org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("host").asc))
    b.withColumn("rk", rk)
      .crossJoin(broadcast(l))
      .select(col("host"), col("blocked"), col("weight"),
        (col("fl") + when(col("rk") <= col("lo"), lit(1L)).otherwise(lit(0L)))
          .cast("long").as("quota"))
  }
}
