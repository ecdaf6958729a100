package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the Gopher-style repetition signals (d11) and the eval-set
  * n-gram decontamination (d12). The DuckDB oracle checks bit-parity on the
  * full corpus; these pin the DEFINITIONS on planted documents and a seeded
  * property check of the sorted-run max-multiplicity expression.
  */
class TextQualitySpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def signals(texts: (Long, String)*): Map[Long, (Int, Double, Double, Double, Boolean)] =
    TextAnalysis.d11Frame(texts.toDF("doc_id", "text"))
      .as[(Long, Int, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("d11: planted repetition — fractions match hand computation") {
    val got = signals(
      1L -> "a a a a",            // 4 words 1 distinct; 2-grams all "a a"; 3-grams dup
      2L -> "w x y z",            // all distinct
      3L -> "",                   // empty
      4L -> "solo",               // 1 word: no n-grams at all
      5L -> "p q p q p q p q")    // alternating: top 2-gram "p q" 4 of 7
    assert(got(1L) == ((4, 0.75, 1.0, 0.5, true)))
    val (n2, dw2, t2, d3, _) = got(2L)
    assert(n2 == 4 && dw2 == 0.0 && t2 == 1.0 / 3.0 && d3 == 0.0)
    assert(got(3L) == ((0, 0.0, 0.0, 0.0, false)))
    assert(got(4L) == ((1, 0.0, 0.0, 0.0, false)))
    val (n5, dw5, t5, dd5, rep5) = got(5L)
    assert(n5 == 8 && dw5 == 0.75 && t5 == 4.0 / 7.0)
    assert(dd5 == 4.0 / 6.0 && rep5) // 3-grams: pqp x3 + qpq x3 distinct 2 of 6
  }

  test("d11: max-multiplicity sorted-run expression == scala groupBy count (seeded property)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 60L).map { i =>
      val len = rnd.nextInt(12) // includes 0- and 1-word docs
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = signals(docs: _*)
    docs.foreach { case (id, text) =>
      val w = if (text.trim.isEmpty) Seq.empty[String] else text.trim.split("\\s+").toSeq
      val g2 = w.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val g3 = w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      def frac(a: Int, b: Int) = if (b == 0) 0.0 else a.toDouble / b.toDouble
      val exp = (
        w.size,
        frac(w.size - w.distinct.size, w.size),
        frac(if (g2.isEmpty) 0 else g2.groupBy(identity).values.map(_.size).max, g2.size),
        frac(g3.size - g3.distinct.size, g3.size))
      val (nw, dw, t2, d3, _) = got(id)
      assert((nw, dw, t2, d3) == exp, s"doc $id '$text'")
    }
  }

  test("d12: training docs sharing an n-gram with the eval slice are flagged; eval docs never emit") {
    // doc_id 3 is the eval doc (3 % 97 == 3)
    val out = TextAnalysis.d12Frame(Seq(
      3L -> "alpha beta gamma delta",       // eval: grams {abg, bgd}
      10L -> "zz alpha beta gamma yy",      // shares "alpha beta gamma"
      20L -> "nothing in common here at all",
      30L -> "alpha beta gamma delta"       // exact dup of eval: shares both
    ).toDF("doc_id", "text"), n = 3)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(10L, 30L))
    assert(out(10L) == ((10L, 3, 1L, 1.0 / 3.0)))
    assert(out(30L) == ((30L, 2, 2L, 1.0)))
  }

  test("d12: repeated n-grams inside one doc count once (distinct-gram contract)") {
    val out = TextAnalysis.d12Frame(Seq(
      3L -> "x y z",
      10L -> "x y z a x y z b x y z"      // "x y z" appears 3 times, counts once
    ).toDF("doc_id", "text"), n = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.toSeq == Seq((10L, 7, 1L, 1.0 / 7.0)))
  }

  test("d16 perplexity: repetitive < natural, matches hand computation, no-bigram docs flagged") {
    val docs = Seq(
      (1L, ("the cat sat " * 50).trim),                   // high-count bigrams → low score
      (2L, (1 to 100).map(i => s"w$i").mkString(" ")),    // all bigrams unique → maximal score
      (3L, "single"),                                      // no bigram
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.d16Frame(docs, keepBelow = 3.0)
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (n1, Some(s1), k1) = got(1L)
    val (n2, Some(s2), k2) = got(2L)
    assert(n1 == 149 && n2 == 99)
    assert(s1 < s2, s"repetitive ($s1) must score below natural ($s2)")
    // hand computation: T = 248; doc1 grams = {the cat: 50, cat sat: 50,
    // sat the: 49}; doc2 grams all count 1
    val t = 248.0
    val want1 = math.log(t) -
      (50 * math.log(50) + 50 * math.log(50) + 49 * math.log(49)) / 149.0
    val want2 = math.log(t)
    assert(math.abs(s1 - BigDecimal(want1).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(s2 - BigDecimal(want2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // fixed threshold 3.0: only the repetitive doc is "head" material
    assert(k1 && !k2)
    assert(got(3L) == ((0L, None, false)) && got(4L) == ((0L, None, false)))
  }

  test("d18 dup spans: planted shared spans — fractions and df match hand computation") {
    // docs 1+2 share the span "alpha beta gamma delta" (two shared 3-grams);
    // doc 3 is all-unique; doc 4 too short for a 3-gram; doc 5 empty
    val docs = Seq(
      (1L, "alpha beta gamma delta one two"),
      (2L, "x alpha beta gamma delta y"),
      (3L, "p q r s"),
      (4L, "just two"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.d18Frame(docs, flagAt = 0.5)
      .as[(Long, Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // doc1: 4 grams, 2 dup ("alpha beta gamma", "beta gamma delta")
    assert(got(1L) == ((4L, 2L, 0.5, 2L, true)))
    // doc2: 4 grams, same 2 shared
    assert(got(2L) == ((4L, 2L, 0.5, 2L, true)))
    assert(got(3L) == ((2L, 0L, 0.0, 0L, false)))
    assert(got(4L) == ((0L, 0L, 0.0, 0L, false)))
    assert(got(5L) == ((0L, 0L, 0.0, 0L, false)))
  }

  test("d18 dup spans: within-doc repeats don't count as cross-doc dupes") {
    // the gram "a b c" occurs twice in ONE doc: df_docs = 1 → not a dup
    val docs = Seq(
      (1L, "a b c z a b c"),
      (2L, "m n o p")).toDF("doc_id", "text")
    val got = TextAnalysis.d18Frame(docs, flagAt = 0.5)
      .as[(Long, Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  test("d21 span removal: covered words cut, others verbatim, within-doc repeats kept") {
    val docs = Seq(
      (1L, "alpha beta gamma delta one two"), // grams 1,2 dup → words 1-4 cut
      (2L, "x alpha beta gamma delta y"),     // grams 2,3 dup → words 2-5 cut
      (3L, "p q r s"),                        // unique: untouched
      (4L, "a b c z a b c"),                  // within-doc repeat only: untouched
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.d21Frame(docs, k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((6L, 4L, "one two")))
    assert(got(2L) == ((6L, 4L, "x y")))
    assert(got(3L) == ((4L, 0L, "p q r s")))
    assert(got(4L) == ((7L, 0L, "a b c z a b c")))
    assert(got(5L) == ((0L, 0L, "")))
  }

  test("d22 bloom flags every d12 true overlap; clean doc passes; frac exact") {
    // doc 3 is eval (3 % 97 == 3); doc 1 shares a trigram with it; doc 2 is
    // clean vocabulary (its gram positions missing the tiny planted bitset)
    val docs = Seq(
      (3L, "alpha beta gamma delta"),
      (1L, "x alpha beta gamma y"),
      (2L, "p q r s t")).toDF("doc_id", "text")
    val bloomed = TextAnalysis.d22Frame(docs, n = 3, mBits = 65536)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(bloomed.keySet == Set(1L))
    assert(bloomed(1L) == ((1L, 3, 1L, 1.0 / 3.0)))
    // superset property: the bloom never misses a true overlap (bitwise OR
    // of real positions can only ADD members) — every d12-contaminated doc
    // must appear among the bloom flags, on a larger mixed corpus
    val rnd = new scala.util.Random(20260818L)
    val corpus = (0L until 300L).map { i =>
      val words = (0 until 12).map(_ => s"w${rnd.nextInt(40)}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val exact = TextAnalysis.d12Frame(corpus, n = 3)
      .select("doc_id").as[Long].collect().toSet
    val bloom = TextAnalysis.d22Frame(corpus, n = 3, mBits = 65536)
      .select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(bloom), s"missed: ${exact -- bloom}")
  }

  test("d23 bpe pairs: counts weighted by occurrence; len-1 words skipped; tie cut by pair order") {
    val docs = Seq(
      (1L, "abab ab"), // abab -> ab, ba, ab; ab -> ab  => ab:3, ba:1
      (2L, "x yz"),    // x: no pair; yz -> yz:1
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.d23Frame(docs, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L), ("ba", 1L))) // 1-tie: ba < yz
    val all = TextAnalysis.d23Frame(docs, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("ab", 3L), ("ba", 1L), ("yz", 1L)))
  }

  test("d24 bpe apply == independent two-pass replace-chain replay; merges compress") {
    // doc 5 plants a run of 6 identical chars — the case where the defined
    // two-pass replace-chain semantics DIVERGE from a pure greedy token
    // walk ('aaaaaa' under rule (a,a): chain → [aa,a,aa,a] = 4, greedy
    // would give 3; round-5 advice — the replay below implements the chain)
    val fixture = Seq(
      (1L, "the then there"),
      (2L, "aaa aa a"),
      (3L, ""),
      (4L, "xy xy xy zq"),
      (5L, "aaaaaa"))
    val docs = fixture.toDF("doc_id", "text")
    val got = TextAnalysis.d24Frame(docs, nMerges = 4)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // independent replay: train the same ranked merge list from pair
    // counts, then tokenize with the SAME two-pass non-overlapping replace
    // chain over the separator-interspersed rendering (java String.replace
    // == the engines' non-regex replace: all non-overlapping occurrences,
    // left to right)
    val words = fixture.flatMap(_._2.trim.split("\\s+").filter(_.nonEmpty))
    val counts = words.flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merges = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(4).map(_._1)
    val SEP = "\u001f"
    def nTokens(w: String): Long = {
      var s = SEP + w.flatMap(c => s"$c$SEP")
      merges.foreach { p =>
        val cut = p.offsetByCodePoints(0, 1) // codepoint split, as the engine
        val pat = s"$SEP${p.substring(0, cut)}$SEP${p.substring(cut)}$SEP"
        val rep = s"$SEP$p$SEP"
        s = s.replace(pat, rep).replace(pat, rep)
      }
      (s.count(_ == SEP.charAt(0)) - 1).toLong
    }
    fixture.foreach { case (id, text) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val (nw, nc, nt) = (ws.size.toLong, ws.map(_.length.toLong).sum, ws.map(nTokens).sum)
      val comp = if (nc > 0) nt.toDouble / nc.toDouble else 0.0
      assert(got(id) == ((nw, nc, nt, comp)), s"doc $id: got ${got(id)}, want ($nw,$nc,$nt,$comp)")
    }
    // the trained merges must actually compress: tokens < chars somewhere
    assert(got.values.exists(v => v._3 < v._2))
    // hand-checks: "aaa" under rule (a,a) → [aa, a] = 2 tokens; doc 2 =
    // "aaa aa a" → 2 + 1 + 1 = 4. Run-of-6 doc 5: chain → 4, NOT greedy 3.
    assert(got(2L)._3 == 4L)
    assert(got(5L)._3 == 4L)
  }

  test("d24: non-BMP merge pairs split by CODEPOINT (round-5 advice)") {
    // 𝕒 (U+1D552) and 𝕓 (U+1D553) are outside the BMP: d23 pairs are
    // codepoint substrings, so the rule patterns must split the pair by
    // codepoint — a charAt (UTF-16 unit) split built lone-surrogate
    // patterns that never matched and silently disabled every merge
    val A = new String(Character.toChars(0x1D552))
    val B = new String(Character.toChars(0x1D553))
    val docs = Seq((1L, s"$A$B $A$B $A$B$A$B")).toDF("doc_id", "text")
    val got = TextAnalysis.d24Frame(docs, nMerges = 1)
      .as[(Long, Long, Long, Long, Double)].collect().head
    // words have 2+2+4 codepoints; the one trained rule is (𝕒,𝕓) with
    // count 4 → tokens [𝕒𝕓], [𝕒𝕓], [𝕒𝕓,𝕒𝕓] = 1+1+2
    assert(got._2 == 3L, s"n_words: $got")
    assert(got._3 == 8L, s"n_chars counts codepoints: $got")
    assert(got._4 == 4L, s"merges must fire on non-BMP pairs: $got")
  }

  test("d19 dsir: target-like docs outweigh off-target docs; empty docs unselected") {
    // target = lang 'en'; en-vocab and de-vocab are disjoint, so a raw 'xx'
    // doc written in en-vocab must outweigh a raw 'xx' doc in de-vocab
    val enText = "shared english corpus words here"
    val deText = "ganz andere deutsche woerter hier"
    val docs = Seq(
      (1L, enText, "en"), (2L, enText, "en"), (3L, deText, "de"),
      (4L, enText, "xx"), (5L, deText, "xx"), (6L, "", "xx"))
      .toDF("doc_id", "text", "lang")
    // at 10 target tokens the +256 add-one smoothing dominates and every
    // weight is negative (ln((c+1)/(T+256)) ratios), so the fixture's
    // select threshold sits between the two raw docs' weights instead of
    // at the full-corpus default 0.0
    val got = Dsir.d19Frame(docs, col("lang") === "en", buckets = 256,
        selectAbove = -0.5)
      .select("doc_id", "n_words", "dsir_weight", "selected")
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (n4, Some(w4), sel4) = got(4L)
    val (n5, Some(w5), sel5) = got(5L)
    assert(n4 == 5L && n5 == 5L)
    assert(w4 > w5, s"target-like ($w4) must outweigh off-target ($w5)")
    assert(sel4 && !sel5)
    assert(got(6L) == ((0L, None, false)))
    // independent replay of doc 4's weight: same md5 bucketing + smoothing
    def bucket(word: String): Long = hash60(word) % 256
    val all = Seq.fill(3)(enText.split(" ")).flatten ++
      Seq.fill(2)(deText.split(" ")).flatten
    val tgt = Seq.fill(2)(enText.split(" ")).flatten
    val rawC = all.groupBy(bucket).view.mapValues(_.size).toMap
    val tgtC = tgt.groupBy(bucket).view.mapValues(_.size).toMap
    val (rawT, tgtT) = (all.size.toDouble + 256, tgt.size.toDouble + 256)
    val want = enText.split(" ").map { w =>
      math.log((tgtC.getOrElse(bucket(w), 0) + 1) / tgtT) -
        math.log((rawC.getOrElse(bucket(w), 0) + 1) / rawT)
    }.sum / 5.0
    assert(math.abs(w4 - BigDecimal(want).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  // driver-side md5 60-bit hash (the kmvHash recipe) for the d20 replica
  private def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  // full winnowing replica: k-gram hashes, first-argmin per window of w,
  // boundary rule (short docs get one window), position-distinct
  private def winnowReplica(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.length < k) return Set.empty
    val hs = words.sliding(k).map(g => hash60(g.mkString(" "))).toVector
    val starts = 1 to math.max(hs.size - w + 1, 1)
    starts.map { i =>
      val sl = hs.slice(i - 1, math.min(i - 1 + w, hs.size))
      val pos = i - 1 + sl.indexOf(sl.min) + 1 // first-position tie-break
      (pos.toLong, hs(pos - 1))
    }.toSet
  }

  test("d20 winnowing == driver-side replica on seeded random docs") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = TextAnalysis.d20Frame(docs.toDF("doc_id", "text"), k = 3, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    docs.foreach { case (id, text) =>
      val want = winnowReplica(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id: '$text'")
    }
    // winnowing guarantee on the non-trivial docs: every w-window of gram
    // positions contains a selected one (gap coverage)
    docs.foreach { case (id, text) =>
      val nGrams = math.max(text.trim.split("\\s+").count(_.nonEmpty) - 2, 0)
      if (nGrams >= 4) {
        val ps = got(id).map(_._1).toSeq.sorted
        (1L to (nGrams - 4 + 1).toLong).foreach { i =>
          assert(ps.exists(p => p >= i && p < i + 4),
            s"doc $id: window at $i has no fingerprint")
        }
      }
    }
  }

  test("d20: a shared word run of >= w+k-1 words yields a shared fingerprint") {
    val block = "omega kappa sigma delta theta lambda" // 6 words = w+k-1
    val docs = Seq(
      (1L, s"u1 u2 u3 $block v1 v2"),
      (2L, s"z9 $block z1 z2 z3 z4")).toDF("doc_id", "text")
    val fps = TextAnalysis.d20Frame(docs, k = 3, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "the shared block must fingerprint identically in both docs")
  }

  test("d20: boundary docs — exactly k words emit one fingerprint, shorter none") {
    val docs = Seq(
      (1L, "one two three"), (2L, "just two"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.d20Frame(docs, k = 3, w = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, hash60("one two three"))))
  }
}
