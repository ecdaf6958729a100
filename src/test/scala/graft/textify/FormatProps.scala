package graft.textify

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks (ScalaCheck) for the format-critical kernels. */
object FormatProps extends Properties("graft.format") {

  property("PyFloat.repr round-trips every finite double") =
    forAll { (d: Double) =>
      (d.isNaN || d.isInfinite) || {
        val r = PyFloat.repr(d)
        val back = r.toDouble
        back == d || (d == 0.0 && back == 0.0)
      }
    }

  property("PyFloat.repr uses positional notation exactly in [1e-4, 1e16)") =
    forAll(Gen.chooseNum(-320, 300), Gen.chooseNum(1L, 999999L)) { (exp, mant) =>
      val d = mant.toDouble * math.pow(10, exp)
      (d.isInfinite || d == 0.0) || {
        val r = PyFloat.repr(math.abs(d))
        val hasE = r.contains("e")
        val a = math.abs(d)
        if (a >= 1e-4 && a < 1e16) !hasE else true // scientific is allowed only outside
      }
    }

  private val genTimeStr: Gen[String] = for {
    sign <- Gen.oneOf("+", "-")
    year <- Gen.chooseNum(0L, 99999L)
    month <- Gen.chooseNum(0, 13)
    day <- Gen.chooseNum(0, 32)
  } yield f"$sign$year%d-$month%02d-$day%02dT00:00:00Z"

  property("TimeText is deterministic and total (value or exception, never wrong type)") =
    forAll(genTimeStr, Gen.chooseNum(0, 14), Gen.oneOf("Q1985727", "Q1985786")) {
      (t, prec, cal) =>
        val calUrl = s"http://www.wikidata.org/entity/$cal"
        def run() = scala.util.Try(TimeText.toText(t, prec, calUrl, LangEn)).toOption
        run() == run()
    }

  property("SimpleTokenizer offsets tile the non-whitespace text exactly") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\n")))) { parts =>
      val text = parts.mkString
      val toks = new SimpleTokenizer(8).tokenize(text)
      val covered = toks.map { case (s, e) => text.substring(s, e) }.mkString
      val expected = text.filterNot(Character.isWhitespace)
      covered == expected && toks.forall { case (s, e) => e > s && e - s <= 8 }
    }

  property("PyJson escape round-trips through a JSON parser") =
    forAll { (s: String) =>
      val clean = s.filter(c => !Character.isSurrogate(c))
      val dumped = PyStr(clean).dumps
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readTree(dumped).asText() == clean
    }

  property("simhash: identical text -> distance 0; token order irrelevant") =
    forAll(Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))) { words =>
      val t1 = words.mkString(" ")
      val t2 = scala.util.Random.shuffle(words).mkString(" ")
      val s1 = graft.operators.Dedup.simhash64(t1)
      s1 == graft.operators.Dedup.simhash64(t1) &&
        s1 == graft.operators.Dedup.simhash64(t2) // bag-of-words signature
    }
}
