package graft.mention

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  test("finds leftmost-longest non-overlapping mentions with candidates") {
    val ac = AhoCorasick.build(Seq(
      "Berlin" -> Seq("Q64"),
      "Berlin Wall" -> Seq("Q5086"),
      "Wall" -> Seq("Q42"),
      "in" -> Seq("Q999")))
    val ms = ac.findMentions("the Berlin Wall stood in Berlin")
    assert(ms == Seq(
      Mention("Berlin Wall", Seq("Q5086"), 4, 15),
      Mention("in", Seq("Q999"), 22, 24),
      Mention("Berlin", Seq("Q64"), 25, 31)))
  }

  test("word boundaries: no match inside larger words") {
    val ac = AhoCorasick.build(Seq("fix" -> Seq("Q1"), "Fixture" -> Seq("Q2")))
    val ms = ac.findMentions("prefix Fixture fixtures fix.")
    assert(ms == Seq(Mention("Fixture", Seq("Q2"), 7, 14), Mention("fix", Seq("Q1"), 24, 27)))
  }

  test("ambiguous surface returns all candidate QIDs") {
    val ac = AhoCorasick.build(Seq("Alias7" -> Seq("Q1", "Q2", "Q3")))
    val ms = ac.findMentions("see Alias7 here")
    assert(ms.head.qids == Seq("Q1", "Q2", "Q3"))
  }

  test("property: matches agree with a naive leftmost-longest scan (seeded fuzz)") {
    val rnd = new java.util.Random(42)
    def randStr(len: Int, alphabet: String): String =
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

    (0 until 300).foreach { _ =>
      val pats = (0 until 2 + rnd.nextInt(5))
        .map(_ => randStr(1 + rnd.nextInt(4), "ab")).distinct
      val text = randStr(10 + rnd.nextInt(60), "ab ab ") // spaces mixed in
      val ac = AhoCorasick.build(pats.map(p => p -> Seq("X")))
      val got = ac.findMentions(text).map(m => (m.begin, m.end, m.surface))

      // naive leftmost-longest with same boundary rule
      def isW(c: Char) = Character.isLetterOrDigit(c)
      def okAt(p: String, i: Int): Boolean =
        text.startsWith(p, i) &&
          (i == 0 || !isW(text(i - 1)) || !isW(p.head)) &&
          (i + p.length >= text.length || !isW(text(i + p.length)) || !isW(p.last))
      val naive = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      var i = 0
      while (i < text.length) {
        pats.filter(okAt(_, i)).sortBy(-_.length).headOption match {
          case Some(p) => naive += ((i, i + p.length, p)); i += p.length
          case None => i += 1
        }
      }
      assert(got == naive.toSeq, s"pats=$pats text='$text'")
    }
  }
}
