package graft.textify

import graft.Fixtures
import graft.model.WikidataJson
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

class ChunkerGoldenSpec extends AnyFunSuite {

  private val budgets = Seq(30, 60, 500)

  for (item <- Fixtures.items) {
    val qid = item.get("id").asText()
    test(s"chunking $qid matches the reference at budgets ${budgets.mkString("/")}") {
      val entity = WikidataJson.normalize(item, "en")
      val textifier = new Textifier(LangEn, Fixtures.labelOf)
      val tokenizer = new SimpleTokenizer(8)
      val golden = Fixtures.goldenJson(s"/goldens/chunks/$qid.json")
      budgets.foreach { b =>
        val got = Chunker.chunkText(textifier, entity, tokenizer, b)
        val expected = golden.get(b.toString).elements().asScala.map(_.asText()).toSeq
        assert(got == expected, s"budget $b")
      }
    }
  }

  test("property: every chunk respects the token budget and text is covered") {
    val tokenizer = new SimpleTokenizer(8)
    for (item <- Fixtures.items; b <- Seq(25, 40, 80, 200)) {
      val entity = WikidataJson.normalize(item, "en")
      val textifier = new Textifier(LangEn, Fixtures.labelOf)
      val chunks = Chunker.chunkText(textifier, entity, tokenizer, b)
      assert(chunks.nonEmpty)
      chunks.foreach { c =>
        // the reference slices at offsets[max-1], so a chunk is ≤ max tokens
        assert(tokenizer.tokenize(c).length <= b, s"budget $b chunk too big")
      }
    }
  }
}
