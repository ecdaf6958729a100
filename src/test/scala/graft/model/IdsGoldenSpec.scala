package graft.model

import graft.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** ID-harvest parity with the reference's `extract_entity_ids` /
  * `is_in_wikipedia` (src/wikidataDB.py:298-365), order included.
  */
class IdsGoldenSpec extends AnyFunSuite {

  for (item <- Fixtures.items) {
    val qid = item.get("id").asText()
    test(s"extract_entity_ids($qid) matches the reference, in order") {
      val golden = Fixtures.goldenJson(s"/goldens/ids/$qid.json")
      val expInWiki = golden.get("in_wikipedia").asBoolean()
      val expIds = golden.get("ids").elements().asScala.map { n =>
        IdFlag(n.get("id").asText(), n.get("in_wikipedia").asBoolean(), n.get("is_property").asBoolean())
      }.toSeq
      assert(WikidataJson.isInWikipedia(item, "en") == expInWiki)
      assert(WikidataJson.extractEntityIds(item, "en") == expIds)
    }
  }

  test("parseLine strips dump array wrappers and rejects malformed lines") {
    assert(WikidataJson.parseLine("[").isEmpty)
    assert(WikidataJson.parseLine("]").isEmpty)
    assert(WikidataJson.parseLine("""{"id":"Q1"},""").nonEmpty)
    assert(WikidataJson.parseLine("""  {"id":"Q1"} , """).nonEmpty)
    assert(WikidataJson.parseLine("""{"id": broken""").isEmpty)
  }
}
