package graft.textify

import graft.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** T13 golden parity: REST-shaped items through the same phrasing rules as
  * the reference's `convert_wikidata_item_to_statements` (executed by the
  * golden generator), including the cross-statement label-mutation quirk.
  */
class RestTextifierSpec extends AnyFunSuite {

  private val cols = Seq("qid", "pid", "value", "item_label", "property_label",
    "value_content", "statement")

  test("REST textification matches the reference row-for-row") {
    val items = Fixtures.goldenJson("/fixtures/rest_items.json")
    items.elements().asScala.foreach { item =>
      val qid = item.get("item_data").get("id").asText()
      val got = RestTextifier.itemToStatements(item, "en", Fixtures.labelOf)
        .map(r => Map("qid" -> r.qid, "pid" -> r.pid, "value" -> r.value,
          "item_label" -> r.item_label, "property_label" -> r.property_label,
          "value_content" -> r.value_content, "statement" -> r.statement))
      val expected = Fixtures.goldenJson(s"/goldens/rest/$qid.json")
        .elements().asScala.map { r => cols.map(c => c -> r.get(c).asText()).toMap }.toSeq
      assert(got == expected, s"item $qid")
    }
  }
}
