package graft.triples

import graft.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The P/R ≥ 0.95 gate (BASELINE.md): triples extracted from the fixture
  * items must match the reference extractor's output (goldens produced by
  * running the reference's own `entity_to_statements`).
  * Match key: (qid, pid, value_content) per FIXTURES.md §4; on top of P/R we
  * assert full row equality on every reference column.
  */
class TriplesGoldenSpec extends AnyFunSuite {

  private val cols = Seq("qid", "pid", "value", "qid_label", "item_label",
    "property_label", "value_content", "statement")

  private def goldenRows(qid: String): Seq[Map[String, String]] =
    Fixtures.goldenJson(s"/goldens/triples/$qid.json").elements().asScala.map { r =>
      cols.map(c => c -> r.get(c).asText()).toMap
    }.toSeq

  private def rowsOf(t: graft.model.Triple): Map[String, String] = Map(
    "qid" -> t.qid, "pid" -> t.pid, "value" -> t.value, "qid_label" -> t.qid_label,
    "item_label" -> t.item_label, "property_label" -> t.property_label,
    "value_content" -> t.value_content, "statement" -> t.statement)

  for (item <- Fixtures.items) {
    val qid = item.get("id").asText()
    test(s"triples for $qid match the reference extractor exactly") {
      val got = Triples.fromItem(item, Fixtures.labelOf).map(rowsOf)
      val expected = goldenRows(qid)
      assert(got == expected)
    }
  }

  test("aggregate precision/recall over all fixtures >= 0.95 (is 1.0)") {
    def key(m: Map[String, String]) = (m("qid"), m("pid"), m("value_content"))
    val got = Fixtures.items.flatMap(i => Triples.fromItem(i, Fixtures.labelOf)).map(rowsOf).map(key)
    val expected = Fixtures.items.flatMap(i => goldenRows(i.get("id").asText())).map(key)
    val gotSet = got.toSet
    val expSet = expected.toSet
    val tp = gotSet.intersect(expSet).size.toDouble
    val precision = if (gotSet.isEmpty) 1.0 else tp / gotSet.size
    val recall = if (expSet.isEmpty) 1.0 else tp / expSet.size
    info(f"precision=$precision%.4f recall=$recall%.4f (${expSet.size} golden triples)")
    assert(expSet.nonEmpty)
    assert(precision >= 0.95 && recall >= 0.95)
    assert(precision == 1.0 && recall == 1.0)
  }
}
