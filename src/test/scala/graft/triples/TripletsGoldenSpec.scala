package graft.triples

import graft.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** P6 gate: qualifier + reference sub-triples must match the reference
  * notebook's own `get_triplets` output (goldens produced by executing
  * Data_Sample_Preparation.ipynb cells 2/3/5 over the fixtures). JsonNode
  * equality — dict-shaped values (monolingualtext, coordinates) compare
  * structurally, null for novalue/somevalue snaks.
  */
class TripletsGoldenSpec extends AnyFunSuite {

  for (item <- Fixtures.items) {
    val qid = item.get("id").asText()
    test(s"triplets (main + qualifiers + references) for $qid match the notebook extractor") {
      val got = Triplets.toJson(Triplets.fromItem(item))
      val expected = Fixtures.goldenJson(s"/goldens/triplets/$qid.json")
      assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    }
  }

  test("aggregate sub-triple P/R over all fixtures >= 0.95 (is 1.0)") {
    def keys(qid: String, arr: com.fasterxml.jackson.databind.JsonNode): Seq[(String, String, String, String)] =
      arr.elements().asScala.zipWithIndex.flatMap { case (t, i) =>
        val pid = t.get("Property").asText()
        Seq((qid, s"$i", pid, t.get("Value").toString)) ++
          t.get("qualifiers").elements().asScala.map(q =>
            (qid, s"$i/q", q.get("Property").asText(), q.get("Value").toString)) ++
          t.get("references").elements().asScala.map(r =>
            (qid, s"$i/r", r.get("Property").asText(), r.get("Value").toString))
      }.toSeq
    val got = Fixtures.items.flatMap(i =>
      keys(i.get("id").asText(), Triplets.toJson(Triplets.fromItem(i))))
    val expected = Fixtures.items.flatMap { i =>
      val qid = i.get("id").asText()
      keys(qid, Fixtures.goldenJson(s"/goldens/triplets/$qid.json"))
    }
    val tp = got.toSet.intersect(expected.toSet).size.toDouble
    val precision = if (got.isEmpty) 1.0 else tp / got.toSet.size
    val recall = if (expected.isEmpty) 1.0 else tp / expected.toSet.size
    info(f"precision=$precision%.4f recall=$recall%.4f (${expected.toSet.size} golden sub-triples)")
    assert(expected.exists(_._2.endsWith("/r")), "fixtures must exercise references")
    assert(precision == 1.0 && recall == 1.0)
  }
}
