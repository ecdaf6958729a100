package graft.textify

import graft.Fixtures
import graft.model.WikidataJson
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** T7 gate: the alternate item chunker must match executing the reference's
  * own entity_to_item_chunks (goldens at two chunk sizes — 5 exercises the
  * skipped-chunk-id quirk, 100 the single-chunk path). Plus F8 sitelink-any.
  */
class ItemChunkerSpec extends AnyFunSuite {

  private val fields = Seq("qid", "chunk_id", "qid_chunk", "n_statements",
    "n_sitelinks", "n_descriptions", "n_lines", "item_str")

  private def asMaps(chunks: Seq[ItemChunker.ItemChunk]): Seq[Map[String, String]] =
    chunks.map(c => Map(
      "qid" -> c.qid, "chunk_id" -> c.chunk_id.toString, "qid_chunk" -> c.qid_chunk,
      "n_statements" -> c.n_statements.toString, "n_sitelinks" -> c.n_sitelinks.toString,
      "n_descriptions" -> c.n_descriptions.toString, "n_lines" -> c.n_lines.toString,
      "item_str" -> c.item_str))

  for (item <- Fixtures.items if item.path("descriptions").has("en")) {
    val qid = item.get("id").asText()
    test(s"item chunks for $qid match the reference at chunksize 5 and 100") {
      val golden = Fixtures.goldenJson(s"/goldens/itemchunks/$qid.json")
      for (cs <- Seq(5, 100)) {
        val expected = golden.get(cs.toString).elements().asScala.map { r =>
          fields.map(f => f -> r.get(f).asText()).toMap
        }.toSeq
        val got = asMaps(ItemChunker.entityToItemChunks(item, Fixtures.labelOf, "en", cs))
        assert(got == expected, s"chunksize $cs")
      }
    }
  }

  test("partial-chunk id skip quirk: ids are 0..k-1 then k+1") {
    val item = Fixtures.items.find(_.get("id").asText() == "Q90008").get
    val ids = ItemChunker.entityToItemChunks(item, Fixtures.labelOf, "en", 5).map(_.chunk_id)
    assert(ids.size > 2)
    assert(ids == (0 until ids.size - 1) :+ ids.size,
      s"expected skip-one tail, got $ids")
  }

  test("safe wrapper: label-less entity drops, labeled entity == throwing form") {
    val labeled = Fixtures.items.find(i => i.path("descriptions").has("en")).get
    val qid = labeled.get("id").asText()
    val labelOf: String => Option[String] =
      id => if (id == qid) Some("The Label") else None
    assert(asMaps(ItemChunker.entityToItemChunksSafe(labeled, labelOf)) ==
      asMaps(ItemChunker.entityToItemChunks(labeled, labelOf)))
    // same entity with NO label resolvable: the throwing form crashes
    // (reference parity), the safe form drops the row
    val noLabel: String => Option[String] = _ => None
    intercept[NoSuchElementException](ItemChunker.entityToItemChunks(labeled, noLabel))
    assert(ItemChunker.entityToItemChunksSafe(labeled, noLabel).isEmpty)
  }

  test("F8: sitelink-any filter") {
    val byId = Fixtures.items.map(i => i.get("id").asText() -> i).toMap
    assert(WikidataJson.hasAnySitelink(byId("Q90001")))
    assert(WikidataJson.hasAnySitelink(byId("Q90007")))
    assert(!WikidataJson.hasAnySitelink(byId("Q90010"))) // no sitelinks at all
  }
}
