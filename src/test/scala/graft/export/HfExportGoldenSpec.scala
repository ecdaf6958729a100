package graft.export

import graft.Fixtures
import graft.model.WikidataJson
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Stage-6 HF export pinned byte-exactly against the reference's OWN code:
  * tools/gen_goldens.py ast-extracts WikidataLabels.clean_entity / the
  * labels-splice chain (src/wikidataLabelsDB.py:140-318) and the docker/6
  * run.py:27-34 row dumps, executes them over dump-shaped fixtures, and this
  * spec requires every column of every row to match to the byte.
  */
class HfExportGoldenSpec extends AnyFunSuite {

  private lazy val hfItems = Fixtures.resourceOpt("/fixtures/hf_entities.jsonl").get
    .linesIterator.toSeq.flatMap(WikidataJson.parseLine)

  // labels DB analog: pass 1 harvests clean_labels for every fixture entity
  private lazy val labelsDb: Map[String, String] = hfItems.map { e =>
    e.path("id").asText() -> HfExport.dumpsCompactAscii(
      HfExport.cleanLabels(e.path("labels")))
  }.toMap
  private lazy val labelOf: String => Option[com.fasterxml.jackson.databind.JsonNode] =
    id => labelsDb.get(id).map(WikidataJson.mapper.readTree)

  private lazy val golden: Map[String, Map[String, String]] =
    Fixtures.goldenJson("/goldens/hf_export.json").elements().asScala.map { r =>
      r.get("id").asText() -> r.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }.toMap

  test("every fixture entity row matches the reference's clean_entity bytes") {
    val got = hfItems.flatMap(e => HfExport.row(e, labelOf)).map(r => r.id -> r).toMap
    assert(got.keySet == golden.keySet, "gate (is_in_wikipedia) must match")
    golden.foreach { case (id, g) =>
      val r = got(id)
      assert(r.labels == g("labels"), s"$id labels")
      assert(r.descriptions == g("descriptions"), s"$id descriptions")
      assert(r.aliases == g("aliases"), s"$id aliases")
      assert(r.sitelinks == g("sitelinks"), s"$id sitelinks")
      assert(r.claims == g("claims"), s"$id claims")
    }
  }

  test("the sitelink-only gate excludes exactly the wiki-less fixtures") {
    val gated = hfItems.filterNot(HfExport.hasWikiSitelink)
    assert(gated.nonEmpty, "fixture set must exercise the gate")
    gated.foreach(e => assert(!golden.contains(e.path("id").asText())))
  }

  test("dirty rows drop: an entity missing labels/claims exports nothing, not garbage") {
    // gate passes (has a *wiki sitelink) but labels/descriptions/aliases/
    // claims are absent — without the field guard, MissingNode fell through
    // dumpsCompactAscii's number case and exported literal "0.0" columns
    val dirty = WikidataJson.parseLine(
      """{"id":"Q666","sitelinks":{"enwiki":{"site":"enwiki","title":"T"}}}""").get
    assert(HfExport.hasWikiSitelink(dirty))
    assert(HfExport.row(dirty, _ => None).isEmpty)
    // and every clean fixture still exports (the guard drops nothing valid)
    assert(hfItems.count(e => HfExport.row(e, labelOf).isDefined) == golden.size)
  }

  test("hash-split mode: same rows as sequential, bounded splits, no global window") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val payloads = graft.pipeline.TextifyStage.payloads(
      spark, graft.pipeline.PagesGen.pages(spark, 60))
    val seq = HfExport.export(spark, payloads, rowsPerSplit = 10L)
    val hashed = HfExport.exportHashSplits(spark, payloads, nSplits = 7)
    // identical rendered rows — only the split assignment differs
    val a = seq.drop("split").collect().map(_.toSeq).toSet
    val b = hashed.drop("split").collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    val splits = hashed.select("split").as[Int].collect()
    assert(splits.forall(s => s >= 0 && s < 7))
    // the scale property: no global total order in the hash-split plan
    val plan = hashed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Window"), "hash splits must not plan a global window")
    assert(seq.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).contains("Window"),
      "sequential mode is the window path (the reference's file discipline)")
  }

  test("splice quirks: bare-string label collapse, {} miss, badges stripped") {
    val probe = golden("Q90020")
    assert(probe("claims").contains(""""datavalue":{"id":"Q90010","labels":"No Description"}"""),
      "single-language labels collapse to a bare string in the DB")
    assert(probe("claims").contains(""""property-labels":{}"""),
      "a property absent from the labels DB splices {}")
    assert(probe("claims").contains(""""unit-labels""""), "unit labels spliced")
    assert(!probe("sitelinks").contains("badges"), "sitelink badges stripped")
    // and the Scala side reproduced all of it byte-exactly (test 1), so just
    // re-assert the gate count documents the fixture coverage
    assert(golden.size == hfItems.count(HfExport.hasWikiSitelink))
  }
}
