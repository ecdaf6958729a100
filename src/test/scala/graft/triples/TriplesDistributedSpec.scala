package graft.triples

import graft.{Fixtures, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/** The distributed (join-based) triple path must agree row-for-row with the
  * pure per-item path that the goldens pin — this is the guarantee that
  * hoisting the reference's row-at-a-time label lookups into joins
  * (SURVEY.md §2.7) changed the physics, not the semantics.
  */
class TriplesDistributedSpec extends AnyFunSuite {

  test("distributed fromLines == pure fromItem on all fixtures") {
    val spark = SparkTestBase.spark
    import spark.implicits._

    val lines = spark.createDataset(Fixtures.fixtureLines)
    val labels = Fixtures.labels.toSeq.toDF("id", "label")
    val got = Triples.fromLines(spark, lines, labels)
      .as[graft.model.Triple].collect().toSeq

    val expected = Fixtures.items.flatMap(i => Triples.fromItem(i, Fixtures.labelOf))

    assert(got.map(_.uuid).sorted == expected.map(_.uuid).sorted)
    val gotByUuid = got.map(t => t.uuid -> t).toMap
    expected.foreach { e => assert(gotByUuid(e.uuid) == e, s"uuid ${e.uuid}") }
    assert(got.size == expected.size)
  }
}
