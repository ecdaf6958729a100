package graft.canon

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class AliasEdgesSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def labels(rows: (String, String, Seq[String], Boolean)*) =
    rows.toSeq.map { case (id, l, a, p) => (id, "en", l, p, a) }
      .toDF("id", "lang", "label", "is_property", "aliases")

  test("shared surfaces emit chains; short and hub surfaces are gated") {
    val df = labels(
      ("Q1", "Springfield Town", Seq("Springfield"), false),
      ("Q2", "Springfield", Seq.empty, false),           // shares "Springfield" with Q1
      ("Q3", "Ab", Seq("Ab"), false),                    // below minLen: no edges
      ("Q4", "Ab", Seq.empty, false),
      ("Q5", "John Smith", Seq.empty, false),            // hub surface (3 ids > maxIds)
      ("Q6", "John Smith", Seq.empty, false),
      ("Q7", "John Smith", Seq.empty, false),
      ("P1", "Springfield", Seq.empty, true)             // properties never edge
    )
    val got = AliasEdges.edges(df).as[(String, String)].collect().toSet
    assert(got == Set(("Q1", "Q2")))
  }

  test("a 3-way share under a looser maxIds emits a chain, not a clique") {
    val df = labels(
      ("Q1", "Shared Surface", Seq.empty, false),
      ("Q2", "Shared Surface", Seq.empty, false),
      ("Q3", "other", Seq("Shared Surface"), false))
    val got = AliasEdges.edges(df, maxIds = 3).as[(String, String)].collect().toSet
    assert(got == Set(("Q1", "Q2"), ("Q2", "Q3"))) // size-1 edges, no (Q1,Q3)
    // and CC still merges all three through the chain
    val cc = ConnectedComponents.run(spark,
      AliasEdges.edges(df, maxIds = 3), df.select("id"))
      .as[(String, String)].collect().toMap
    assert(Seq("Q1", "Q2", "Q3").map(cc).toSet == Set("Q1"))
  }
}
