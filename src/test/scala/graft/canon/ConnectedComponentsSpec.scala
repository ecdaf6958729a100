package graft.canon

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def cc(edges: Seq[(String, String)], nodes: Seq[String]): Map[String, String] =
    ConnectedComponents.run(spark,
      edges.toDF("src", "dst"), nodes.toDF("id"))
      .as[(String, String)].collect().toMap

  test("chains, cycles, singletons resolve to min-id components") {
    val got = cc(
      edges = Seq("b" -> "c", "c" -> "d", "x" -> "y", "y" -> "x", "p" -> "q"),
      nodes = Seq("a", "b", "c", "d", "x", "y", "p", "q", "solo"))
    assert(got == Map(
      "a" -> "a", "b" -> "b", "c" -> "b", "d" -> "b",
      "x" -> "x", "y" -> "x", "p" -> "p", "q" -> "p", "solo" -> "solo"))
  }

  test("pointer jumping: a 300-hop chain converges inside the default 50-round budget") {
    // plain min-label propagation needs diameter rounds (300 > 50 would
    // throw the non-convergence guard); pointer jumping needs O(log d)
    val n = 300
    val nodes = (0 to n).map(i => f"q$i%04d")
    val edges = (0 until n).map(i => (nodes(i), nodes(i + 1)))
    val got = cc(edges, nodes)
    assert(got.values.toSet == Set(nodes.head), "chain must collapse to the min id")
  }

  test("reliable checkpoint mode (checkpointDir) == localCheckpoint mode") {
    val edges = Seq("b" -> "c", "c" -> "d", "x" -> "y", "p" -> "q").toDF("src", "dst")
    val nodes = Seq("a", "b", "c", "d", "x", "y", "p", "q").toDF("id")
    val local = ConnectedComponents.run(spark, edges, nodes)
      .as[(String, String)].collect().toMap
    val ckptDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cc-ckpt-").toString
    val reliable = ConnectedComponents.run(spark, edges, nodes, checkpointDir = Some(ckptDir))
      .as[(String, String)].collect().toMap
    assert(reliable == local)
    // reliable mode actually wrote checkpoint data (fault-tolerant path taken)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable checkpoint must persist round frames to the dir")
  }

  test("property: result invariant under edge permutation and direction (seeded fuzz)") {
    val rnd = new java.util.Random(7)
    (0 until 5).foreach { _ =>
      val n = 30
      val nodes = (0 until n).map(i => f"n$i%02d")
      val edges = (0 until 25).map { _ =>
        (nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n)))
      }.filter(e => e._1 != e._2)
      val base = cc(edges, nodes)
      val shuffled = new scala.util.Random(rnd.nextLong()).shuffle(edges.map {
        case (a, b) => if (rnd.nextBoolean()) (b, a) else (a, b)
      })
      assert(cc(shuffled, nodes) == base)
      // union-find ground truth
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: String): String = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val truth = nodes.map(x => x -> find(x)).toMap
      assert(base == truth)
    }
  }
}
