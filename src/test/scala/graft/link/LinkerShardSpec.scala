package graft.link

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The §7.4 broadcast-budget contract: when the surface dictionary outgrows
  * the budget, mention detection hash-shards it into multiple tries and
  * multiple passes — and the output must be IDENTICAL to the single-trie
  * path, including leftmost-longest overlap resolution across patterns that
  * land in different shards.
  */
class LinkerShardSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val texts = Seq(
    ("u1", "Q1", "Paris is the capital of France and Paris Saint Germain plays there"),
    ("u2", "Q2", "New York City and York share a name; New York is bigger"),
    ("u3", "Q3", "nothing matches in this one"),
    ("u4", "Q60", "New York mentions itself") // self-candidate must drop post-resolution
  ).toDF("url", "id", "text")

  private val dict = Seq(
    ("Paris", Seq("Q90")), ("Paris Saint Germain", Seq("Q483020")),
    ("France", Seq("Q142")), ("New York", Seq("Q60", "Q1384")),
    ("New York City", Seq("Q60")), ("York", Seq("Q42462"))
  ).toDF("surface", "ids")

  test("sharded multi-pass mentions == single-trie mentions") {
    val single = Linker.mentionsSharded(spark, texts, dict,
      broadcastBudgetChars = 1L << 30).collect().map(_.toString).sorted.toSeq
    // total surface chars ≈ 60 → budget 12 forces ~5 shards
    val sharded = Linker.mentionsSharded(spark, texts, dict,
      broadcastBudgetChars = 12).collect().map(_.toString).sorted.toSeq
    assert(single.nonEmpty)
    assert(sharded == single)
    // longest-match-wins must hold across shard boundaries: the second
    // "Paris" occurrence resolves to the longer "Paris Saint Germain", and
    // u2's opening "New York City" beats both "New York" and "York"
    assert(single.exists(_.contains("Paris Saint Germain")))
    assert(single.exists(s => s.contains("u2") && s.contains("New York City")))
    assert(!single.exists(s => s.contains("u2") && s.contains(",4,")), // "York" at offset 4 inside NYC span
      s"standalone York matched inside New York City: ${single.mkString("; ")}")
  }

  test("sharded mentions: reliable checkpoint mode (checkpointDir) == localCheckpoint mode") {
    // same contract ConnectedComponentsSpec pins: the fault-tolerant mode
    // must change durability only, never output — and must actually write
    val dictCols = dict
    val local = Linker.resolvedMentions(spark, texts, dictCols, broadcastBudgetChars = 12)
      .collect().map(_.toString).sorted.toSeq
    val ckptDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "linker-ckpt-").toString
    val reliable = Linker.resolvedMentions(spark, texts, dictCols,
      broadcastBudgetChars = 12, checkpointDir = Some(ckptDir))
      .collect().map(_.toString).sorted.toSeq
    assert(local.nonEmpty && reliable == local)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable mode must persist the resolved frame to the dir")
  }

  test("linkLshScored: reliable checkpoint mode == localCheckpoint mode") {
    val resolved = Linker.resolvedMentions(spark, texts, dict)
    val entityVecs = Embedder.embedDataset(
      Seq(("Q90", "Paris capital city of France"), ("Q142", "France country in Europe"),
        ("Q60", "New York City metropolis"), ("Q42462", "York city in England"))
        .toDS()).toDF("id", "vec")
    def run(dir: Option[String]) =
      Linker.linkLshScored(Linker.embedMentions(resolved), entityVecs,
        k = 3, bits = 4, tables = 2, dimLen = Embedder.dim, checkpointDir = dir)
        .collect().map(_.toString).sorted.toSeq
    val local = run(None)
    val ckptDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "lsh-ckpt-").toString
    val reliable = run(Some(ckptDir))
    assert(local.nonEmpty && reliable == local)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0)
  }

  test("explodeCandidates == the scalar reference explode over 200 seeded rows") {
    // the Catalyst filter/sort/slice/explode chain is kg2's oracle-checked
    // relational half; pin it against a direct Scala fold over adversarial
    // shapes: empty arrays, all-self, dup candidates, >50-candidate fan-out
    val rnd = new scala.util.Random(20260816L)
    val rows = (0 until 200).map { i =>
      val self = s"Q${rnd.nextInt(40)}"
      val n = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => rnd.nextInt(5)
        case 2 => 55 + rnd.nextInt(20) // above the 50 cap
        case _ => 1 + rnd.nextInt(10)
      }
      val qids = Seq.fill(n)(s"Q${rnd.nextInt(40)}") ++
        (if (rnd.nextBoolean()) Seq(self, self) else Seq.empty)
      (s"u$i", self, s"s$i", i, i + 3, qids, s"ctx$i")
    }
    val df = rows.toDF("url", "self_id", "surface", "begin", "end", "qids", "context")
    val got = Linker.explodeCandidates(df, maxCandidates = 50)
      .as[(String, String, Int, Int, String, String)].collect().sorted.toSeq
    val want = rows.flatMap { case (url, self, s, b, e, qids, ctx) =>
      qids.filter(_ != self).sorted.take(50).map(q => (url, s, b, e, q, ctx))
    }.sorted
    assert(got == want)
  }
}
