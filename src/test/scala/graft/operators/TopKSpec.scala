package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Bounded top-K aggregate: must equal the per-group row_number window form
  * on any input (the oracle replays that form in DuckDB), hold its tie order
  * (c desc, word asc), survive groups smaller than k, and stay identical
  * across partition counts (merge associativity).
  */
class TopKSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[(String, String, Long, Long)] =
    df.as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq

  /** The window form the aggregate replaces (fine at test scale). */
  private def windowed(counts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("word").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("word"), col("c").as("n_occurrences"), col("rank"))
  }

  test("aggregate == window form on the real corpus (k=20), and per-language rank is dense 1..20") {
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), explode(TextAnalysis.wordsCol(col("text"))).as("word"))
    val counts = words.groupBy("lang", "word").agg(count(lit(1)).as("c"))
    val got = rows(TopK.perGroupTopK(counts, 20))
    val want = rows(windowed(counts, 20))
    assert(got == want)
    got.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._4).sorted == (1L to 20L), s"lang=$lang ranks")
    }
  }

  test("ties break word-asc; groups smaller than k return all rows; stable across partition counts") {
    // g1: all-equal counts (pure tie) — top-3 must be the 3 alphabetically
    // first words. g2: only 2 rows for k=3.
    val base = Seq(
      ("g1", "delta", 5L), ("g1", "alpha", 5L), ("g1", "echo", 5L),
      ("g1", "bravo", 5L), ("g1", "charlie", 5L),
      ("g2", "solo", 9L), ("g2", "duo", 1L))
    for (nParts <- Seq(1, 2, 7)) {
      val counts = spark.createDataset(base).toDF("lang", "word", "c").repartition(nParts)
      val got = rows(TopK.perGroupTopK(counts, 3))
      assert(got == Seq(
        ("g1", "alpha", 5L, 1L), ("g1", "bravo", 5L, 2L), ("g1", "charlie", 5L, 3L),
        ("g2", "solo", 9L, 1L), ("g2", "duo", 1L, 2L)), s"nParts=$nParts")
    }
  }

  test("d14 entry: 20 rows per language, counts monotone non-increasing by rank") {
    val out = TopK.d14TopVocab(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    val byLang = out.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.size == 20, s"lang=$lang size")
      val sorted = rs.sortBy(_._4)
      sorted.sliding(2).foreach { case Seq(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"lang=$lang order at rank ${b._4}")
      }
    }
  }

  test("tie at the k boundary orders words by UTF-8 bytes, not JVM UTF-16 units") {
    // U+10000 (UTF-16 surrogate pair D800 DC00; UTF-8 F0 90 80 80) vs
    // U+FFFD (UTF-8 EF BF BD): JVM String order puts the surrogate FIRST,
    // UTF-8 byte order (Spark window / DuckDB binary collation) puts it
    // LAST — a JVM-order tie-break would keep the wrong word at k=1.
    val supp = new String(Character.toChars(0x10000))
    val counts = spark.createDataset(Seq(
      ("g", supp, 7L), ("g", "�", 7L))).toDF("lang", "word", "c")
    val got = rows(TopK.perGroupTopK(counts, 1))
    assert(got == Seq(("g", "�", 7L, 1L)))
    assert(got == rows(windowed(counts, 1)))
  }

  test("cmpStr == UTF8String.compareTo on adversarial and random strings (allocation-free hot path)") {
    import org.apache.spark.unsafe.types.UTF8String
    val agg = new TopK.TopKAgg(1)
    def ref(a: String, b: String): Int =
      Integer.signum(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    val supp = new String(Character.toChars(0x10000))
    val supp2 = new String(Character.toChars(0x10FFFF))
    val pinned = Seq("", "a", "ab", "�", "", "￿", supp, supp2,
      "a" + supp, "a￿", supp + "a", "￿" + supp, "ä", "z", "Ω", "字")
    for (a <- pinned; b <- pinned)
      assert(Integer.signum(agg.cmpStr(a, b)) == ref(a, b), s"'$a' vs '$b'")
    val rnd = new scala.util.Random(42)
    // whole code-point units only: an unpaired surrogate is not a valid
    // string (String.getBytes substitutes '?'), and parquet/UTF8String
    // inputs are always valid UTF-8
    val alphabet = Array("a", "b", "�", "", "￿", supp, supp2)
    for (_ <- 1 to 2000) {
      def gen() = Seq.fill(rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val (a, b) = (gen(), gen())
      assert(Integer.signum(agg.cmpStr(a, b)) == ref(a, b),
        s"'${a.map(_.toInt.toHexString)}' vs '${b.map(_.toInt.toHexString)}'")
    }
  }

  test("tokenizer dialect: U+000B is NOT a separator (RE2 \\s parity with the oracle)") {
    // Java's \s matches vertical tab, RE2's does not — the engine spells
    // out the RE2 class so both sides see a-VT-b as ONE token.
    val df = spark.createDataset(Seq("a\u000bb c")).toDF("text")
      .select(TextAnalysis.wordsCol(col("text")).as("w"),
        TextAnalysis.tokenCount(col("text")).as("n"))
    val (w, n) = df.as[(Seq[String], Int)].head()
    assert(w == Seq("a\u000bb", "c") && n == 2)
  }

  test("plan: no window over the full counts — selection is a partial-merge aggregate") {
    val counts = spark.createDataset(Seq(("g", "w", 1L))).toDF("lang", "word", "c")
    val plan = TopK.perGroupTopK(counts, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-K must not use a per-group window")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate") ||
      plan.contains("HashAggregate"), "expected an aggregate-based selection")
  }
}
