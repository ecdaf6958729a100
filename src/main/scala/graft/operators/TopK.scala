package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact per-group top-K without a per-group window — the primitive Spark
  * lacks: `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` funnels
  * every group through ONE partition's sorter, so a 3-language corpus caps
  * at 3 tasks (the same hazard d13 avoids for prefix sums). Here the
  * selection is a typed [[Aggregator]] holding a bounded sorted buffer of
  * the k best rows: partial buffers of ≤ k rows form map-side, merge
  * associatively, and only k rows per group per partition ever cross the
  * shuffle. Correctness requires the RANKING VALUES to be final before
  * selection — for count rankings that means aggregating counts first
  * (a bounded heap over PARTIAL counts would be wrong: a word's count is
  * scattered across partitions until the groupBy completes).
  *
  * d14 applies it to per-language vocabulary: whitespace words → exact
  * (lang, word) counts → top-20 per language by count desc (word asc on
  * ties, total order on both engines). The DuckDB oracle replays the
  * selection with the row_number window it is safe to use at oracle scale.
  */
object TopK {

  /** Bounded sorted buffer of the k smallest (key, payload) pairs — the
    * ascending-(negated count, word) encoding of "top k by count". Same
    * sorted-array/merge discipline as [[Sketches.BottomKSampleAgg]].
    */
  final class TopKAgg(k: Int)
    extends Aggregator[(Long, String), Array[(Long, String)], Array[(Long, String)]] {
    private val ord = Ordering.Tuple2[Long, String]
    override def zero: Array[(Long, String)] = Array.empty

    override def reduce(buf: Array[(Long, String)], r: (Long, String)) = {
      val pos = {
        var lo = 0; var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ord.lt(buf(mid), r)) lo = mid + 1 else hi = mid
        }
        lo
      }
      if (pos >= k) buf
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[(Long, String)](n)
        System.arraycopy(buf, 0, out, 0, pos)
        out(pos) = r
        System.arraycopy(buf, pos, out, pos + 1, n - pos - 1)
        out
      }
    }

    override def merge(a: Array[(Long, String)], b: Array[(Long, String)]) = {
      val out = new Array[(Long, String)](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { j += 1; b(j - 1) }
          else if (j >= b.length) { i += 1; a(i - 1) }
          else if (ord.lteq(a(i), b(j))) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(r: Array[(Long, String)]) = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
  }

  /** Top-k rows per group over a FULLY AGGREGATED (group, word, c) frame:
    * returns (group, word, c, rank) with rank 1..k by (c desc, word asc).
    */
  def perGroupTopK(counts: DataFrame, k: Int): DataFrame = {
    val spark = counts.sparkSession
    val agg = udaf(new TopKAgg(k))
    counts
      .groupBy("lang")
      .agg(agg((-col("c")).as("negc"), col("word")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("_pos", "_t")))
      .select(
        col("lang"), col("_t._2").as("word"), (-col("_t._1")).as("n_occurrences"),
        (col("_pos") + 1L).cast("long").as("rank"))
  }

  /** d14: exact top-20 vocabulary per language. */
  def d14TopVocab(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), TextAnalysis.wordsCol(col("text")).as("w"))
      // explode_outer + null filter: the d12 lesson — a plain explode makes
      // the optimizer push inferred size/isnotnull predicates below the
      // projection with the split kernel substituted
      .select(col("lang"), explode_outer(col("w")).as("word"))
      .filter(col("word").isNotNull)
    val counts = words.groupBy("lang", "word").agg(count(lit(1)).as("c"))
    perGroupTopK(counts, k)
  }
}
