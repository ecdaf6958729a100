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
    // String ties compare as UTF-8 BYTES, not JVM UTF-16 code units: the
    // window form (Spark UTF8String) and DuckDB (binary collation) both
    // order byte-wise, and the two orders disagree on supplementary-plane
    // words (a UTF-16 surrogate 0xD800.. sorts before U+E000..U+FFFF, but
    // its UTF-8 bytes F0.. sort after their EF..) — a JVM-order tie-break
    // at the k boundary would keep a different word than the oracle.
    // UTF-8 byte order equals CODE POINT order, so instead of materializing
    // two UTF8Strings per comparison (this sits in the O(log k)-per-row
    // binary-search and merge hot loops), compare chars directly and remap
    // the one disagreeing range: surrogates (0xD800–0xDFFF, the UTF-16
    // halves of supplementary code points) shift above 0xFFFF so they sort
    // after every BMP char, exactly as their 4-byte UTF-8 forms do.
    // Equivalence to UTF8String.compareTo is property-pinned in TopKSpec.
    private[operators] def cmpStr(a: String, b: String): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        var ca = a.charAt(i).toInt
        var cb = b.charAt(i).toInt
        if (ca != cb) {
          if (ca >= 0xD800 && ca < 0xE000) ca += 0x2800
          if (cb >= 0xD800 && cb < 0xE000) cb += 0x2800
          return ca - cb
        }
        i += 1
      }
      a.length - b.length
    }
    private def cmp(a: (Long, String), b: (Long, String)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else cmpStr(a._2, b._2)
    }
    override def zero: Array[(Long, String)] = Array.empty

    override def reduce(buf: Array[(Long, String)], r: (Long, String)) = {
      val pos = {
        var lo = 0; var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(buf(mid), r) < 0) lo = mid + 1 else hi = mid
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
      // takes exactly one element per step with no dedup, so `out` always
      // fills completely (inputs are pre-aggregated: no duplicate keys)
      val out = new Array[(Long, String)](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length) {
        val take =
          if (i >= a.length) { j += 1; b(j - 1) }
          else if (j >= b.length) { i += 1; a(i - 1) }
          else if (cmp(a(i), b(j)) <= 0) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        out(n) = take; n += 1
      }
      out
    }

    override def finish(r: Array[(Long, String)]) = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
  }

  /** Top-k rows per group over a FULLY AGGREGATED (groupCol, word, c)
    * frame: returns (groupCol, word, n_occurrences, rank) with rank 1..k
    * by (c desc, word asc).
    */
  def perGroupTopK(counts: DataFrame, k: Int, groupCol: String = "lang"): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    counts
      .groupBy(groupCol)
      .agg(agg((-col("c")).as("negc"), col("word")).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("_pos", "_t")))
      .select(
        col(groupCol), col("_t._2").as("word"), (-col("_t._1")).as("n_occurrences"),
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
