package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * `Aggregator`: the buffer is the k smallest distinct 60-bit md5-prefix
  * hashes seen, so partial aggregation works map-side and only k longs per
  * group ever cross the shuffle — the bounded-memory shape `countDistinct`
  * (full dedup shuffle) and `approx_count_distinct` (opaque HLL bytes no
  * other engine can replay) don't give us together. "k smallest of the
  * union" is order- and partition-independent, so the sketch — and the
  * estimate `(k-1) / (h_k / 2^60)`, exactly two IEEE-double ops — is
  * bit-replayable by the d8 DuckDB oracle from the same md5 arithmetic.
  * Estimator: Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations" (SIGMOD'07); relative error ≈ 1/√(k−2).
  */
object Sketches {

  /** 60-bit hash = first 15 hex chars of md5 (`CAST('0x'||substring(md5(x),
    * 1,15) AS BIGINT)` in DuckDB — the dd1/dd2 signature recipe).
    */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("binary")), 1, 15), 16, 10).cast("long")

  private val TwoPow60 = 1152921504606846976.0

  /** Buffer/result = strictly-increasing sorted array of ≤ k hashes. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (ins >= k) buf // larger than the current k minima
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-merge keeping the k smallest distinct — O(k)
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { j += 1; b(j - 1) }
          else if (j >= b.length) { i += 1; a(i - 1) }
          else if (a(i) < b(j)) { i += 1; a(i - 1) }
          else if (a(i) > b(j)) { j += 1; b(j - 1) }
          else { i += 1; j += 1; a(i - 1) }
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Estimate from a sketch array column: exact size below k (the sketch
    * saw everything), else `(k-1) / (h_k / 2^60)` — division order mirrored
    * by the oracle.
    */
  def kmvEstimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(mins, k).cast("double") / lit(TwoPow60)))

  /** Count-Min bucket for hash row `r`: first 32 md5 bits of "r_token" mod
    * width — the dd-family signature recipe, replayed by the d9 oracle as
    * `CAST('0x'||substring(md5(r||'_'||t),1,8) AS BIGINT) % w`.
    */
  def cmsBucket(r: Column, t: Column, w: Int): Column =
    pmod(conv(substring(md5(
      concat(r.cast("string"), lit("_"), t).cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Count-Min counter table (r, b, cnt) over a token column `t`: d hash
    * rows × w buckets. Counters are SUMS — order-independent, mergeable by
    * addition, and (unlike SpaceSaving-style top-k structures, whose state
    * depends on arrival order) bit-replayable by any engine. Scale shape:
    * the groupBy is partial-aggregated, so at most d·w counter rows leave
    * each partition no matter how many tokens enter — the frequency
    * companion to [[KmvAgg]]'s distinct counting.
    */
  def cmsCounters(tokens: DataFrame, d: Int, w: Int): DataFrame =
    tokens
      .withColumn("r", explode(array((0 until d).map(i => lit(i)): _*)))
      .withColumn("b", cmsBucket(col("r"), col("t"), w))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))

  /** Point estimate for each probe token: min over the d rows of its
    * bucket's counter (0 when the bucket is empty) — the classic CMS upper
    * bound, never below the true count.
    */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, d: Int, w: Int): DataFrame =
    probes
      .withColumn("r", explode(array((0 until d).map(i => lit(i)): _*)))
      .withColumn("b", cmsBucket(col("r"), col("t"), w))
      .join(counters, Seq("r", "b"), "left")
      .groupBy("t").agg(min(coalesce(col("cnt"), lit(0L))).as("est_cms"))

  /** d9: CMS-estimated counts for the 20 most frequent tokens next to the
    * exact counts (ties on count broken by token; the whitespace
    * tokenization mirrors the dd1 oracle's `string_split_regex`).
    */
  def d9CmsHeavy(spark: SparkSession, dir: String, d: Int = 4, w: Int = 1024): DataFrame = {
    val tokens = Relational.table(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .persist()
    val exact = tokens.groupBy("t").agg(count(lit(1)).as("n_exact"))
    val probes = exact.orderBy(col("n_exact").desc, col("t")).limit(20)
    val out = probes
      .join(cmsEstimate(cmsCounters(tokens, d, w), probes.select("t"), d, w), Seq("t"))
      .localCheckpoint(eager = true)
    tokens.unpersist()
    out
  }

  /** d8: per-language distinct-text estimate next to the exact count (the
    * accuracy gate the oracle replays value-for-value; production use
    * would drop the exact column and with it the dedup shuffle).
    */
  def d8KmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    val hashes = Relational.table(spark, dir, "documents")
      .select(col("lang"), kmvHash(col("text")).as("h"))
      .distinct() // for the exact column only; KmvAgg dedups by itself
    hashes.groupBy("lang")
      .agg(count(lit(1)).as("n_distinct"), kmv(col("h")).as("mins"))
      .select(col("lang"), col("n_distinct"),
        kmvEstimate(col("mins"), k).as("est_kmv"))
  }
}
