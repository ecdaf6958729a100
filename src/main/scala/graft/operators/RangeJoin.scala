package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: points ⋈ intervals with
  * `start <= t < end`, composed from existing ops — no custom physical
  * plan needed. Intervals explode to the time buckets they cover
  * (`sequence(start_us div w, (end_us - 1) div w)` — integer microsecond
  * arithmetic), points map to their single bucket, and the match becomes a
  * plain equi-join on (key, bucket) with the exact range predicate as the
  * residual filter. A point lives in exactly one bucket and an interval
  * covers each bucket at most once, so every qualifying pair meets exactly
  * once — no dedup pass.
  *
  * Why not let Catalyst take the naive path: without an equi-key a range
  * predicate alone plans as BroadcastNestedLoopJoin (quadratic); with one,
  * the shuffle join groups ALL of a key's points against ALL its intervals
  * before filtering — a hot key (one user's years of events) forms pairs
  * quadratically inside its group. Adding the bucket to the join key bounds
  * pair formation to intervals and points that overlap the same
  * `bucketUs`-wide window, which is the smallest rendezvous the range
  * predicate permits. Pick `bucketUs` ≈ typical interval length: explode
  * factor stays ~2 while groups shrink by the key's time spread.
  *
  * `pointKey`/`intervalKey` are optional (pass null for the pure
  * IP-range-lookup shape where the bucket alone is the join key). Column
  * sets must be disjoint; returns the matched pairs with both sides'
  * columns.
  */
object RangeJoin {

  def bucketedIntervalJoin(points: DataFrame, intervals: DataFrame,
                           pointTime: Column, start: Column, end: Column,
                           pointKey: Column = null, intervalKey: Column = null,
                           bucketUs: Long = 7L * 86400L * 1000000L,
                           maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require((pointKey == null) == (intervalKey == null),
      "pass both join keys or neither")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"range join needs disjoint column names, both sides have: ${shared.mkString(", ")}")

    // EXACT integer floor division at any magnitude or sign:
    // `us - pmod(us, w)` is an exact multiple of w (pmod ≥ 0), and `div`
    // of an exact multiple is the floor — a double `/` would misassign
    // buckets once |us| exceeds 2^53 (~year 2255 in microseconds), exactly
    // the malformed-timestamp regime the explosion guard below exists for.
    // The cast accepts TIMESTAMP_NTZ parquet columns, which unix_micros
    // alone rejects — identity under the session's pinned UTC.
    def micros(t: Column): Column = unix_micros(t.cast("timestamp"))
    def bucketOf(usCol: String): Column =
      expr(s"($usCol - pmod($usCol, ${bucketUs}L)) div ${bucketUs}L")
    val p = points
      .withColumn("_us", micros(pointTime))
      .withColumn("_b", bucketOf("_us")).drop("_us")
    val i = intervals
      .withColumn("_uss", micros(start))
      .withColumn("_use", micros(end) - 1)
      .withColumn("_bs", bucketOf("_uss"))
      .withColumn("_be", bucketOf("_use"))
      .drop("_uss", "_use")
      .filter(col("_bs") <= col("_be")) // empty/degenerate intervals match nothing
      // fail loudly, not OOM: one malformed open-ended interval (year-9999
      // end) would otherwise explode to millions of bucket rows. The guard
      // lives INSIDE the sequence bound so column pruning can't drop it.
      .withColumn("_be", when(col("_be") - col("_bs") >= maxBucketsPerInterval,
        raise_error(concat(lit(s"interval spans >= $maxBucketsPerInterval buckets " +
          s"of $bucketUs us; widen bucketUs or raise maxBucketsPerInterval " +
          "(interval start us: "), unix_micros(start.cast("timestamp")), lit(")")))
          .cast("long"))
        .otherwise(col("_be")))
      .withColumn("_b", explode(sequence(col("_bs"), col("_be"))))
      .drop("_bs", "_be")

    val joinCond =
      if (pointKey == null) p("_b") === i("_b")
      else p("_b") === i("_b") && pointKey === intervalKey
    p.join(i, joinCond && pointTime >= start && pointTime < end)
      .drop("_b")
  }

  /** q21: attribution windows — for each purchase, how many of the SAME
    * user's other events land in the 24h window ending at the purchase
    * (`[ts - 24h, ts)`). A self range join: intervals from the purchase
    * stream, points from everything else, key = user. Bucket width = the
    * window length, so every interval covers ≤ 2 buckets. The DuckDB
    * oracle is the plain BETWEEN theta join — independent semantics, not a
    * replay of the bucket trick.
    */
  def q21RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.table(spark, dir, "events")
    val points = events.filter(col("event_type") =!= "purchase")
      .select(col("ts"), col("user_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        (col("ts") - expr("INTERVAL 24 HOUR")).as("w_start"), col("ts").as("w_end"))
    bucketedIntervalJoin(points, purchases,
      pointTime = col("ts"), start = col("w_start"), end = col("w_end"),
      pointKey = col("user_id"), intervalKey = col("p_user"),
      bucketUs = 24L * 3600L * 1000000L)
      .groupBy("purchase_id").agg(count(lit(1)).as("n_prior_events"))
  }
}
