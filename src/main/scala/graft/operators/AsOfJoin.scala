package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward (latest-at-or-before) as-of join — the temporal lookup Spark
  * has no built-in operator for, composed from existing ops instead of a
  * custom physical plan: tag both inputs, union them, and run ONE window
  * pass per key ordered by (time, tag) carrying the last non-null right
  * payload forward. Right rows sort before left rows at equal timestamps,
  * which is exactly inclusive at-or-before semantics.
  *
  * Scale shape: a single shuffle (the window's partition-by on the key) and
  * a within-partition sort — no row explosion ever, unlike the
  * range-inequality theta join Catalyst would otherwise plan (broadcast
  * BNLJ or cartesian), and no per-key collect. Payloads ride as one struct
  * column each, so the sort moves each row once regardless of column count.
  * A key whose history AND probe stream are both huge lands in one
  * partition — at that skew, pre-split the key by time range with boundary
  * carry-over (same salting discipline as the J2 join); not needed at any
  * tested scale.
  *
  * Contract: right rows must be unique per (key, time) — pre-reduce ties
  * upstream (the q20 query keeps the max-orderkey row per day) or the
  * carried payload would depend on shuffle order. Returns every left row
  * (left-join semantics) with the matched right payload's fields, null when
  * no right row is at-or-before. Column sets must be disjoint.
  */
object AsOfJoin {

  def asOfBackward(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column): DataFrame = {
    val leftCols = left.columns
    val rightCols = right.columns
    require(leftCols.toSet.intersect(rightCols.toSet).isEmpty,
      s"as-of join needs disjoint column names, both sides have: " +
        leftCols.toSet.intersect(rightCols.toSet).mkString(", "))

    // payloads nested one struct per side; the absent side is a TYPED null
    // struct so the union needs no coercion
    val lType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rType = right.select(struct(rightCols.map(col): _*)).schema.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // SQL join semantics: a null key or time matches NOTHING, on either
    // side. Null-key/time LEFT rows bypass the union/window entirely and
    // are appended with a null payload at the end: routed through the
    // window they would ALL hash to the single `_k = null` partition — a
    // one-task straggler when e.g. 10% of an event stream is anonymous.
    val lNull = left.filter(leftKey.isNull || leftTime.isNull)
    val l = left.filter(leftKey.isNotNull && leftTime.isNotNull).select(
      leftKey.as("_k"), leftTime.cast("timestamp").as("_t"), lit(1).as("_tag"),
      struct(leftCols.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val r = right
      .filter(rightKey.isNotNull && rightTime.isNotNull)
      .select(
        rightKey.as("_k"), rightTime.cast("timestamp").as("_t"), lit(0).as("_tag"),
        lit(null).cast(lType).as("_l"), struct(rightCols.map(col): _*).as("_r"))
    val u = l.unionByName(r)

    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val matchedOut = matched.select(
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_m.$c").as(c)): _*)
    val bypass = lNull.select(
      leftCols.map(col) ++
        rType.fields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    matchedOut.unionByName(bypass)
  }

  /** q20: each user event joined to the user's latest at-or-before order.
    * Orders are pre-reduced to one row per (custkey, day) — max orderkey
    * wins, its totalprice carried via max_by — so the as-of contract's
    * uniqueness holds and the DuckDB `ASOF LEFT JOIN` oracle replays the
    * same deterministic choice.
    */
  def q20AsOf(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.table(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val orders = Relational.table(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        expr("max_by(o_totalprice, o_orderkey)").as("o_totalprice"))
    asOfBackward(events, orders,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts"), rightTime = col("o_orderdate"))
      .select("event_id", "ts", "user_id", "event_type",
        "o_orderkey", "o_orderdate", "o_totalprice")
  }
}
