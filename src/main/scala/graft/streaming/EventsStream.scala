package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming re-expression of the reference's incremental
  * semantics (SURVEY.md §2.9): the producer/queue/consumer pipeline becomes
  * a file stream; resume offsets become checkpointed state.
  *
  * Two operators:
  *  - watermarked tumbling-window aggregation (hourly counts/sums per type);
  *  - sessionization with `flatMapGroupsWithState` (custom per-user state,
  *    30-minute gap), the KeyValueGroupedDataset custom-state path.
  *
  * Both also run in batch mode over the same frame (identical plans modulo
  * the sink), which is how the DuckDB oracle covers their logic via
  * q9_events_hourly.
  */
object EventsStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Int, sumValue: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Int, sum_value: Double)

  /** Watermarked hourly rollup of a streaming events frame. Parquet infers
    * TIMESTAMP_NTZ, which watermarks reject — cast to session-zone timestamp.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Read the events table as an AvailableNow file stream and run the hourly
    * aggregation into an in-memory sink. Returns the result after the stream
    * drains (used by tests and the streaming demo query).
    */
  def runHourlyAvailableNow(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file streams need a directory source; glob-filter to the events table
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val q = hourlyAgg(stream).writeStream
      .format("memory").queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Gap-based sessionization with custom state (30-minute inactivity). */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val ds = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // batch-mode friendly: events arrive unordered within the group
          val evs = it.toSeq.sortBy(_.ts.getTime)
          val sessions = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur: SessionState = null
          evs.foreach { e =>
            val t = e.ts.getTime
            if (cur == null) cur = SessionState(t, t, 1, e.value)
            else if (t - cur.lastSeen > gapMs) {
              sessions += Session(userId, cur.start, cur.lastSeen, cur.nEvents, cur.sumValue)
              cur = SessionState(t, t, 1, e.value)
            } else cur = cur.copy(lastSeen = t, nEvents = cur.nEvents + 1,
              sumValue = cur.sumValue + e.value)
          }
          if (cur != null)
            sessions += Session(userId, cur.start, cur.lastSeen, cur.nEvents, cur.sumValue)
          state.update(Nil)
          sessions.iterator
      }.toDF()
  }
}
