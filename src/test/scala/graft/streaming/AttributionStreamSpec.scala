package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** st3 stream-stream interval join: the watermarked streaming join must
  * produce the SAME pair set as the batch bucketed-range-join form, the
  * window semantics must match hand computation at the boundaries, and the
  * corpus must actually exercise the join (non-empty).
  */
class AttributionStreamSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("boundary semantics: window is [p - 30min, p), same user only") {
    import java.sql.Timestamp
    def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val events = Seq(
      // user 1: purchase at 10:40
      (100L, ts(40), 1L, "purchase", 1.0, ""),
      (1L, ts(10), 1L, "view", 0.0, ""),  // exactly p-30min → IN (>= start)
      (2L, ts(9), 1L, "view", 0.0, ""),   // before window → out
      (3L, ts(40), 1L, "view", 0.0, ""),  // at purchase instant → out (< p)
      (4L, ts(39), 1L, "view", 0.0, ""),  // in
      (5L, ts(25), 2L, "view", 0.0, ""))  // other user → out
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventsStream.attribution(events)
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L), (100L, 4L)))
  }

  test("streaming join == batch form on the events corpus") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val batch = EventsStream.attribution(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "corpus must exercise the attribution join")

    val stream = spark.readStream.schema(events.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val q = EventsStream.attributionStream(stream)
      .writeStream.format("memory").queryName("st3_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("st3_stream")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, "stream-stream join diverged from the batch form")
  }
}
