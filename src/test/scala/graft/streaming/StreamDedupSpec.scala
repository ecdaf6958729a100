package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once projection of an at-least-once stream: the watermarked
  * streaming dedup must produce the SAME set as the batch form, and the
  * retransmission model must actually inject duplicates (otherwise the test
  * proves nothing).
  */
class StreamDedupSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dropDuplicatesWithinWatermark stream == batch dedup, duplicates real") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val base = events.count()
    val withDupes = EventsStream.withRetransmissions(events).count()
    assert(withDupes > base, "retransmission model injected no duplicates")

    val batch = EventsStream.dedupEvents(events)
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(batch.size == base, "verbatim duplicates must collapse to the original set")

    val schema = events.schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val q = EventsStream.dedupEventsStream(stream)
      .writeStream.format("memory").queryName("st2_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("st2_stream")
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(streamed == batch, "streaming dedup diverged from the batch form")
  }
}
