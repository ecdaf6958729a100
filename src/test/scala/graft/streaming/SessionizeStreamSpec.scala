package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The streaming sessionize contract: the open session CARRIES ACROSS
  * microbatches (a session spanning two batches must not split), closed
  * sessions emit once a later event proves the gap, and the trailing open
  * session emits via event-time timeout once the watermark passes
  * lastSeen + gap. Microbatch boundaries are forced with one file per
  * trigger.
  */
class SessionizeStreamSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val base = 1735689600000L // 2025-01-01T00:00Z
  private def ev(id: Long, offsetMin: Long, user: Long, v: Double) =
    EventsStream.Event(id, new java.sql.Timestamp(base + offsetMin * 60000L), user, "t", v)

  test("sessions merge across microbatches; closed sessions flush on watermark") {
    val root = Files.createTempDirectory(Paths.get("target"), "sess-").toString
    val streamDir = s"$root/in"; Files.createDirectories(Paths.get(streamDir))

    def writeBatch(name: String, rows: Seq[EventsStream.Event]): Unit = {
      val tmp = s"$root/tmp-$name"
      rows.toDS().toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(streamDir, name), StandardCopyOption.REPLACE_EXISTING)
    }

    // batch 1: user 1 at t+0 and t+10min (one open session)
    writeBatch("b1.parquet", Seq(ev(1, 0, 1L, 1.0), ev(2, 10, 1L, 2.0)))
    // batch 2: t+20min extends the SAME session (gap 30min); t+120min opens
    // a new one, proving the first closed
    writeBatch("b2.parquet", Seq(ev(3, 20, 1L, 3.0), ev(4, 120, 1L, 4.0)))
    // batch 3: far-future sentinel (another user) advances the watermark far
    // past every earlier session's timeout
    writeBatch("b3.parquet", Seq(ev(99, 6000, 999L, 0.0)))

    val schema = spark.read.parquet(s"$streamDir/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val q = EventsStream.sessionizeStream(stream, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sess_stream")
      .as[EventsStream.Session].collect().filter(_.user_id == 1L).sortBy(_.start_ms)

    // the cross-batch session is ONE row over events 1-3 — not split at the
    // b1/b2 boundary — and the second session closed via the sentinel's
    // watermark advance
    assert(got.map(s => (s.start_ms, s.end_ms, s.n_events, s.sum_value)).toSeq == Seq(
      (base, base + 20 * 60000L, 3, 6.0),
      (base + 120 * 60000L, base + 120 * 60000L, 1, 4.0)))

    // and the stream's user-1 sessions equal the batch operator's over the
    // union of all three files (the sentinel's own open session is the only
    // row the stream legitimately still holds in state)
    val batch = EventsStream.sessionize(spark, spark.read.parquet(streamDir))
      .as[EventsStream.Session].collect().filter(_.user_id == 1L).sortBy(_.start_ms)
    assert(got.toSeq == batch.toSeq)
  }
}
