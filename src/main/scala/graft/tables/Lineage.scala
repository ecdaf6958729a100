package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Per-partition lineage + exactly-once stage resume (SURVEY.md §2.9, §7.1).
  *
  * Generalizes the reference's manual resume machinery (SKIPLINES line
  * offsets, SQL OFFSET, null-column filters + periodic pickles —
  * README.md:25,61, docker/3:61, docker/4:68-87) into:
  *
  *  - lineage rows: one per (stage, input snapshot, partition) with row
  *    counts and timing, appended to `<root>/_lineage` (parquet);
  *  - stage markers: `<root>/_stages/<stage>@<inputSnapshot>` written after
  *    the stage's MERGE commits. A killed job re-runs only stages without a
  *    marker for their input snapshot; MERGE idempotency makes the replay
  *    exactly-once at the table level.
  */
final class Lineage(spark: SparkSession, root: String) {

  private def stageMarker(stage: String, inputSnapshot: Long) =
    Paths.get(root, "_stages", s"$stage@$inputSnapshot")

  def isDone(stage: String, inputSnapshot: Long): Boolean =
    Files.exists(stageMarker(stage, inputSnapshot))

  def recordedOutput(stage: String, inputSnapshot: Long): Long =
    Files.readString(stageMarker(stage, inputSnapshot)).trim.toLong

  /** Capture per-partition row counts of a stage output (one cheap extra
    * aggregation over the already-computed frame).
    */
  def capture(stage: String, inputSnapshot: Long, df: DataFrame, durationMs: Long): Unit = {
    val rows = df
      .groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("row_count"))
      .withColumn("stage", lit(stage))
      .withColumn("input_snapshot", lit(inputSnapshot))
      .withColumn("duration_ms", lit(durationMs))
      .withColumn("recorded_ms", lit(System.currentTimeMillis()))
    rows.write.mode("append").parquet(s"$root/_lineage")
  }

  def markDone(stage: String, inputSnapshot: Long, outputSnapshot: Long): Unit = {
    Files.createDirectories(Paths.get(root, "_stages"))
    Files.writeString(stageMarker(stage, inputSnapshot), outputSnapshot.toString)
  }

  def lineageRows(): DataFrame = spark.read.parquet(s"$root/_lineage")

  /** Run `body` unless this (stage, inputSnapshot) already committed.
    * `body` must return the output snapshot id after its MERGE.
    */
  def runStage(stage: String, inputSnapshot: Long)(body: => Long): Long =
    if (isDone(stage, inputSnapshot)) recordedOutput(stage, inputSnapshot)
    else {
      val out = body
      markDone(stage, inputSnapshot, out)
      out
    }
}
