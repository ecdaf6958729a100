package graft.streaming

import graft.SparkTestBase
import graft.operators.{KgQueries, Revisit, Scd}
import graft.pipeline.PagesGen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The streaming crawl-maintenance twins must equal their batch tables
  * byte-for-byte on the real two-crawl corpus: revisit consolidation
  * (kg19 semantics) and SCD-2 triple history (kg20 semantics), with the
  * crawls arriving as separate microbatches (one file per trigger) so the
  * open interval / running consolidation provably carries across batch
  * boundaries in GroupState. Update-mode emissions model an upsert sink;
  * "the table" is each key's last emission.
  */
class CrawlStreamSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val n = 120L

  /** Write each frame as ONE parquet file into a fresh stream dir; file
    * order = crawl order (the SessionizeStreamSpec discipline).
    */
  private def streamDir(name: String, batches: Seq[DataFrame]): String = {
    val root = Files.createTempDirectory(Paths.get("target"), s"$name-").toString
    val dir = s"$root/in"; Files.createDirectories(Paths.get(dir))
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$root/tmp-$i"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(dir, f"b$i%02d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir
  }

  private def runUpdate(out: DataFrame, name: String): DataFrame = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("revisitStream over two crawl drops == batch Revisit.latest (upsert by last emission)") {
    val c1 = Revisit.snapshotDigests(PagesGen.pages(spark, n), "html")
    val c2 = Revisit.snapshotDigests(PagesGen.pagesDelta(spark, n), "html")
    val dir = streamDir("revisit", Seq(c1, c2))
    val schema = spark.read.parquet(s"$dir/b00.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val emitted = runUpdate(CrawlStream.revisitStream(stream), "revisit_stream")
      .as[CrawlStream.RevisitRow].collect()
    // upsert semantics: n_snapshots is strictly monotone per url, so the
    // final table is each url's max-n emission
    val got = emitted.groupBy(_.url).view
      .mapValues(rs => rs.maxBy(_.n_snapshots)).values
      .map(r => (r.url, r.n_snapshots, r.first_ms, r.latest_ms, r.changed)).toSet
    val want = Revisit.latest(c1.unionByName(c2))
      .select(col("url"), col("n_snapshots"),
        unix_millis(col("first_ts")).as("f"), unix_millis(col("latest_ts")).as("l"),
        col("changed"))
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(got == want)
    // the batch boundary is real: re-crawled urls consolidated across it
    assert(want.exists(_._2 == 2L))
  }

  test("recrawlStream over two crawl drops == batch kg28 priority; tail digest carries across batches") {
    val c1 = Revisit.snapshotDigests(PagesGen.pages(spark, n), "html")
    val c2 = Revisit.snapshotDigests(PagesGen.pagesDelta(spark, n), "html")
    val dir = streamDir("recrawl", Seq(c1, c2))
    val schema = spark.read.parquet(s"$dir/b00.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val emitted = runUpdate(CrawlStream.recrawlStream(stream), "recrawl_stream")
      .as[CrawlStream.RecrawlRow].collect()
    val got = emitted.groupBy(_.url).view
      .mapValues(rs => rs.maxBy(_.n_snapshots)).values
      .map(r => (r.url, r.n_snapshots, r.n_changes, r.change_rate, r.priority)).toSet
    val want = KgQueries.recrawlPriorityFrame(c1.unionByName(c2))
      .as[(String, Long, Long, Double, String)].collect().toSet
    assert(got == want)
    // all three corpus classes crossed the batch boundary
    val pris = want.map(_._5)
    assert(pris.contains("high") && pris.contains("low") && pris.contains("unknown"))
  }

  test("scdStream over two crawl drops == batch Scd.intervals; open interval carries across batches") {
    val obs1 = KgQueries.scdObservations(spark, PagesGen.pages(spark, n))
    val obs2 = KgQueries.scdObservations(spark, PagesGen.pagesDelta(spark, n))
    val dir = streamDir("scd", Seq(obs1, obs2))
    val schema = spark.read.parquet(s"$dir/b00.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val emitted = runUpdate(CrawlStream.scdStream(stream), "scd_stream")
      .as[CrawlStream.ScdRow].collect()
    val got = emitted.groupBy(_.qid).view
      .mapValues { rs => val last = rs.map(_.n_obs).max; rs.filter(_.n_obs == last) }
      .values.flatten
      .map(r => (r.qid, r.value, r.valid_from_ms, r.valid_to_ms)).toSet
    val want = Scd.intervals(obs1.unionByName(obs2), Seq("qid"), "value", "ts")
      .select(col("qid"), col("value"),
        unix_millis(col("valid_from")).as("f"),
        unix_millis(col("valid_to")).as("t"))
      .as[(String, String, Long, Option[Long])].collect().toSet
    assert(got == want)
    // both families present: extended-in-place (1 interval despite 2 obs)
    // and versioned (the i%6==0 population revisions → 2 intervals)
    val perQid = want.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQid.values.exists(_ == 2), "expected a versioned qid")
    val twoObsOneInterval = emitted.filter(r => r.n_obs == 2 && r.valid_to_ms.isEmpty)
      .map(_.qid).toSet.exists(q => perQid(q) == 1)
    assert(twoObsOneInterval, "expected an extended-in-place open interval")
  }

  private def runAppend(out: DataFrame, name: String): DataFrame = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("frontierStream == batch w6 timetable under in-order arrival; host slot counter crosses batches") {
    val verdicts = Seq(
      (1L, "a.com", "/p1", false), (2L, "a.com", "/p2", false),
      (3L, "a.com", "/p3", false), (4L, "a.com", "/p4", false),
      (5L, "b.com", "/x", false), (6L, "b.com", "/y", false),
      (7L, "b.com", "/z", true) // blocked: never receives a slot
    ).toDF("doc_id", "host", "path", "blocked")
    val want = graft.operators.UrlOps.w6Frame(verdicts, delayMs = 1000L)
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(want.nonEmpty && !want.exists(_._1 == 7L))
    // split so each host's ARRIVAL order preserves the (path, doc_id)
    // sort: batch 1 = each host's first two slots (+ the blocked url),
    // batch 2 = the tail — a.com's docs 3/4 must then continue at slots
    // 3/4 from the carried GroupState, not restart at 1
    val b1Ids = graft.operators.UrlOps.w6Frame(verdicts, 1000L)
      .filter(col("slot") <= 2).select("doc_id").as[Long].collect().toSet
    val b1 = verdicts.filter(
      col("doc_id").isin(b1Ids.toSeq: _*) || col("blocked"))
    val b2 = verdicts.filter(
      !col("doc_id").isin(b1Ids.toSeq: _*) && !col("blocked"))
    val dir = streamDir("frontier", Seq(b1, b2))
    val stream = spark.readStream.schema(verdicts.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val got = runAppend(CrawlStream.frontierStream(stream, 1000L), "frontier_stream")
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("diffStream over two crawl drops == batch tripleDiff; base set carries across batches") {
    val obs1 = KgQueries.claimObservations(spark, PagesGen.pages(spark, n))
    val obs2 = KgQueries.claimObservations(spark, PagesGen.pagesDelta(spark, n))
    val dir = streamDir("diff", Seq(obs1, obs2))
    val schema = spark.read.parquet(s"$dir/b00.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val emitted = runUpdate(CrawlStream.diffStream(stream), "diff_stream")
      .as[CrawlStream.DiffRow].collect()
    // upsert semantics: last emission per qid is its table state (the
    // first-fetch emission is empty by construction — spot-checked below)
    val got = emitted.groupBy(_.qid).view
      .mapValues { rs => val last = rs.map(_.n_fetches).max; rs.filter(_.n_fetches == last) }
      .values.flatten
      .map(r => (r.qid, r.pid, r.value, r.change)).toSet
    val want = KgQueries.tripleDiffFrame(obs1.unionByName(obs2))
      .as[(String, String, String, String)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty, "the corpus must produce a non-empty diff")
    // the base set provably crossed the batch boundary: every emission with
    // rows is a crawl-2 (n_fetches == 2) one diffing against crawl-1 state
    assert(emitted.forall(_.n_fetches == 2L))
  }
}
