package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot consolidation: a web corpus accumulates one row per
  * (url, fetch time), and every downstream KG stage wants exactly one —
  * the latest — plus the revisit signal (did the content actually change,
  * or did the crawler just re-fetch identical bytes?). This is the
  * crawl-side twin of the dedup family (reference analog: the bulk-upsert
  * "new wins" discipline of the docker run.py merge steps, lifted from
  * per-key overwrite to per-key history).
  *
  * Scale shape: the content column is projected to its 16-byte md5 digest
  * BEFORE the per-url shuffle — at 10^12 rows the consolidation groupBy
  * moves (url, ts, digest) scalars only, never page bodies (the d2/d3
  * digest-not-payload rule). One shuffle, map-side-combinable aggregates.
  */
object Revisit {

  /** (url, warc_ts, content digest) — the narrow pre-shuffle projection.
    * `contentCol` may be binary (html) or string (extracted text).
    */
  def snapshotDigests(pages: DataFrame, contentCol: String): DataFrame =
    pages.select(col("url"), col("warc_ts"),
      md5(col(contentCol).cast("binary")).as("digest"))

  /** One row per url from a multi-crawl snapshot frame (url, warc_ts,
    * digest): snapshot count, first/latest fetch time, and `changed` —
    * whether the latest content digest differs from the first. Fetch
    * times must be unique per url (crawl runs are disjoint time windows;
    * min_by/max_by would otherwise tie-break nondeterministically).
    */
  def latest(snapshots: DataFrame): DataFrame =
    snapshots
      .groupBy("url")
      .agg(
        count(lit(1)).as("n_snapshots"),
        min(col("warc_ts")).as("first_ts"),
        max(col("warc_ts")).as("latest_ts"),
        min_by(col("digest"), col("warc_ts")).as("_first_digest"),
        max_by(col("digest"), col("warc_ts")).as("_latest_digest"))
      .select(col("url"), col("n_snapshots"), col("first_ts"), col("latest_ts"),
        (col("_first_digest") =!= col("_latest_digest")).as("changed"))
}
