package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twins of the crawl-maintenance family — kg19 revisit
  * consolidation and kg20 SCD-2 triple history as AvailableNow streams over
  * per-crawl file drops, closing the last batch-only family in SURVEY §2.9:
  * an incremental deployment ingests crawl N+1 as a microbatch instead of
  * recomputing the consolidated tables from all history.
  *
  * Both operators keep per-key GroupState and emit in UPDATE mode: a
  * consolidated-latest table and a validity-interval table are TABLES, so
  * their natural streaming materialization is an upsert sink (the MERGE a
  * real deployment runs into the pages/triples MergeTables, keyed by url
  * resp. (qid, valid_from)); the memory-sink specs replay that upsert by
  * keeping each key's last emission. State is bounded: one scalar row per
  * url for revisit; per qid, the interval list — bounded by the key's
  * VERSION count (number of value changes across crawls), not by fetch
  * count, because re-assertions extend the open interval in place.
  *
  * Determinism: observations are sorted by event time inside each batch
  * (file order across batches is the crawl order), so the fold matches the
  * batch window form row-for-row; CrawlStreamSpec pins both operators
  * byte-equal to [[graft.operators.Revisit.latest]] /
  * [[graft.operators.Scd.intervals]] over the same corpus.
  */
object CrawlStream {

  final case class SnapObs(url: String, ts_ms: Long, digest: String)
  final case class RevisitState(n: Long, firstTs: Long, firstDigest: String,
                                latestTs: Long, latestDigest: String)
  final case class RevisitRow(url: String, n_snapshots: Long, first_ms: Long,
                              latest_ms: Long, changed: Boolean)

  /** kg19 as a stream: per-url consolidated row, re-emitted (upsert
    * semantics) whenever a batch touches the url. Input: a streaming
    * (url, warc_ts, digest) frame ([[graft.operators.Revisit.snapshotDigests]]
    * of the crawl drop).
    */
  def revisitStream(snapshots: DataFrame): DataFrame = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    val ds = snapshots.select(col("url"),
      unix_millis(col("warc_ts").cast("timestamp")).as("ts_ms"),
      col("digest")).as[SnapObs]
    ds.groupByKey(_.url)
      .mapGroupsWithState[RevisitState, RevisitRow](GroupStateTimeout.NoTimeout()) {
        (url, it, state) =>
          var s = state.getOption.orNull
          it.toSeq.sortBy(_.ts_ms).foreach { e =>
            s =
              if (s == null) RevisitState(1, e.ts_ms, e.digest, e.ts_ms, e.digest)
              else {
                val (ft, fd) =
                  if (e.ts_ms < s.firstTs) (e.ts_ms, e.digest)
                  else (s.firstTs, s.firstDigest)
                val (lt, ld) =
                  if (e.ts_ms > s.latestTs) (e.ts_ms, e.digest)
                  else (s.latestTs, s.latestDigest)
                RevisitState(s.n + 1, ft, fd, lt, ld)
              }
          }
          state.update(s)
          RevisitRow(url, s.n, s.firstTs, s.latestTs, s.firstDigest != s.latestDigest)
      }.toDF()
  }

  final case class RecrawlState(n: Long, nChanges: Long,
                                latestTs: Long, latestDigest: String)
  final case class RecrawlRow(url: String, n_snapshots: Long, n_changes: Long,
                              change_rate: Double, priority: String)

  /** kg28 as a stream: the recrawl-priority signal maintained incrementally
    * — consecutive-pair change counting needs only the LATEST (ts, digest)
    * in state (one scalar row per url, however long the crawl runs),
    * because crawl drops arrive in crawl order and in-batch rows are sorted
    * by fetch time, so each new snapshot compares against the running tail
    * exactly as the batch lag window does
    * ([[graft.operators.KgQueries.recrawlPriorityFrame]] — spec-pinned
    * equal). A LATE snapshot (ts ≤ the held tail) would silently
    * misattribute changes under a tail-only fold, so it fails loudly
    * instead. Emits upsert rows in UPDATE mode (keep each url's last).
    */
  def recrawlStream(snapshots: DataFrame): DataFrame = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    val ds = snapshots.select(col("url"),
      unix_millis(col("warc_ts").cast("timestamp")).as("ts_ms"),
      col("digest")).as[SnapObs]
    ds.groupByKey(_.url)
      .mapGroupsWithState[RecrawlState, RecrawlRow](GroupStateTimeout.NoTimeout()) {
        (url, it, state) =>
          var s = state.getOption.orNull
          it.toSeq.sortBy(_.ts_ms).foreach { e =>
            s =
              if (s == null) RecrawlState(1, 0, e.ts_ms, e.digest)
              else {
                require(e.ts_ms > s.latestTs,
                  s"out-of-order snapshot for $url: ${e.ts_ms} <= ${s.latestTs}")
                RecrawlState(s.n + 1,
                  s.nChanges + (if (e.digest != s.latestDigest) 1L else 0L),
                  e.ts_ms, e.digest)
              }
          }
          state.update(s)
          val rate = if (s.n > 1) s.nChanges.toDouble / (s.n - 1).toDouble else 0.0
          val pri =
            if (s.n == 1) "unknown"
            else if (rate >= 0.5) "high"
            else if (s.nChanges > 0) "medium"
            else "low"
          RecrawlRow(url, s.n, s.nChanges, rate, pri)
      }.toDF()
  }

  final case class ValueObs(qid: String, value: String, ts_ms: Long)
  final case class ScdState(closed: List[(String, Long, Long)],
                            openValue: String, openFrom: Long, nObs: Long)
  final case class ScdRow(qid: String, n_obs: Long, value: String,
                          valid_from_ms: Long, valid_to_ms: Option[Long])

  /** kg20 as a stream: flatMapGroupsWithState carries the OPEN interval
    * (plus the key's closed history) in state; a batch that re-asserts the
    * open value extends it silently, a value change closes it and opens the
    * next. Each touched key re-emits its full interval set stamped with a
    * monotone `n_obs` version (the upsert key for the sink — and the specs'
    * pick-the-last handle). Input: a streaming (qid, value, ts) frame.
    */
  def scdStream(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val ds = obs.select(col("qid"), col("value"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms")).as[ValueObs]
    ds.groupByKey(_.qid)
      .flatMapGroupsWithState[ScdState, ScdRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (qid, it, state) =>
          var closed = state.getOption.map(_.closed).getOrElse(Nil)
          var open: Option[(String, Long)] =
            state.getOption.map(s => (s.openValue, s.openFrom))
          var n = state.getOption.map(_.nObs).getOrElse(0L)
          it.toSeq.sortBy(_.ts_ms).foreach { o =>
            n += 1
            open match {
              case None => open = Some((o.value, o.ts_ms))
              // null-safe value compare: a repeated NULL observation must
              // extend, not re-version (the Scd.intervals <=> contract)
              case Some((v, _)) if java.util.Objects.equals(v, o.value) => ()
              case Some((v, f)) =>
                closed = closed :+ ((v, f, o.ts_ms))
                open = Some((o.value, o.ts_ms))
            }
          }
          val (ov, of) = open.get // nonempty: state exists only after >=1 obs
          state.update(ScdState(closed, ov, of, n))
          (closed.map(c => ScdRow(qid, n, c._1, c._2, Some(c._3))) :+
            ScdRow(qid, n, ov, of, None)).iterator
      }.toDF()
  }

  final case class FrontierUrl(doc_id: Long, host: String, path: String)
  final case class HostSlotState(nextSlot: Long)
  final case class SlotRow(doc_id: Long, host: String, path: String,
                           slot: Long, fetch_at_ms: Long)

  /** w6 as a stream: the per-host politeness timetable maintained
    * incrementally — a live crawl scheduler assigns fetch slots to urls AS
    * THEY ARRIVE instead of re-ranking the whole frontier per batch.
    * GroupState per host is ONE long (the next free slot), so state is
    * bounded by host count however long the crawl runs; each microbatch's
    * arrivals for a host are sorted (path, doc_id) — the batch timetable's
    * order — and appended at the host's tail, keeping per-host fetch times
    * gapless, monotone and `delayMs` apart across batch boundaries. When
    * per-host arrival order matches the batch sort order the emissions are
    * byte-identical to [[graft.operators.UrlOps.w6Frame]] (spec-pinned);
    * under out-of-order arrival the slots differ (a scheduler cannot
    * reorder the past) but every politeness invariant still holds. Input:
    * a streaming w5-verdict frame (doc_id, host, path, blocked); blocked
    * urls never receive a slot, as in the batch form.
    */
  def frontierStream(verdicts: DataFrame, delayMs: Long): DataFrame = {
    val spark = verdicts.sparkSession
    import spark.implicits._
    val ds = verdicts.filter(!col("blocked"))
      .select(col("doc_id"), col("host"), col("path")).as[FrontierUrl]
    ds.groupByKey(_.host)
      .flatMapGroupsWithState[HostSlotState, SlotRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host, it, state) =>
          val start = state.getOption.map(_.nextSlot).getOrElse(1L)
          val rows = it.toSeq.sortBy(r => (r.path, r.doc_id)).zipWithIndex
            .map { case (r, i) =>
              SlotRow(r.doc_id, host, r.path, start + i,
                (start + i - 1) * delayMs)
            }
          state.update(HostSlotState(start + rows.size))
          rows.iterator
      }.toDF()
  }

  final case class FactObs(qid: String, pid: String, value: String, ts_ms: Long)
  final case class DiffState(firstTs: Long, first: List[(String, String)],
                             latestTs: Long, latest: List[(String, String)],
                             nFetches: Long)
  final case class DiffRow(qid: String, n_fetches: Long, pid: String,
                           value: String, change: String)

  /** kg24 as a stream: the snapshot-to-snapshot fact DIFF maintained
    * incrementally — per qid, GroupState carries the fact set of the FIRST
    * fetch (the base state) and of the LATEST fetch; every batch that
    * touches the qid re-emits its full added/removed diff stamped with a
    * monotone fetch count (the upsert handle: a MERGE sink replaces the
    * qid's diff rows with the newest version; the first-fetch emission is
    * empty by construction, so there are no stale rows to tombstone on
    * this corpus shape). State is bounded by 2× the entity's fact count —
    * independent of how many times it is re-fetched. Input: a streaming
    * (qid, pid, value, ts) frame ([[graft.operators.KgQueries.claimObservations]]
    * of the crawl drop).
    */
  def diffStream(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val ds = obs.select(col("qid"), col("pid"), col("value"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms")).as[FactObs]
    ds.groupByKey(_.qid)
      .flatMapGroupsWithState[DiffState, DiffRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (qid, it, state) =>
          var s = state.getOption.orNull
          // a fetch = all claim rows sharing one ts; fold fetches in time
          // order so first/latest are exact whatever the batch slicing
          it.toSeq.groupBy(_.ts_ms).toSeq.sortBy(_._1).foreach { case (ts, rows) =>
            val set = rows.map(r => (r.pid, r.value)).distinct.toList
            s =
              if (s == null) DiffState(ts, set, ts, set, 1)
              else {
                val (ft, ff) =
                  if (ts < s.firstTs) (ts, set) else (s.firstTs, s.first)
                val (lt, ll) =
                  if (ts > s.latestTs) (ts, set) else (s.latestTs, s.latest)
                DiffState(ft, ff, lt, ll, s.nFetches + 1)
              }
          }
          state.update(s)
          val base = s.first.toSet
          val cur = s.latest.toSet
          ((cur -- base).toSeq.map { case (p, v) =>
            DiffRow(qid, s.nFetches, p, v, "added") } ++
            (base -- cur).toSeq.map { case (p, v) =>
              DiffRow(qid, s.nFetches, p, v, "removed") }).iterator
      }.toDF()
  }
}
