package graft.pipeline

import graft.canon.ConnectedComponents
import graft.link.{Embedder, Linker}
import graft.model.WikidataJson
import graft.tables.{Lineage, MergeTable}
import graft.triples.Triples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG construction over the pages corpus (north_star / SURVEY.md
  * §7.1): extract → harvest → textify → mention → link → triples →
  * canonicalize → materialize nodes/edges/triples, every stage checkpointed
  * with per-partition lineage rows and MERGE-idempotent writes so a killed
  * job resumes exactly (stage markers keyed by input snapshot).
  *
  * Wide operations, by stage:
  *  - harvest:  groupBy(id) (S7 OR-merge agg) — one shuffle
  *  - textify:  gather-join on (url, ref) — shuffle O(#references)
  *  - link:     equi-join mention→entity vec + top-K window
  *  - triples:  label joins (broadcast PID dim + shuffle subject/value)
  *  - canon:    iterative CC self-joins
  * Everything else is narrow and pipelines into the scan.
  */
/** @param retention when set, every successful `run`/`ingest` ends with
  *   [[expireHistory]]`(keepLast = retention.get)` — the storage-bound
  *   mode for incremental deployments. Opt-in (None keeps full history)
  *   because expiry trades time travel into reclaimed snapshots away.
  */
final class KgPipeline(spark: SparkSession, root: String,
                       nPages: Long = 2000, linkK: Int = 5,
                       failAfterStage: Option[String] = None,
                       mentionBudgetChars: Long = Linker.DefaultBroadcastBudgetChars,
                       aliasEdgeMaxIds: Option[Int] = None,
                       retention: Option[Int] = None) {
  import spark.implicits._

  // fail at construction, not after a full run: the expiry sweep's own
  // require(keepLast >= 1) would otherwise fire only during the run-end
  // maintenance pass, throwing away a completed pipeline's worth of work
  require(retention.forall(_ >= 1),
    s"retention must be >= 1 when set, got ${retention.get}")

  val pagesTbl = new MergeTable(spark, s"$root/pages", Seq("url"))
  // NOTE: keyed (id, lang) since the per-language label dimension landed —
  // a `labels` table written by the earlier id-keyed layout is NOT readable
  // in place (different bucket hashing + schema). MergeTable.validateLayout
  // enforces this: a mismatched OR unstamped on-disk bucketCols is a hard
  // error, so pointing new code at a legacy root fails fast instead of
  // silently mis-bucketing merges.
  val labelsTbl = new MergeTable(spark, s"$root/labels", Seq("id", "lang"))
  val idFlagsTbl = new MergeTable(spark, s"$root/id_flags", Seq("id"))
  // per-page tables are SCOPED by their page: re-processing a page REPLACES
  // all of its rows, so outputs that shrink (fewer mentions/chunks/triples
  // after an edit) shed their stale rows instead of merging around them
  val textsTbl = new MergeTable(spark, s"$root/texts", Seq("url"),
    scopeCols = Some(Seq("url")))
  val mentionsTbl = new MergeTable(spark, s"$root/mentions", Seq("url", "begin", "qid"),
    scopeCols = Some(Seq("url")))
  val linksTbl = new MergeTable(spark, s"$root/links", Seq("url", "begin", "rank"),
    scopeCols = Some(Seq("url")))
  val triplesTbl = new MergeTable(spark, s"$root/triples", Seq("uuid"),
    scopeCols = Some(Seq("qid")))
  val docsTbl = new MergeTable(spark, s"$root/docs", Seq("doc_id"),
    scopeCols = Some(Seq("qid")))
  val vecsTbl = new MergeTable(spark, s"$root/entity_vecs", Seq("id"),
    scopeCols = Some(Seq("id")))
  val sameAsTbl = new MergeTable(spark, s"$root/sameas", Seq("src", "dst"),
    scopeCols = Some(Seq("src")))
  // derived global artifacts are recomputed wholesale -> replace, not merge
  val canonTbl = new MergeTable(spark, s"$root/canon", Seq("id"))
  val nodesTbl = new MergeTable(spark, s"$root/nodes", Seq("id"))
  val edgesTbl = new MergeTable(spark, s"$root/edges", Seq("src", "dst", "kind"))
  val lineage = new Lineage(spark, root)

  private def checkFail(stage: String): Unit =
    if (failAfterStage.contains(stage))
      throw new RuntimeException(s"injected failure after stage $stage")

  /** Run (or resume) the pipeline; returns the triples snapshot id. */
  def run(): Long = {
    // stage: ingest — the corpus lands as a MERGE table (idempotent by url)
    val pagesSnap = lineage.runStage("ingest", 0L) {
      val t0 = System.nanoTime()
      val df = PagesGen.pages(spark, nPages)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = pagesTbl.merge(df)
      lineage.capture("ingest", 0L, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("ingest")
    val out = runFrom(pagesSnap)
    retention.foreach(expireHistory(_))
    out
  }

  /** Incremental ingest: MERGE a batch of new/changed pages (upsert by url)
    * and run the downstream stages against the new pages snapshot (stage
    * markers are per input snapshot, so the chain executes exactly once).
    *
    * `delta = false` (exactness mode): every derived stage recomputes over
    * the merged corpus; MERGE-upserts converge — unchanged rows rewrite to
    * identical values (deterministic ids), changed/new rows update in place.
    *
    * `delta = true` (10^12-scale mode): per-page stages (textify, mentions,
    * link, docs, triples) process ONLY the batch's pages and MERGE their
    * rows; global artifacts (id-flag OR-merge, canonicalization, edges)
    * update from the materialized tables, never by re-reading the corpus.
    * Contract: per-page outputs of untouched pages are left as-is — a label
    * added by this batch starts matching in pages processed from now on
    * (exactly the reference's two-pass semantics, where the dictionary is
    * frozen before stage 3), and links cached against an entity whose text
    * this batch changed refresh only when their page is next touched.
    */
  def ingest(newPages: org.apache.spark.sql.DataFrame, delta: Boolean = false): Long = {
    val pagesSnap = pagesTbl.merge(newPages)
    val out = if (delta) runDelta(newPages, pagesSnap) else runFrom(pagesSnap)
    retention.foreach(expireHistory(_))
    out
  }

  /** All of the pipeline's tables, for maintenance sweeps. */
  def tables: Seq[MergeTable] = Seq(pagesTbl, labelsTbl, idFlagsTbl, textsTbl,
    mentionsTbl, linksTbl, triplesTbl, docsTbl, vecsTbl, sameAsTbl,
    canonTbl, nodesTbl, edgesTbl)

  /** Run-end table maintenance: expire every table's snapshot history down
    * to its newest `keepLast` manifests (reachability GC —
    * [[MergeTable.expireSnapshots]]). Safe AFTER a successful run: every
    * stage reads tables at their CURRENT snapshot (stage markers gate on
    * ids, not on historical reads), and the current snapshot always
    * survives — only time travel into reclaimed history is lost. Without
    * this sweep an incremental deployment grows by its churn rate forever.
    * Returns (expired manifests, deleted snapshot dirs) across all tables.
    */
  def expireHistory(keepLast: Int = 2): (Int, Int) = {
    val results = tables.filter(_.exists).map(_.expireSnapshots(keepLast))
    (results.map(_._1.size).sum, results.map(_._2.size).sum)
  }

  private def runFrom(pagesSnap: Long): Long = {

    // Option-backed memo instead of lazy vals: the finally block below must
    // unpersist ONLY what a stage actually forced (unpersisting a lazy would
    // first materialize it), and it must run on the failure path too — a
    // killed/failed ingest in a long-lived driver must not leak the cached
    // corpus frames (failAfterStage exercises exactly this path).
    var payloadsRef: Option[org.apache.spark.sql.Dataset[PagePayload]] = None
    def payloads = payloadsRef.getOrElse {
      val p = TextifyStage.payloads(spark, pagesTbl.read()).persist()
      payloadsRef = Some(p); p
    }
    var resolvedRef: Option[org.apache.spark.sql.Dataset[(PagePayload, Map[String, String])]] = None
    try {

    // stage: harvest — per-language label dimension (id, lang, label,
    // is_property, aliases) from the corpus itself: the reference normalizes
    // the whole DB once per LANGUAGE (src/wikidataDB.py:126-148)
    val labelsSnap = lineage.runStage("harvest", pagesSnap) {
      val t0 = System.nanoTime()
      val df = TextifyStage.harvestLabels(spark, payloads)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = labelsTbl.merge(df)
      lineage.capture("harvest", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("harvest")

    // stage: harvest_ids — P1 explode + S7 OR-merge aggregation
    lineage.runStage("harvest_ids", pagesSnap) {
      val t0 = System.nanoTime()
      val df = payloads
        .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.extractEntityIds(_, "en")))
        .toDF("id", "in_wikipedia", "is_property")
        .groupBy("id")
        .agg(max("in_wikipedia").as("in_wikipedia"), max("is_property").as("is_property"))
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = idFlagsTbl.merge(df)
      lineage.capture("harvest_ids", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("harvest_ids")

    // one gather-join feeds BOTH textify and docs (the two renderers resolve
    // the same (url → label map) frame); persisting it halves the pipeline's
    // biggest shuffle (refs explode + label join + per-url regroup)
    def resolved = resolvedRef.getOrElse {
      val r = TextifyStage.withLabelMaps(
        spark, gatePayloads(payloads), labelsTbl.read()).persist()
      resolvedRef = Some(r); r
    }

    // stage: textify — byte-identical extracted text per url (gated)
    val textsSnap = lineage.runStage("textify", labelsSnap) {
      val t0 = System.nanoTime()
      val df = TextifyStage.renderResolved(spark, resolved)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = textsTbl.mergeScoped(df, urlScope(pagesTbl.read()))
      lineage.capture("textify", labelsSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("textify")

    // stage: mentions — Aho-Corasick over the label+alias trie, built via the
    // size-guarded sharded path (single broadcast while the dictionary fits,
    // hash-sharded multi-pass beyond the budget — never an unguarded
    // full-dimension collect)
    val mentionsSnap = lineage.runStage("mentions", textsSnap) {
      val t0 = System.nanoTime()
      val df = Linker.mentionsSharded(spark, textsTbl.read(), mentionDict(),
        broadcastBudgetChars = mentionBudgetChars)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = mentionsTbl.mergeScoped(df, urlScope(pagesTbl.read()))
      lineage.capture("mentions", textsSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("mentions")

    // stage: link — batched stand-in embeddings + cosine top-K per mention.
    // Entity vectors persist in their own MERGE table so incremental (delta)
    // ingests embed only touched pages, never the whole corpus.
    val linksSnap = lineage.runStage("link", mentionsSnap) {
      val t0 = System.nanoTime()
      val texts = textsTbl.read()
      vecsTbl.mergeScoped(Embedder.embedDataset(
        texts.select("id", "text").as[(String, String)]).toDF("id", "vec"),
        idScope(pagesTbl.read(), "id"))
      val df = Linker.link(spark, mentionsTbl.read(), vecsTbl.read(), linkK)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = linksTbl.mergeScoped(df, urlScope(pagesTbl.read()))
      lineage.capture("link", mentionsSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("link")

    // stage: docs — token-budget chunking + batched embedding into the
    // vector-document table, deterministic _id = qid_lang_chunkIdx (the
    // reference's stage 3: docker/3_Add_Wikidata_to_AstraDB/run.py:65-93,
    // chunk T6, sink S8 — upsert by _id replaces the infinite-retry push).
    // Label resolution is the gather-join (renderChunks), not a driver
    // collect of the label dimension.
    lineage.runStage("docs", textsSnap) {
      val t0 = System.nanoTime()
      val chunks = TextifyStage.renderChunksResolved(spark, resolved, maxTokens = 120)
      val df = Embedder.embedDataset(
        chunks.select("doc_id", "text").as[(String, String)]).toDF("doc_id", "vec")
        .join(chunks, Seq("doc_id"))
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = docsTbl.mergeScoped(df, idScope(pagesTbl.read(), "qid"))
      lineage.capture("docs", textsSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("docs")

    // stage: triples — statement extraction with label-resolution joins
    val triplesSnap = lineage.runStage("triples", labelsSnap) {
      val t0 = System.nanoTime()
      val df = Triples.fromLines(spark, payloads.map(_.payload),
        labelsTbl.read().filter(col("lang") === "en").select("id", "label"))
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = triplesTbl.mergeScoped(df, idScope(pagesTbl.read(), "qid"))
      lineage.capture("triples", labelsSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }
    checkFail("triples")

    // stage: canon — CC over sameAs edges, canonical = min id per component.
    // Edges land in their own MERGE table first, so delta ingests can extend
    // the edge set without re-parsing the corpus.
    val canonSnap = lineage.runStage("canon", triplesSnap) {
      val t0 = System.nanoTime()
      sameAsTbl.mergeScoped(sameAsEdges(payloads), idScope(pagesTbl.read(), "src"))
      val nodes = labelsTbl.read().filter(col("lang") === "en").select("id")
      // optional alias-identity candidate edges (north-star "alias/sameAs
      // edges"): gated + chained, see AliasEdges; off by default because
      // shared-surface identity is a policy choice, not dump semantics
      val edges = aliasEdgeMaxIds.fold(sameAsTbl.read()) { maxIds =>
        sameAsTbl.read().unionByName(
          graft.canon.AliasEdges.edges(labelsTbl.read(), maxIds = maxIds))
      }
      val df = ConnectedComponents.run(spark, edges, nodes)
        .withColumnRenamed("component", "canonical")
      val snap = canonTbl.replace(df)
      lineage.capture("canon", triplesSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("canon")

    // stage: materialize — nodes + edges with canonical ids rewritten
    lineage.runStage("materialize", canonSnap)(materializeStage(canonSnap))
    checkFail("materialize")

    triplesSnap
    } finally {
      // drop the run-scoped caches on success AND failure — a long-lived
      // driver running (or retrying) repeated ingests must not accumulate
      // cached corpus copies
      resolvedRef.foreach(_.unpersist())
      payloadsRef.foreach(_.unpersist())
    }
  }

  /** Nodes + edges from the materialized tables (fully table-driven — shared
    * by the full and delta paths).
    */
  private def materializeStage(canonSnap: Long): Long = {
    val t0 = System.nanoTime()
    val canon = canonTbl.read()
    val nodes = labelsTbl.read().filter(col("lang") === "en")
      .join(canon, Seq("id"), "left")
      .select(col("id"), coalesce(col("canonical"), col("id")).as("canonical"),
        col("label"), col("is_property"))
    nodesTbl.replace(nodes)

    val linkEdges = linksTbl.read().filter(col("rank") === 1)
      .join(textsTbl.read().select(col("url"), col("id").as("src")), Seq("url"))
      .select(col("src"), col("qid").as("dst"), lit("mentions").as("kind"))
    val sameAs = sameAsTbl.read().withColumn("kind", lit("sameAs"))
    val canonSrc = canon.select(col("id").as("src"), col("canonical").as("src_canon"))
    val canonDst = canon.select(col("id").as("dst"), col("canonical").as("dst_canon"))
    val edges = linkEdges.unionByName(sameAs)
      .join(canonSrc, Seq("src"), "left")
      .join(canonDst, Seq("dst"), "left")
      .select(
        coalesce(col("src_canon"), col("src")).as("src"),
        coalesce(col("dst_canon"), col("dst")).as("dst"),
        col("kind"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val snap = edgesTbl.replace(edges)
    lineage.capture("materialize", canonSnap, edges, (System.nanoTime() - t0) / 1000000)
    snap
  }

  /** The J4 driving gate: only in_wikipedia entities are textified/chunked,
    * exactly the reference's stage-3 driving scan
    * (docker/3_Add_Wikidata_to_AstraDB/run.py:61). url=…/wiki/{id} is the
    * pages contract, so the gate is an equi-semi-join on the trailing id.
    */
  private def gatePayloads(payloads: org.apache.spark.sql.Dataset[PagePayload])
      : org.apache.spark.sql.Dataset[PagePayload] = {
    val inWiki = idFlagsTbl.read().filter(col("in_wikipedia")).select(col("id").as("_gid"))
    payloads
      .joinWith(inWiki, substring_index(payloads("url"), "/", -1) === col("_gid"), "inner")
      .map(_._1)
  }

  /** Processed-scope frames: EVERY page in `pages` counts as processed, so
    * a scope-replace merge deletes rows of pages that yielded nothing this
    * time (gated out, unparseable, or simply shrunken output). The id is the
    * url's trailing segment per the pages contract.
    */
  private def urlScope(pages: DataFrame): DataFrame = pages.select(col("url"))
  private def idScope(pages: DataFrame, as: String): DataFrame =
    pages.select(substring_index(col("url"), "/", -1).as(as))

  /** (surface → candidate ids) for the mention trie, from the en label dim. */
  private def mentionDict(): DataFrame =
    labelsTbl.read().filter(!col("is_property") && col("lang") === "en")
      .select(col("id"), explode(array_union(array(col("label")), col("aliases"))).as("surface"))
      .filter(length(col("surface")) > 0)
      .groupBy("surface").agg(collect_list("id").as("ids"))

  private def sameAsEdges(payloads: org.apache.spark.sql.Dataset[PagePayload]): DataFrame = {
    payloads
      .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.toClaimRows(_, "en")))
      .filter(r => r.pid == PagesGen.sameAsPid && r.isQidValue)
      .map(r => (r.qid, r.valueScalar)).toDF("src", "dst")
  }

  /** Delta-only ingest chain: per-page stages run over THIS BATCH's pages
    * only; global artifacts (id flags, canon, nodes/edges) update from the
    * materialized tables. No stage re-reads or re-parses the full corpus —
    * at 10^12 docs an increment costs O(batch) work plus the (edge-set-sized)
    * canonicalization, never O(corpus).
    */
  private def runDelta(newPages: DataFrame, pagesSnap: Long): Long = {
    val payloads = TextifyStage.payloads(spark, newPages).persist()
    val batchUrls = newPages.select("url")

    // mirror runFrom: unpersist on failure too (memo because a resumed run
    // whose per-page stages are all marked done never forces `resolved`)
    var resolvedRef: Option[org.apache.spark.sql.Dataset[(PagePayload, Map[String, String])]] = None
    try {

    lineage.runStage("delta_harvest", pagesSnap) {
      val t0 = System.nanoTime()
      val df = TextifyStage.harvestLabels(spark, payloads)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = labelsTbl.merge(df)
      lineage.capture("delta_harvest", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    lineage.runStage("delta_harvest_ids", pagesSnap) {
      val t0 = System.nanoTime()
      val batchFlags = payloads
        .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.extractEntityIds(_, "en")))
        .toDF("id", "in_wikipedia", "is_property")
      // S7 OR-merge across batches: fold in the existing flags of just the
      // touched ids (semi-join), so a true flag never regresses to false
      // (readOrEmpty: a delta ingest may be the root's first-ever operation)
      val existing = idFlagsTbl.readOrEmpty(batchFlags)
        .join(batchFlags.select("id").distinct(), Seq("id"), "left_semi")
      val df = batchFlags.unionByName(existing)
        .groupBy("id")
        .agg(max("in_wikipedia").as("in_wikipedia"), max("is_property").as("is_property"))
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = idFlagsTbl.merge(df)
      lineage.capture("delta_harvest_ids", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    def resolved = resolvedRef.getOrElse {
      val r = TextifyStage.withLabelMaps(
        spark, gatePayloads(payloads), labelsTbl.read()).persist()
      resolvedRef = Some(r); r
    }

    lineage.runStage("delta_textify", pagesSnap) {
      val t0 = System.nanoTime()
      val df = TextifyStage.renderResolved(spark, resolved)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = textsTbl.mergeScoped(df, urlScope(newPages))
      lineage.capture("delta_textify", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    def batchTexts = textsTbl.read().join(batchUrls, Seq("url"), "left_semi")

    lineage.runStage("delta_mentions", pagesSnap) {
      val t0 = System.nanoTime()
      val df = Linker.mentionsSharded(spark, batchTexts, mentionDict(),
        broadcastBudgetChars = mentionBudgetChars)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = mentionsTbl.mergeScoped(df, urlScope(newPages))
      lineage.capture("delta_mentions", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    lineage.runStage("delta_link", pagesSnap) {
      val t0 = System.nanoTime()
      vecsTbl.mergeScoped(Embedder.embedDataset(
        batchTexts.select("id", "text").as[(String, String)]).toDF("id", "vec"),
        idScope(newPages, "id"))
      val batchMentions = mentionsTbl.read().join(batchUrls, Seq("url"), "left_semi")
      val df = Linker.link(spark, batchMentions, vecsTbl.read(), linkK)
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = linksTbl.mergeScoped(df, urlScope(newPages))
      lineage.capture("delta_link", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    lineage.runStage("delta_docs", pagesSnap) {
      val t0 = System.nanoTime()
      val chunks = TextifyStage.renderChunksResolved(spark, resolved, maxTokens = 120)
      val df = Embedder.embedDataset(
        chunks.select("doc_id", "text").as[(String, String)]).toDF("doc_id", "vec")
        .join(chunks, Seq("doc_id"))
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = docsTbl.mergeScoped(df, idScope(newPages, "qid"))
      lineage.capture("delta_docs", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    val triplesSnap = lineage.runStage("delta_triples", pagesSnap) {
      val t0 = System.nanoTime()
      val df = Triples.fromLines(spark, payloads.map(_.payload),
        labelsTbl.read().filter(col("lang") === "en").select("id", "label"))
      df.persist() // one materialization feeds the merge's scope collect, the write, and the lineage count
      val snap = triplesTbl.mergeScoped(df, idScope(newPages, "qid"))
      lineage.capture("delta_triples", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      df.unpersist()
      snap
    }

    // global graph artifacts: extend the edge set with the batch's sameAs
    // rows, then recompute CC over the (small) edge+node tables — O(graph),
    // not O(corpus)
    val canonSnap = lineage.runStage("delta_canon", pagesSnap) {
      val t0 = System.nanoTime()
      sameAsTbl.mergeScoped(sameAsEdges(payloads), idScope(newPages, "src"))
      val nodes = labelsTbl.read().filter(col("lang") === "en").select("id")
      // mirror runFrom: optional alias-identity edges over the (updated)
      // labels table, so delta and full recompute converge on the same graph
      val edges = aliasEdgeMaxIds.fold(sameAsTbl.read()) { maxIds =>
        sameAsTbl.read().unionByName(
          graft.canon.AliasEdges.edges(labelsTbl.read(), maxIds = maxIds))
      }
      val df = ConnectedComponents.run(spark, edges, nodes)
        .withColumnRenamed("component", "canonical")
      val snap = canonTbl.replace(df)
      lineage.capture("delta_canon", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }

    lineage.runStage("delta_materialize", pagesSnap)(materializeStage(canonSnap))
    triplesSnap
    } finally {
      resolvedRef.foreach(_.unpersist())
      payloads.unpersist()
    }
  }
}
