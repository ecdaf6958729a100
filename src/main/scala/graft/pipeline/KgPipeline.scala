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
final class KgPipeline(spark: SparkSession, root: String,
                       nPages: Long = 2000, linkK: Int = 5,
                       failAfterStage: Option[String] = None) {
  import spark.implicits._

  val pagesTbl = new MergeTable(spark, s"$root/pages", Seq("url"))
  val labelsTbl = new MergeTable(spark, s"$root/labels", Seq("id", "lang"))
  val idFlagsTbl = new MergeTable(spark, s"$root/id_flags", Seq("id"))
  val textsTbl = new MergeTable(spark, s"$root/texts", Seq("url"))
  val mentionsTbl = new MergeTable(spark, s"$root/mentions", Seq("url", "begin", "qid"))
  val linksTbl = new MergeTable(spark, s"$root/links", Seq("url", "begin", "rank"))
  val triplesTbl = new MergeTable(spark, s"$root/triples", Seq("uuid"))
  val docsTbl = new MergeTable(spark, s"$root/docs", Seq("doc_id"))
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
      val snap = pagesTbl.merge(df)
      lineage.capture("ingest", 0L, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("ingest")
    runFrom(pagesSnap)
  }

  /** Incremental ingest: MERGE a batch of new/changed pages (upsert by url)
    * and run every downstream stage against the new pages snapshot (stage
    * markers are per input snapshot, so the new chain executes exactly
    * once). Derived stages recompute over the merged corpus and their
    * MERGE-upserts converge: unchanged rows rewrite to identical values
    * (deterministic ids), changed/new rows update in place. Delta-only
    * recomputation (process just the changed buckets) is the flagged
    * refinement for true 10^12-scale increments.
    */
  def ingest(newPages: org.apache.spark.sql.DataFrame): Long = {
    val pagesSnap = pagesTbl.merge(newPages)
    runFrom(pagesSnap)
  }

  private def runFrom(pagesSnap: Long): Long = {

    lazy val payloads = TextifyStage.payloads(spark, pagesTbl.read()).persist()

    // stage: harvest — per-language label dimension (id, lang, label,
    // is_property, aliases) from the corpus itself: the reference normalizes
    // the whole DB once per LANGUAGE (src/wikidataDB.py:126-148)
    val labelsSnap = lineage.runStage("harvest", pagesSnap) {
      val t0 = System.nanoTime()
      val df = TextifyStage.harvestLabels(spark, payloads)
      val snap = labelsTbl.merge(df)
      lineage.capture("harvest", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
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
      val snap = idFlagsTbl.merge(df)
      lineage.capture("harvest_ids", pagesSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("harvest_ids")

    // the J4 driving gate: only in_wikipedia entities are textified/chunked,
    // exactly the reference's stage-3 driving scan
    // (docker/3_Add_Wikidata_to_AstraDB/run.py:61). url=…/wiki/{id} is the
    // pages contract, so the gate is an equi-semi-join on the trailing id.
    lazy val gatedPayloads = {
      val inWiki = idFlagsTbl.read().filter(col("in_wikipedia")).select(col("id").as("_gid"))
      payloads
        .joinWith(inWiki, substring_index(payloads("url"), "/", -1) === col("_gid"), "inner")
        .map(_._1)
    }

    // stage: textify — byte-identical extracted text per url (gated)
    val textsSnap = lineage.runStage("textify", labelsSnap) {
      val t0 = System.nanoTime()
      val df = TextifyStage.render(spark, gatedPayloads, labelsTbl.read())
      val snap = textsTbl.merge(df)
      lineage.capture("textify", labelsSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("textify")

    // stage: mentions — Aho-Corasick over the label+alias trie, built via the
    // size-guarded sharded path (single broadcast while the dictionary fits,
    // hash-sharded multi-pass beyond the budget — never an unguarded
    // full-dimension collect)
    val mentionsSnap = lineage.runStage("mentions", textsSnap) {
      val t0 = System.nanoTime()
      val dict = labelsTbl.read().filter(!col("is_property") && col("lang") === "en")
        .select(col("id"), explode(array_union(array(col("label")), col("aliases"))).as("surface"))
        .filter(length(col("surface")) > 0)
        .groupBy("surface").agg(collect_list("id").as("ids"))
      val df = Linker.mentionsSharded(spark, textsTbl.read(), dict)
      val snap = mentionsTbl.merge(df)
      lineage.capture("mentions", textsSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("mentions")

    // stage: link — batched stand-in embeddings + cosine top-K per mention
    val linksSnap = lineage.runStage("link", mentionsSnap) {
      val t0 = System.nanoTime()
      val texts = textsTbl.read()
      val entityVecs = Embedder.embedDataset(
        texts.select("id", "text").as[(String, String)]).toDF("id", "vec")
      val df = Linker.link(spark, mentionsTbl.read(), entityVecs, linkK)
      val snap = linksTbl.merge(df)
      lineage.capture("link", mentionsSnap, df, (System.nanoTime() - t0) / 1000000)
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
      val chunks = TextifyStage.renderChunks(spark, gatedPayloads, labelsTbl.read(), maxTokens = 120)
      val df = Embedder.embedDataset(
        chunks.select("doc_id", "text").as[(String, String)]).toDF("doc_id", "vec")
        .join(chunks, Seq("doc_id"))
      val snap = docsTbl.merge(df)
      lineage.capture("docs", textsSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("docs")

    // stage: triples — statement extraction with label-resolution joins
    val triplesSnap = lineage.runStage("triples", labelsSnap) {
      val t0 = System.nanoTime()
      val df = Triples.fromLines(spark, payloads.map(_.payload),
        labelsTbl.read().filter(col("lang") === "en").select("id", "label"))
      val snap = triplesTbl.merge(df)
      lineage.capture("triples", labelsSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("triples")

    // stage: canon — CC over sameAs edges, canonical = min id per component
    val canonSnap = lineage.runStage("canon", triplesSnap) {
      val t0 = System.nanoTime()
      val sameAs = payloads
        .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.toClaimRows(_, "en")))
        .filter(r => r.pid == PagesGen.sameAsPid && r.isQidValue)
        .map(r => (r.qid, r.valueScalar)).toDF("src", "dst")
      val nodes = labelsTbl.read().filter(col("lang") === "en").select("id")
      val df = ConnectedComponents.run(spark, sameAs, nodes)
        .withColumnRenamed("component", "canonical")
      val snap = canonTbl.merge(df)
      lineage.capture("canon", triplesSnap, df, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("canon")

    // stage: materialize — nodes + edges with canonical ids rewritten
    lineage.runStage("materialize", canonSnap) {
      val t0 = System.nanoTime()
      val canon = canonTbl.read()
      val nodes = labelsTbl.read().filter(col("lang") === "en")
        .join(canon, Seq("id"), "left")
        .select(col("id"), coalesce(col("canonical"), col("id")).as("canonical"),
          col("label"), col("is_property"))
      nodesTbl.merge(nodes)

      val linkEdges = linksTbl.read().filter(col("rank") === 1)
        .join(textsTbl.read().select(col("url"), col("id").as("src")), Seq("url"))
        .select(col("src"), col("qid").as("dst"), lit("mentions").as("kind"))
      val sameAsEdges = payloads
        .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.toClaimRows(_, "en")))
        .filter(r => r.pid == PagesGen.sameAsPid && r.isQidValue)
        .map(r => (r.qid, r.valueScalar, "sameAs")).toDF("src", "dst", "kind")
      val canonSrc = canon.select(col("id").as("src"), col("canonical").as("src_canon"))
      val canonDst = canon.select(col("id").as("dst"), col("canonical").as("dst_canon"))
      val edges = linkEdges.unionByName(sameAsEdges)
        .join(canonSrc, Seq("src"), "left")
        .join(canonDst, Seq("dst"), "left")
        .select(
          coalesce(col("src_canon"), col("src")).as("src"),
          coalesce(col("dst_canon"), col("dst")).as("dst"),
          col("kind"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val snap = edgesTbl.merge(edges)
      lineage.capture("materialize", canonSnap, edges, (System.nanoTime() - t0) / 1000000)
      snap
    }
    checkFail("materialize")

    triplesSnap
  }
}
