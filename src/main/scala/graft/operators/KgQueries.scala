package graft.operators

import graft.link.{Embedder, Linker}
import graft.model.WikidataJson
import graft.pipeline.{PagesGen, TextifyStage}
import graft.triples.Triples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KG-pipeline stages exposed as standalone queries for the driver's
  * per-round verify/bench. The pages corpus is self-generated
  * (deterministic, seeded — the testdata dir has no pages table), so these
  * are rows-only checks; their semantics are pinned by the golden suite and
  * KgPipelineSpec. They are also the headline bench workloads: parse +
  * textify + trie matching are the CPU-heavy narrow stages, triples/link the
  * join-heavy wide ones.
  */
object KgQueries {

  val nPages = 1500L

  private def payloads(spark: SparkSession) =
    TextifyStage.payloads(spark, PagesGen.pages(spark, nPages))

  /** Per-language label dimension (id, lang, label, is_property, aliases). */
  private def labels(spark: SparkSession): DataFrame =
    TextifyStage.harvestLabels(spark, payloads(spark))

  private def labelsEn(spark: SparkSession): DataFrame =
    labels(spark).filter(col("lang") === "en")

  /** Extract + textify: byte-identical text per url. */
  def extractText(spark: SparkSession, dir: String): DataFrame =
    TextifyStage.render(spark, payloads(spark), labels(spark))

  /** (surface → candidate ids) dictionary — stays a DataFrame; the sharded
    * mention path decides whether it fits one broadcast trie.
    */
  private def dictOf(labelsDf: DataFrame): DataFrame =
    labelsDf.filter(!col("is_property") && col("lang") === "en")
      .select(col("id"), explode(array_union(array(col("label")), col("aliases"))).as("surface"))
      .filter(length(col("surface")) > 0)
      .groupBy("surface").agg(collect_list("id").as("ids"))

  /** Mention detection over already-extracted texts. */
  private def mentionsOf(spark: SparkSession, texts: DataFrame, labelsDf: DataFrame): DataFrame =
    Linker.mentionsSharded(spark, texts, dictOf(labelsDf))

  /** Mention detection over the extracted text. */
  def mentions(spark: SparkSession, dir: String): DataFrame =
    mentionsOf(spark, extractText(spark, dir), labels(spark))

  /** Entity-link scoring: top-K per mention. The texts dataset is computed
    * once and persisted — mention detection AND entity-vector embedding both
    * read it, so extract/textify no longer runs twice per links query.
    */
  def links(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labelsDf = labels(spark)
    val texts = TextifyStage.render(spark, payloads(spark), labelsDf).persist()
    val entityVecs = Embedder.embedDataset(
      texts.select("id", "text").as[(String, String)]).toDF("id", "vec")
    Linker.link(spark, mentionsOf(spark, texts, labelsDf), entityVecs, k = 5)
      .withColumn("score", round(col("score"), 6))
  }

  /** Triple extraction over the corpus payloads. */
  def triples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Triples.fromLines(spark, payloads(spark).map(_.payload), labelsEn(spark).select("id", "label"))
  }

  /** Canonicalization mapping (connected components over sameAs). */
  def canon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sameAs = payloads(spark)
      .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.toClaimRows(_, "en")))
      .filter(r => r.pid == PagesGen.sameAsPid && r.isQidValue)
      .map(r => (r.qid, r.valueScalar)).toDF("src", "dst")
    val nodes = labelsEn(spark).select("id")
    graft.canon.ConnectedComponents.run(spark, sameAs, nodes)
      .filter(col("id") =!= col("component")) // only non-trivial mappings
  }

  /** SURVEY.md §7.3's literal end-to-end query: all (subj, pred, obj) for a
    * given url. The url→qid mapping is the pages table's contract
    * (url = …/wiki/{qid}), so this is a pushed-down filter on the subject
    * key — at scale a bucket-pruned point read of the triples table.
    */
  def triplesForUrl(spark: SparkSession, dir: String,
                    url: String = PagesGen.urlOf(PagesGen.qid(7))): DataFrame = {
    val qid = url.substring(url.lastIndexOf('/') + 1)
    triples(spark, dir).filter(col("qid") === qid)
      .withColumn("url", lit(url))
  }

  /** Qualifier + reference sub-triples (P6, notebook get_triplets semantics):
    * one row per main/qualifier/reference part, golden-pinned by
    * TripletsGoldenSpec against executing the reference notebook's own code.
    */
  def triplets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.triples.Triplets.rows(spark, payloads(spark).map(_.payload))
  }

  /** KG corpus stats (A1, ref notebooks/Get_Wikidata_Stats.py:100-371):
    * per-PID claim counts, per-P31-class instance counts, per-site sitelink
    * counts — explode + groupBy/count, partial aggregation for free.
    *
    * Counting runs over the DB-cleaned claims of EVERY item (type ==
    * statement, deprecated dropped — the reference's stats walk the stored
    * `wikidata` table), NOT over the statement-extractor rows: those gate on
    * `descriptions[lang]` and drop novalue/somalue claims, which would
    * silently undercount entities the extractor skips.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val claimRows = payloads(spark).flatMap { pp =>
      WikidataJson.parseLine(pp.payload).toSeq.flatMap { item =>
        WikidataJson.normalize(item, "en").claims.flatMap { cg =>
          cg.claims.map { c =>
            val qv =
              if (c.mainsnak.datatype == "wikibase-item" && c.mainsnak.valueJson != null) {
                val n = WikidataJson.mapper.readTree(c.mainsnak.valueJson)
                if (n.has("id")) n.get("id").asText() else null
              } else null
            (cg.pid, qv)
          }
        }
      }
    }.toDF("pid", "value_qid")
    val perPid = claimRows.groupBy(col("pid").as("key"))
      .agg(count(lit(1)).as("n")).withColumn("stat", lit("claims_per_pid"))
    val perClass = claimRows.filter(col("pid") === "P31" && col("value_qid").isNotNull)
      .groupBy(col("value_qid").as("key"))
      .agg(count(lit(1)).as("n")).withColumn("stat", lit("instances_per_class"))
    val perSite = payloads(spark).flatMap { pp =>
      WikidataJson.parseLine(pp.payload).toSeq.flatMap { item =>
        val sl = item.path("sitelinks")
        if (!sl.isObject) Seq.empty[String]
        else { import scala.jdk.CollectionConverters._; sl.properties().asScala.map(_.getKey).toSeq }
      }
    }.toDF("key").groupBy("key")
      .agg(count(lit(1)).as("n")).withColumn("stat", lit("sitelinks_per_site"))
    perPid.unionByName(perClass).unionByName(perSite).select("stat", "key", "n")
  }

  /** Chunk explode (P9/T6): entity text → token-budget chunks with
    * deterministic ids `qid_lang_chunkIdx` (ref: docker/3:74-88). Label
    * resolution via the gather-join — no driver collect of the dictionary.
    */
  def chunks(spark: SparkSession, dir: String, maxTokens: Int = 60): DataFrame =
    TextifyStage.renderChunks(spark, payloads(spark), labels(spark),
        maxTokens, langOverride = Some("en"))
      .select(col("doc_id").as("chunk_id"), col("qid"), col("chunk"), col("text"))
}
