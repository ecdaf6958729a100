package graft.operators

import graft.link.{Embedder, Linker}
import graft.mention.AhoCorasick
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

  private def labels(spark: SparkSession): DataFrame = {
    import spark.implicits._
    payloads(spark).flatMap { pp =>
      WikidataJson.parseLine(pp.payload).map { item =>
        val e = WikidataJson.normalize(item, "en")
        (e.id, e.label, item.path("type").asText("") == "property", e.aliases)
      }
    }.toDF("id", "label", "is_property", "aliases")
  }

  /** Extract + textify: byte-identical text per url. */
  def extractText(spark: SparkSession, dir: String): DataFrame =
    TextifyStage.render(spark, payloads(spark), labels(spark))

  /** Mention detection over the extracted text. */
  def mentions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val texts = extractText(spark, dir)
    val dict = labels(spark).filter(!col("is_property"))
      .select(col("id"), explode(array_union(array(col("label")), col("aliases"))).as("surface"))
      .filter(length(col("surface")) > 0)
      .groupBy("surface").agg(collect_list("id").as("ids"))
      .as[(String, Seq[String])].collect()
    val trie = spark.sparkContext.broadcast(AhoCorasick.build(dict.map(d => d._1 -> d._2)))
    Linker.mentions(spark, texts, trie)
  }

  /** Entity-link scoring: top-K per mention. */
  def links(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val texts = extractText(spark, dir)
    val entityVecs = Embedder.embedDataset(
      texts.select("id", "text").as[(String, String)]).toDF("id", "vec")
    Linker.link(spark, mentions(spark, dir), entityVecs, k = 5)
      .withColumn("score", round(col("score"), 6))
  }

  /** Triple extraction over the corpus payloads. */
  def triples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Triples.fromLines(spark, payloads(spark).map(_.payload), labels(spark).select("id", "label"))
  }

  /** Canonicalization mapping (connected components over sameAs). */
  def canon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sameAs = payloads(spark)
      .flatMap(pp => WikidataJson.parseLine(pp.payload).toSeq.flatMap(WikidataJson.toClaimRows(_, "en")))
      .filter(r => r.pid == PagesGen.sameAsPid && r.isQidValue)
      .map(r => (r.qid, r.valueScalar)).toDF("src", "dst")
    val nodes = labels(spark).select("id")
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

  /** Chunk explode (P9/T6): entity text → token-budget chunks with
    * deterministic ids `qid_lang_chunkIdx` (ref: docker/3:74-88).
    */
  def chunks(spark: SparkSession, dir: String, maxTokens: Int = 60): DataFrame = {
    import spark.implicits._
    val labelMap = labels(spark).select("id", "label")
      .as[(String, String)].collect().toMap
    val bc = spark.sparkContext.broadcast(labelMap)
    payloads(spark).flatMap { pp =>
      WikidataJson.parseLine(pp.payload).toSeq.flatMap { item =>
        val e = WikidataJson.normalize(item, "en")
        val textifier = new graft.textify.Textifier(
          graft.textify.LangVariant("en"), bc.value.get)
        val tok = new graft.textify.SimpleTokenizer(8)
        graft.textify.Chunker.chunkText(textifier, e, tok, maxTokens)
          .zipWithIndex.map { case (c, i) => (s"${e.id}_en_${i + 1}", e.id, i + 1, c) }
      }
    }.toDF("chunk_id", "qid", "chunk", "text")
  }
}
