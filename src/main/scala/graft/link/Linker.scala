package graft.link

import graft.mention.AhoCorasick
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mention detection + embedding-based entity-link scoring (north_star
  * stages 2–3).
  *
  * Mentions: Aho-Corasick over the broadcast label+alias trie, one narrow
  * pass over the extracted text (no shuffle).
  *
  * Linking: every (mention, candidate QID) pair is scored with cosine
  * similarity between the mention's local context embedding (computed
  * map-side by the deterministic stand-in embedder) and the candidate
  * entity's item-text embedding (K1 semantics, K default 50 like the
  * reference's retrieval top-K). Candidate resolution is an equi-join on the
  * candidate QID — the embedding table never broadcasts, so this survives a
  * 9.2M-entity dimension; the per-mention top-K is a window over
  * (url, begin).
  */
object Linker {

  /** texts(url, id, lang, text) → mentions(url, surface, begin, end, qid)
    * — one row per mention × candidate. Self-mentions (candidate == the
    * page's own entity) are dropped.
    */
  /** Context window text around a mention (map-side, no shuffle). */
  private val contextChars = 80

  /** Mentions with their local context captured map-side while the full text
    * is in hand — downstream linking never re-joins the (wide) texts table;
    * only the small context window travels.
    */
  def mentions(spark: SparkSession, texts: DataFrame, trie: Broadcast[AhoCorasick],
               maxCandidates: Int = 50): DataFrame = {
    import spark.implicits._
    texts.select("url", "id", "text").as[(String, String, String)]
      .flatMap { case (url, selfId, text) =>
        trie.value.findMentions(text).flatMap { m =>
          val ctx = text.substring(
            math.max(0, m.begin - contextChars),
            math.min(text.length, m.end + contextChars))
          // bounded candidate set (deterministic: sorted before the cap) —
          // uncapped fan-out on a hyper-ambiguous surface is the mention-side
          // skew hazard at corpus scale
          m.qids.filter(_ != selfId).sorted.take(maxCandidates)
            .map(q => (url, m.surface, m.begin, m.end, q, ctx))
        }
      }
      .toDF("url", "surface", "begin", "end", "qid", "context")
  }

  /** Score candidates and keep top-K per mention.
    * Output: (url, begin, end, surface, qid, score, rank).
    */
  def link(spark: SparkSession, mentionsDf: DataFrame,
           entityVecs: DataFrame, k: Int = 50): DataFrame = {
    import spark.implicits._

    val withContext = mentionsDf
      .select(col("url"), col("surface"), col("begin"), col("end"), col("qid"), col("context"))
      .as[(String, String, Int, Int, String, String)]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          val vecs = Embedder.encodeBatch(batch.map(_._6))
          batch.zip(vecs).map { case ((url, s, b, e, q, _), v) => (url, s, b, e, q, v) }
        }
      }
      .toDF("url", "surface", "begin", "end", "qid", "ctx_vec")

    val scored = withContext
      .join(entityVecs.select(col("id").as("qid"), col("vec")), Seq("qid"))
      .withColumn("score", graft.operators.Similarity.cosineCol(col("ctx_vec"), col("vec")))

    val w = Window.partitionBy("url", "begin").orderBy(desc("score"), asc("qid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("url", "begin", "end", "surface", "qid", "score", "rank")
  }
}
