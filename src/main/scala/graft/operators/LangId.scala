package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heuristic language identification + rolling-hash document fingerprinting
  * (training-data text ops).
  *
  * LangId: character-trigram profiles built from small built-in seed texts
  * (one per language, public pangram/sample sentences), scored by cosine
  * over trigram counts. Deterministic, dependency-free; runs as one narrow
  * `Dataset.map` (broadcastable profiles are tiny).
  *
  * Fingerprint: 64-bit Karp-Rabin rolling hash over the char stream with
  * winnowing (min hash per window) — robust to small edits, used for
  * order-independent doc identity at corpus scale.
  */
object LangId {

  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it was the best of times " +
      "it was the worst of times this is a test of the english language with many common words"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und es war die beste aller " +
      "zeiten es war die schlechteste aller zeiten das ist ein deutscher beispielsatz mit vielen wörtern"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et c était le meilleur des " +
      "temps c était le pire des temps ceci est une phrase d exemple en français avec beaucoup de mots"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y era el mejor de los tiempos " +
      "era el peor de los tiempos esta es una frase de ejemplo en español con muchas palabras comunes"),
    "ar" -> "الثعلب البني السريع يقفز فوق الكلب الكسول وكان أفضل الأوقات وكان أسوأ الأوقات هذه جملة مثال باللغة العربية",
    "zh" -> "敏捷的棕色狐狸跳过懒狗这是最好的时代这是最坏的时代这是一个中文示例句子包含许多常用词汇")

  /** Mutable single-pass trigram count — this is the per-doc CPU hot path
    * (one call per document in a narrow map); the previous immutable
    * `foldLeft`+`updated` allocated a fresh Map per trigram (O(|text|)
    * short-lived garbage per doc).
    */
  private def trigramCounts(text: String): scala.collection.Map[String, Int] = {
    val t = text.toLowerCase
    if (t.length < 3) return Map.empty
    val m = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i + 3 <= t.length) {
      val g = t.substring(i, i + 3)
      m.update(g, m.getOrElse(g, 0) + 1)
      i += 1
    }
    m
  }

  private lazy val profiles: Map[String, (scala.collection.Map[String, Int], Double)] =
    seeds.map { case (l, s) =>
      val counts = trigramCounts(s)
      l -> (counts, math.sqrt(counts.values.map(v => v.toDouble * v).sum))
    }

  /** Cosine of `counts` against every language profile — the shared kernel
    * behind [[detect]] (scalar argmax) and [[scoreDocs]] (per-candidate
    * rows for the DuckDB oracle).
    */
  private def profileScores(counts: scala.collection.Map[String, Int]): Seq[(String, Double)] = {
    val norm = math.sqrt(counts.values.map(v => v.toDouble * v).sum)
    profiles.toSeq.map { case (lang, (prof, pnorm)) =>
      var dot = 0.0
      counts.foreach { case (g, c) => prof.get(g).foreach(p => dot += c.toDouble * p) }
      lang -> (if (norm * pnorm == 0) 0.0 else dot / (norm * pnorm))
    }
  }

  /** Predict the language of `text`; "und" = undetermined (too short / no
    * overlap with any profile). Tie-break: the lexicographically smallest
    * language among those at the max score.
    */
  def detect(text: String): String = {
    val counts = trigramCounts(text)
    if (counts.isEmpty) return "und"
    var best = "und"; var bestScore = 0.0
    profileScores(counts).foreach { case (lang, score) =>
      if (score > bestScore || (score == bestScore && best != "und" && lang < best)) {
        best = lang; bestScore = score
      }
    }
    if (bestScore <= 0.0) "und" else best
  }

  /** Karp-Rabin rolling hash fingerprint with winnowing.
    * Returns (docHash, winnowedMin) — winnowedMin is the minimum window hash,
    * stable under content rotation/small shifts.
    */
  def fingerprint(text: String, window: Int = 16): (Long, Long) = {
    val B = 1000000007L
    var full = 0L
    var i = 0
    while (i < text.length) { full = full * B + text.charAt(i); i += 1 }
    if (text.length < window) return (full, full)
    var pow = 1L
    (1 until window).foreach(_ => pow *= B)
    var h = 0L
    var minH = Long.MaxValue
    i = 0
    while (i < text.length) {
      h = h * B + text.charAt(i)
      if (i >= window) h -= pow * B * text.charAt(i - window)
      if (i >= window - 1 && h < minH) minH = h
      i += 1
    }
    (full, minH)
  }

  /** The per-doc kernel as rows: one row per document × candidate language
    * with its profile-cosine score, plus the doc fingerprints (computed once
    * per doc, repeated on each row). This is the lid1 oracle frame — the
    * argmax/tie-break half that follows is pure SQL.
    */
  def scoreDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        val (fp, winnow) = fingerprint(text)
        val counts = trigramCounts(text)
        val scores =
          if (counts.isEmpty) profiles.keys.map(_ -> 0.0).toSeq
          else profileScores(counts)
        scores.map { case (cand, score) => (id, lang, fp, winnow, cand, score) }
      }
      .toDF("doc_id", "lang", "fingerprint", "winnowed_min", "cand_lang", "score")
  }

  /** queries() entry: predicted language + fingerprints per doc. The argmax
    * over candidate scores runs relationally (window max + min-lang
    * tie-break, 'und' when nothing scores above zero) — the same semantics
    * as [[detect]] (spec-pinned equal), and DuckDB-replayable from the
    * materialized [[scoreDocs]] frame.
    */
  def detectDocs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = OracleFrames.materialize(scoreDocs(spark, dir), "lid1_scores")
    val w = Window.partitionBy("doc_id")
    scores
      .withColumn("ms", max(col("score")).over(w))
      .filter(col("score") === col("ms"))
      .groupBy("doc_id", "lang", "fingerprint", "winnowed_min")
      .agg(min(col("cand_lang")).as("cand"), max(col("score")).as("ms"))
      .select(col("doc_id"), col("lang"),
        when(col("ms") <= 0.0, "und").otherwise(col("cand")).as("predicted_lang"),
        col("fingerprint"), col("winnowed_min"))
  }
}
