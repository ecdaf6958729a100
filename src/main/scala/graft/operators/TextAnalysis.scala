package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline ops (language-ID, quality scoring, token counting, document
  * fingerprinting) generalizing the reference's per-entity text handling
  * (ref: src/wikidataEmbed.py textifier, docker/6_Push_Huggingface cleanup).
  *
  * Everything is built from codegen'd `functions._` columns — no UDFs — so
  * the whole stage stays inside WholeStageCodegen and scales as a narrow map
  * over the scan.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Whitespace token count as a pure Column (codegen, no UDF). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Corpus stats per (lang, source). */
  def d1DocStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min(length(col("text"))).as("min_len"),
        max(length(col("text"))).as("max_len"))

  /** Exact-dedup summary: distinct text counts per language.
    * Ref analog: ON CONFLICT DO NOTHING upsert dedup (src/wikidataDB.py:46-76). */
  def d2ExactDedupStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"))

  /** Exact duplicate groups: md5 fingerprint, multiplicity, representative
    * (min doc_id). The groupBy-on-hash shape is the 100 TB-safe exact dedup:
    * shuffle moves 16-byte digests + ids, never the text. */
  def d3DupGroups(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("rep_doc_id"))
      .filter(col("n_copies") > 1)

  /** Token counting rollup per language (whitespace tokenizer). */
  def d4TokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), tokenCount(col("text")).as("n_tokens"))
      .groupBy("lang")
      .agg(
        sum("n_tokens").as("total_tokens"),
        max("n_tokens").as("max_tokens"),
        count(lit(1)).as("n_docs"))

  /** Quality-score components per doc — length, punctuation ratio, digit
    * ratio, mean word length — all exact integer counts so the DuckDB oracle
    * can reproduce them bit-for-bit. */
  def d5QualitySignals(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_char"),
        tokenCount(col("text")).as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).as("n_punct"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).as("n_digit"))

  /** PII scrubbing (curation op, the C4/CCNet-style pre-training cleanup):
    * redact emails and phone-shaped numbers, report per-doc hit counts.
    * Pure codegen'd column expressions; the regexes are written to the
    * Java∩RE2 common dialect so the DuckDB oracle replays them exactly.
    */
  def d7PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+?[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}"
    docs(spark, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
      regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("text_scrubbed"))
  }

  /** Deterministic stratified sampling for training-data curation: include a
    * doc iff its md5-derived uniform in [0,1) falls under its stratum's
    * rate. Hash sampling beats `rand()` at scale — the decision is a pure
    * function of the KEY, so it is reproducible across task retries,
    * repartitions and reruns (a retried task re-drawing rand() silently
    * changes the sample), it needs no per-partition seed plumbing, and the
    * same expression replays in any engine (the DuckDB oracle).
    */
  def d6StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val rate = when(col("lang") === "en", 0.5)
      .when(col("lang") === "de", 0.25)
      .otherwise(0.1)
    docs(spark, dir)
      .filter(u < rate)
      .select(col("doc_id"), col("lang"))
  }
}
