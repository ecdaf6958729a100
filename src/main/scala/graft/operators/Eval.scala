package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval-evaluation operators — the reference's stage 4/5 + metric
  * notebook (SURVEY.md A4-A7, K1/K3/K4):
  * top-K retrieval per query, rerank, MRR / NDCG / accuracy / log-odds.
  *
  * The eval set is derived from the driver's `embeddings` table: vectors
  * sharing a `label` are mutually relevant; the lowest vec_id per label is
  * the query (ref analog: QA gold labels in docker/4_Run_Retrieval).
  */
object Eval {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Top-K retrieval per query with relevance marks.
    * Output: (query_id, query_label, neighbor_id, neighbor_label, cos, rank, relevant)
    *
    * `candidateFilter`, when given, restricts the candidate side per query
    * BEFORE scoring — the reference's retrieval metadata filters (J10/F7,
    * ref: src/wikidataRetriever.py:136-187: `{$or: [{Language: l}…]}` and
    * per-query comparative candidate-QID sets). The predicate may reference
    * both candidate columns (`label`, `vec_id`) and query columns
    * (`query_label`, `query_id`), so it is pushed into the join condition —
    * at scale it prunes candidates before any vector arithmetic runs.
    *
    * `queriesDf` is the BROADCAST-CONTRACT input: an explicit, bounded eval
    * set with columns (query_id, qvec, query_label) — the reference's shape,
    * where queries come from a small external QA table
    * (docker/4_Run_Retrieval), never from the corpus. The default (None)
    * derives one query per distinct corpus `label` — convenient on the
    * driver's testdata, but its size grows with corpus label cardinality, so
    * at 100 TB callers MUST pass a bounded set; the broadcast below is only
    * safe because |queries| is an API input, not a corpus property.
    */
  def retrieve(spark: SparkSession, dir: String, k: Int = 10,
               candidateFilter: Option[Column] = None,
               queriesDf: Option[DataFrame] = None): DataFrame = {
    val e = emb(spark, dir).withColumn("_n", Similarity.norm(col("embedding")))
    val queries = queriesDf match {
      case Some(q) =>
        q.select(col("query_id"), col("qvec"), col("query_label"))
          .withColumn("_qn", Similarity.norm(col("qvec")))
      case None =>
        val qWin = Window.partitionBy("label").orderBy(asc("vec_id"))
        e.withColumn("rn", row_number().over(qWin)).filter(col("rn") === 1)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
            col("label").as("query_label"), col("_n").as("_qn"))
    }
    val joinCond = candidateFilter.foldLeft(col("vec_id") =!= col("query_id"))(_ && _)
    val scored = e.join(broadcast(queries), joinCond)
      .select(col("query_id"), col("query_label"),
        col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
        Similarity.cosineWithNorms(col("qvec"), col("embedding"), col("_qn"), col("_n")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .withColumn("relevant", (col("neighbor_label") === col("query_label")).cast("int"))
  }

  /** Comparative filtered retrieval (J10 + F7): each query searches only its
    * own candidate set — here, neighbors whose label is in
    * {query_label, query_label + 1} — the `$or` metadata-filter shape of the
    * reference's batch_retrieve. Output: top-K per query with rounded cos.
    */
  def retrieveComparative(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    retrieve(spark, dir, k, Some(
      col("label") === col("query_label") || col("label") === col("query_label") + 1))
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        col("rank"), col("relevant"), round(col("cos"), 6).as("cos"))

  /** Rerank the retrieved K with a second scorer and re-sort — K3 semantics
    * (ref: docker/5_Run_Rerank/run.py:25-32). The stand-in "cross-encoder"
    * is a deterministic md5-derived score of (query, candidate) ids (chosen
    * over xxhash64 so the DuckDB oracle can reproduce it); ties resolve by
    * the original retrieval rank, matching the reference's *stable*
    * `sorted(-score)` over the retrieval-ordered list.
    */
  def rerank(spark: SparkSession, dir: String, k: Int = 10,
             queriesDf: Option[DataFrame] = None): DataFrame = {
    val crossScore = round(
      conv(substring(md5(concat_ws("_", col("query_id"), col("neighbor_id"))), 1, 8), 16, 10)
        .cast("long") / 4294967296.0, 6)
    val w = Window.partitionBy("query_id").orderBy(desc("cross_score"), asc("rank"))
    retrieve(spark, dir, k, queriesDf = queriesDf)
      .withColumn("cross_score", crossScore)
      .withColumn("new_rank", row_number().over(w))
      .select(col("query_id"), col("new_rank"), col("neighbor_id"), col("cross_score"))
  }

  /** MRR / NDCG@K / accuracy / log-odds over the retrieval
    * (ref: notebooks/4-Evaluation_Calculation.ipynb cell 2). One output row.
    */
  def metrics(spark: SparkSession, dir: String, k: Int = 10,
              queriesDf: Option[DataFrame] = None): DataFrame = {
    val r = retrieve(spark, dir, k, queriesDf = queriesDf)
    val perQuery = r.groupBy("query_id")
      .agg(
        min(when(col("relevant") === 1, col("rank"))).as("first_hit_rank"),
        sum(when(col("relevant") === 1, lit(1.0) / log2(col("rank") + 1)).otherwise(0.0)).as("dcg"),
        sum("relevant").as("n_relevant_in_k"),
        max(when(col("rank") === 1, col("relevant"))).as("top1_hit"),
        max(when(col("relevant") === 1, col("cos"))).as("best_rel_score"),
        max(when(col("relevant") === 0, col("cos"))).as("best_irrel_score"))
      .withColumn("idcg", when(col("n_relevant_in_k") > 0,
        expr(s"aggregate(sequence(1, int(least(n_relevant_in_k, $k))), 0.0d, (acc, i) -> acc + 1.0 / log2(i + 1))"))
        .otherwise(lit(0.0)))
      .withColumn("ndcg", when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(0.0))
      .withColumn("rr", when(col("first_hit_rank").isNotNull, lit(1.0) / col("first_hit_rank")).otherwise(0.0))

    perQuery.agg(
      count(lit(1)).as("n_queries"),
      round(avg("rr"), 6).as("mrr"),
      round(avg("ndcg"), 6).as("ndcg"),
      round(avg(coalesce(col("top1_hit"), lit(0))), 6).as("accuracy"),
      round(avg(
        when(col("best_rel_score").isNotNull && col("best_irrel_score").isNotNull,
          log((col("best_rel_score") + 1) / 2 / (lit(1.0) - (col("best_rel_score") + 1) / 2 + lit(1e-9))) -
            log((col("best_irrel_score") + 1) / 2 / (lit(1.0) - (col("best_irrel_score") + 1) / 2 + lit(1e-9))))),
        6).as("log_odds_gap"))
  }

  /** em4: precision/recall@K curve, K = 1..kMax, over the same retrieval
    * frame em1 scores — the operating-point view a single MRR/NDCG scalar
    * hides (you pick K for a production retriever off this curve).
    * MICRO-averaged on purpose: precision@K = Σhits / (K·|queries|) and
    * recall@K = Σhits / Σn_rel keep every sum an exact integer, so the only
    * floating-point ops are two final IEEE divisions per K — deterministic
    * under any partitioning, where the per-query macro average would sum
    * doubles in shuffle order. The recall base n_rel = corpus same-label
    * count − 1 (the query itself is never a candidate). CONTRACT (round-5
    * advice): the −1 assumes every query row IS a corpus member — true for
    * the default corpus-derived query set and for `retrieve`'s
    * `vec_id != query_id` exclusion; an external `queriesDf` whose
    * query_ids are not corpus rows must not reuse this curve as-is (its
    * recall denominator would undercount by one per query).
    *
    * Scale shape: one bounded (query, k) expansion of the ALREADY top-K
    * retrieval scalars (≤ |queries|·kMax rows), the label-count dim and the
    * k range ride broadcasts, and the final frame is kMax rows.
    */
  def prCurve(spark: SparkSession, dir: String, kMax: Int = 10,
              queriesDf: Option[DataFrame] = None): DataFrame = {
    val r = retrieve(spark, dir, kMax, queriesDf = queriesDf)
    val labelCounts = spark.read.parquet(s"$dir/embeddings.parquet")
      .groupBy(col("label").as("query_label"))
      .agg(count(lit(1)).as("n_label"))
    val ks = spark.range(1, kMax + 1).select(col("id").cast("int").as("k"))
    val perQ = r.join(broadcast(ks), col("rank") <= col("k"))
      .groupBy("query_id", "query_label", "k")
      .agg(sum("relevant").cast("long").as("hits"))
      .join(broadcast(labelCounts), Seq("query_label"))
      .withColumn("n_rel", col("n_label") - 1L)
    perQ.groupBy("k")
      .agg(count(lit(1)).as("n_queries"),
        sum("hits").as("total_hits"),
        sum("n_rel").as("total_rel"))
      .select(col("k"), col("n_queries"), col("total_hits"),
        (col("total_hits").cast("double") /
          (col("k").cast("long") * col("n_queries")).cast("double")).as("precision"),
        when(col("total_rel") === 0L, lit(1.0))
          .otherwise(col("total_hits").cast("double") / col("total_rel").cast("double"))
          .as("recall"))
  }
}
