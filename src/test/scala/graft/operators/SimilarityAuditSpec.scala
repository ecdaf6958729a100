package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** s10 recall audit: the audit frame must agree, method by method, with
  * recalls computed independently from the individual searcher outputs —
  * the audit's join/aggregate half can then never drift from what the
  * searchers actually returned (the searchers themselves are each
  * DuckDB-oracle-gated separately).
  */
class SimilarityAuditSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("s10 audit rows == independent per-searcher recall replay") {
    val truth = Similarity.bruteForceTopK(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val searchers: Map[String, Set[(Long, Long)]] = Map(
      "s2_lsh" -> Similarity.lshTopK(spark, dir),
      "s5_ivf" -> Similarity.ivfTopK(spark, dir),
      "s6_ivf_trained" -> Similarity.ivfTopKTrained(spark, dir),
      "s8_pq" -> Similarity.pqTopK(spark, dir),
      "s9_ivfpq" -> Similarity.ivfPqTopK(spark, dir)
    ).map { case (n, df) =>
      n -> df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    }

    val audit = Similarity.annRecallAudit(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    assert(audit.keySet == searchers.keySet, "one audit row per searcher")
    searchers.foreach { case (name, got) =>
      val hits = (got intersect truth).size.toLong
      val expect = (got.size.toLong, hits, truth.size.toLong,
        hits.toDouble / truth.size.toDouble)
      assert(audit(name) == expect, s"$name: got ${audit(name)}, want $expect")
    }
    // the audit must be non-degenerate on the driver corpus: truth exists,
    // every searcher returns rows, and recalls live in [0, 1]
    assert(truth.nonEmpty)
    assert(audit.values.forall(v => v._1 > 0 && v._4 >= 0.0 && v._4 <= 1.0))
    // and at least one approximate searcher pays a real pruning cost OR
    // achieves perfect recall — either way the number is informative; what
    // can't happen is a recall above 1 or below the IVF spec floors pinned
    // in DedupSpec
    assert(audit("s5_ivf")._4 >= 0.5)
  }

  test("s11 incremental ingest == full rebuild against the same frozen centroids") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("_n", Similarity.norm(col("embedding")))
    val split = e.agg(floor(max("vec_id") * 0.8).cast("long")).as[Long].head()
    // the frozen quantizer: trained on the BASE only, exactly as s11 does
    val cents = Similarity
      .trainedCentroids(e.filter(col("vec_id") < split), nCells = 16, iters = 3)
      .select(col("cell"), col("cvec"), Similarity.norm(col("cvec")).as("_cn"))
    val full = Similarity.ivfSearch(e, cents, nQueries = 10, k = 5, nProbe = 4)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val inc = Similarity.ivfIngestDelta(spark, dir)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(inc == full, "ingest path must be bit-identical to a full rebuild")
    // the batch boundary is real: the delta is non-empty AND some delta
    // vector actually lands in the reported neighbors (otherwise the test
    // would pass with an ingest path that drops the delta entirely)
    assert(split <= e.agg(max("vec_id")).as[Long].head())
    assert(inc.exists(_._2 >= split), "no delta vector reached the top-K")
  }
}
