package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Near-dup operators validated on planted duplicates: a corpus where some
  * docs are exact copies, some are light edits, the rest unrelated — minhash
  * and simhash must recover the planted pairs, with the inverted-index exact
  * Jaccard as ground truth.
  */
class DedupSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // deterministic planted corpus written as a parquet `documents` table
  private lazy val dir: String = {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    def doc(seed: Int, n: Int): String = {
      val r = new java.util.Random(seed)
      (0 until n).map(_ => words(r.nextInt(words.size))).mkString(" ")
    }
    val base = (0 until 40).map(i => (i.toLong, doc(i * 7 + 1, 60)))
    val copies = (0 until 6).map(i => (100L + i, base(i)._2)) // exact dupes
    val edits = (0 until 6).map { i => // one word changed
      val toks = base(10 + i)._2.split(" "); toks(5) = "zulu"
      (200L + i, toks.mkString(" "))
    }
    val all = (base ++ copies ++ edits).map { case (id, t) =>
      (id, t, "en", "synthetic", t.length.toLong)
    }
    val d = Files.createTempDirectory(java.nio.file.Paths.get("target"), "dedup-").toString
    all.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def plantedExact = (0 until 6).map(i => (i.toLong, 100L + i)).toSet
  private def plantedEdits = (0 until 6).map(i => (10L + i, 200L + i)).toSet

  test("exact Jaccard (inverted index) finds planted exact and edited dupes") {
    val pairs = Dedup.ngramJaccardExact(spark, dir, threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(plantedExact.subsetOf(pairs), s"missing exact dupes: ${plantedExact -- pairs}")
    assert(plantedEdits.subsetOf(pairs), s"missing edit dupes: ${plantedEdits -- pairs}")
  }

  test("minhash LSH recovers all high-Jaccard planted pairs") {
    val got = Dedup.minhashLsh(spark, dir, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(plantedExact.subsetOf(got), s"minhash missed exact dupes: ${plantedExact -- got}")
    // est_jaccard for exact copies must be 1.0
    val est = Dedup.minhashLsh(spark, dir, threshold = 0.5)
      .filter(col("a") === 0 && col("b") === 100)
      .select("est_jaccard").as[Double].collect()
    assert(est.nonEmpty && est.head == 1.0)
  }

  test("simhash finds exact dupes at hamming 0 and edits within distance 3") {
    val got = Dedup.simhashNearDup(spark, dir, maxDist = 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(plantedExact.subsetOf(pairs), s"simhash missed exact dupes: ${plantedExact -- pairs}")
    got.filter(t => plantedExact.contains((t._1, t._2))).foreach { t =>
      assert(t._3 == 0, s"exact copy pair ${(t._1, t._2)} has hamming ${t._3}")
    }
  }

  // embed planted docs and store as an embeddings table in the same dir
  // (lazy: shared by every ANN/near-dup test, order-independent)
  private lazy val withEmbeddings: String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val rows = docs.map { case (id, t) =>
      (id, graft.link.Embedder.encode(t).toSeq, 0)
    }.toSeq
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("embedding near-dup flags planted copies via LSH buckets") {
    val got = Similarity.embeddingNearDup(spark, withEmbeddings, threshold = 0.999, dimLen = 32)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(plantedExact.subsetOf(got), s"embedding neardup missed: ${plantedExact -- got}")
  }

  test("LSH ANN achieves high recall vs brute force on the planted table") {
    val brute = Similarity.bruteForceTopK(spark, withEmbeddings, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(spark, withEmbeddings, nQueries = 10, k = 5, bits = 6, tables = 6, dimLen = 32)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"LSH recall vs brute force: $recall%.3f")
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("IVF ANN: probed-cell candidates give high recall vs brute force") {
    val brute = Similarity.bruteForceTopK(spark, withEmbeddings, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, withEmbeddings, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF recall@5 vs brute force: $recall%.3f")
    assert(recall >= 0.5, f"IVF recall too low: $recall%.3f") // 4/16 cells probed
  }

  test("incremental minhash == full minhash restricted to pairs touching the batch") {
    val full = Dedup.minhashLsh(spark, dir, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val split = spark.read.parquet(s"$dir/documents.parquet")
      .agg(org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.max($"doc_id") * 0.8).cast("long"))
      .as[Long].collect()(0)
    val inc = Dedup.minhashLshIncremental(spark, dir, splitId = split, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full.filter(_._2 >= split),
      "incremental must be exactly the full pairs whose higher id is in the batch")
    // and the batch boundary is real: some full pair must be corpus-only
    // (otherwise the test proves nothing about exclusion)
    assert(full.exists(_._2 < split), s"fixture has no corpus-only pair (split=$split)")
  }

  test("incremental minhash plan: corpus buckets never self-pair (batch filter one-sided)") {
    val sigs = Dedup.minhashSigs(spark, dir, 16)
    import org.apache.spark.sql.functions._
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band") +:
        (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1).as(s"r$r")): _*).as("bucket")
    }
    val buckets = sigs.select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("bucket"))
    val p = Dedup.minhashLshIncrementalFrame(buckets, splitId = 12345L,
        numHashes = 16, threshold = 0.5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // exactly one side of the bucket join carries the batch filter
    val filtered = p.linesIterator.count(l => l.contains("12345"))
    assert(filtered >= 1, "batch filter missing from the plan:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("trained IVF: Lloyd centroids match or beat the untrained first-N recall") {
    val brute = Similarity.bruteForceTopK(spark, withEmbeddings, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val untrained = recallOf(Similarity.ivfTopK(spark, withEmbeddings, nQueries = 10, k = 5))
    val trained = recallOf(Similarity.ivfTopKTrained(spark, withEmbeddings, nQueries = 10, k = 5))
    info(f"IVF recall@5 — untrained: $untrained%.3f, trained: $trained%.3f")
    assert(trained >= untrained,
      f"training must not lose recall: trained $trained%.3f < untrained $untrained%.3f")
    // determinism: the fixed-iteration Lloyd loop must reproduce its codebook
    val c1 = Similarity.trainedCentroids(
      spark.read.parquet(s"$withEmbeddings/embeddings.parquet"), nCells = 16, iters = 3)
      .collect().map(_.toString).sorted.toSeq
    val c2 = Similarity.trainedCentroids(
      spark.read.parquet(s"$withEmbeddings/embeddings.parquet"), nCells = 16, iters = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(c1 == c2 && c1.size == 16)
  }

  test("PQ ANN (s8): pipeline == independent Scala encode+ADC replay; recall vs brute force") {
    // fixture embeddings are 32-dim: m=4 subspaces of dsub=8
    val pq = Similarity.pqTopK(spark, withEmbeddings, nQueries = 10, k = 5,
      m = 4, dsub = 8, ksub = 16, iters = 2)
    val qe = spark.read.parquet(s"$withEmbeddings/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    val cents = Array.fill(4, 16)(Array.empty[Long])
    Similarity.pqCodebook(
      spark.read.parquet(s"$withEmbeddings/embeddings.parquet"), 4, 8, 16, 2)
      .as[(Int, Int, Seq[Long])].collect()
      .foreach { case (s, c, v) => cents(s)(c) = v.toArray }
    def l2(a: Seq[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def codes(v: Seq[Long]): Seq[Int] = (0 until 4).map { s =>
      val sv = v.slice(s * 8, (s + 1) * 8)
      (0 until 16).minBy(c => (l2(sv, cents(s)(c)), c))
    }
    def adc(q: Seq[Long], v: Seq[Long]): Long =
      (0 until 4).map(s => l2(q.slice(s * 8, (s + 1) * 8), cents(s)(codes(v)(s)))).sum
    val want = (0L until 10L).flatMap { qid =>
      qe.keys.filter(_ != qid).toSeq
        .map(n => (n, adc(qe(qid), qe(n))))
        .sortBy { case (n, d) => (d, n) }.take(5).zipWithIndex
        .map { case ((n, _), i) => (qid, n, i + 1) }
    }.toSet
    val got = pq.as[(Long, Long, Int)].collect().toSet
    assert(got == want, "Spark PQ pipeline must equal the independent replay")
    // unit-norm fixture vectors: L2 order == cosine order, so brute-force
    // cosine top-K is the right recall baseline for the quantized search
    val brute = Similarity.bruteForceTopK(spark, withEmbeddings, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect got.map(t => (t._1, t._2))).size.toDouble / brute.size
    info(f"PQ recall@5 vs brute force: $recall%.3f")
    assert(recall >= 0.2, f"PQ recall too low: $recall%.3f")
  }

  test("IVF-PQ (s9): pipeline == independent Scala coarse+residual+ADC replay") {
    val pq = Similarity.ivfPqTopK(spark, withEmbeddings, nQueries = 10, k = 5,
      nCells = 8, nProbe = 2, m = 4, dsub = 8, ksub = 16, iters = 2)
    val qe = spark.read.parquet(s"$withEmbeddings/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    val coarse: IndexedSeq[Seq[Long]] = (0 until 8).map(c => qe(c.toLong))
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cellOf(v: Seq[Long]): Int = (0 until 8).minBy(c => (l2(v, coarse(c)), c))
    def resid(v: Seq[Long], c: Int): Seq[Long] =
      v.zip(coarse(c)).map { case (x, y) => x - y }
    // train the residual codebook from THIS replay's residuals — identical
    // to the pipeline's only if the in-row cell assignment agrees
    val residDf = qe.toSeq.map { case (id, v) => (id, resid(v, cellOf(v))) }
      .toDF("vec_id", "q")
    val cents = Array.fill(4, 16)(Seq.empty[Long])
    Similarity.pqCodebookQuantized(residDf, 4, 8, 16, 2)
      .as[(Int, Int, Seq[Long])].collect()
      .foreach { case (s, c, v) => cents(s)(c) = v }
    def codes(r: Seq[Long]): Seq[Int] = (0 until 4).map { s =>
      val sv = r.slice(s * 8, (s + 1) * 8)
      (0 until 16).minBy(c => (l2(sv, cents(s)(c)), c))
    }
    def adc(qr: Seq[Long], vcodes: Seq[Int]): Long =
      (0 until 4).map(s => l2(qr.slice(s * 8, (s + 1) * 8), cents(s)(vcodes(s)))).sum
    val want = (0L until 10L).flatMap { qid =>
      val probeCells = (0 until 8).sortBy(c => (l2(qe(qid), coarse(c)), c)).take(2).toSet
      qe.keys.filter(_ != qid).toSeq
        .map(n => (n, cellOf(qe(n))))
        .filter { case (_, c) => probeCells.contains(c) }
        .map { case (n, c) => (n, adc(resid(qe(qid), c), codes(resid(qe(n), c)))) }
        .sortBy { case (n, d) => (d, n) }.take(5).zipWithIndex
        .map { case ((n, _), i) => (qid, n, i + 1) }
    }.toSet
    val got = pq.as[(Long, Long, Int)].collect().toSet
    assert(got == want, "Spark IVF-PQ pipeline must equal the independent replay")
    assert(got.nonEmpty)
  }

  test("PQ codebook is deterministic across input partitionings") {
    val e = spark.read.parquet(s"$withEmbeddings/embeddings.parquet")
    val c1 = Similarity.pqCodebook(e.repartition(2), 4, 8, 16, 2)
      .collect().map(_.toString).sorted.toSeq
    val c2 = Similarity.pqCodebook(e.repartition(7), 4, 8, 16, 2)
      .collect().map(_.toString).sorted.toSeq
    assert(c1 == c2 && c1.size == 64)
  }

  test("s7 blocking audit: counts cross-check against the exact and LSH pair sets") {
    spark.catalog.clearCache()
    val dirE = "/root/testdata/sf0.001"
    val m = Similarity.blockingQuality(spark, dirE, threshold = 0.3).collect().head
    // independent reconstruction: truth from the exact baseline, candidates
    // from the LSH path with an always-true threshold (cos ≥ -2 keeps every
    // bucket-cojoined pair)
    val truth = Similarity.embeddingNearDupExact(spark, dirE, threshold = 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val cand = Similarity.embeddingNearDup(spark, dirE, threshold = -2.0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val nVec = m.getLong(0)
    assert(m.getLong(1) == nVec * (nVec - 1) / 2)
    assert(m.getLong(2) == cand.size.toLong, "n_candidates")
    assert(m.getLong(3) == truth.size.toLong, "n_truth")
    assert(m.getLong(4) == (truth intersect cand).size.toLong, "n_covered")
    assert(m.getDouble(5) == (truth intersect cand).size.toDouble / truth.size)
    assert(m.getDouble(6) == 1.0 - cand.size.toDouble / m.getLong(1).toDouble)
    assert(m.getDouble(7) == (truth intersect cand).size.toDouble / cand.size)
    // audit invariants: blocking prunes, and precision ≤ 1 ≥ completeness
    assert(m.getLong(2) < m.getLong(1), "blocking must prune the pair space")
    assert(m.getDouble(5) > 0.0 && m.getDouble(5) <= 1.0)
    assert(org.apache.spark.sql.graftbridge.Bridge.cacheIsEmpty(spark),
      "s7 left frames cached")
  }

  test("dedup apply: verdicts == union-find over the LSH pairs, keeper = min id") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty) // planted dupes must produce clusters to check
    // independent reference: plain union-find with path compression
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(id => id -> find(id)).toMap
    val got = Dedup.dedupApply(spark, dir)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, canon, kept) => id -> ((canon, kept)) }.toMap
    assert(got.keySet == expected.keySet,
      "every doc touched by a pair gets exactly one verdict row")
    expected.foreach { case (id, root) =>
      assert(got(id) == ((root, id == root)), s"doc $id")
    }
    // exactly one keeper per cluster, and it is the min id
    val byCluster = got.groupBy(_._2._1)
    byCluster.foreach { case (canon, members) =>
      assert(members.count(_._2._2) == 1 && members(canon)._2)
      assert(canon == members.keys.min)
    }
  }
}
