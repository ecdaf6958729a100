package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over the `documents` table — the training-data
  * dedup family: exact, MinHash+LSH banding, SimHash, n-gram Jaccard.
  * Generalizes the reference's `ON CONFLICT DO NOTHING` exact dedup
  * (src/wikidataDB.py:46-76) to fuzzy matching at corpus scale.
  *
  * Scale shape shared by all of them: map each doc to a small signature
  * (narrow, codegen/UDF-light), shuffle only (signature, doc_id) pairs,
  * join/group within buckets — the raw text never crosses the wire twice.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Word 3-gram shingles as a Column (codegen: split + transform + filter). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(filter(
      transform(toks, (_, i) => when(i <= size(toks) - n,
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))),
      x => x.isNotNull))
  }

  /** k seeded hash values per element → MinHash signature entry h_i = min over
    * shingles of hash(shingle, i). Pure column algebra over xxhash64.
    */
  private def minhashSig(sh: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(sh, x => xxhash64(x, lit(i))))
    }

  /** MinHash + LSH banding: docs sharing any band bucket are candidate pairs;
    * verified by exact signature agreement ratio (estimates Jaccard).
    * Returns (a, b, est_jaccard) with a < b.
    */
  def minhashLsh(spark: SparkSession, dir: String, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rows = bands // rows per band = numHashes / bands
    val d = docs(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id") +: minhashSig(col("sh"), numHashes).zipWithIndex
        .map { case (c, i) => c.as(s"h$i") }: _*)

    val perBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band") +:
        (0 until perBand).map(r => col(s"h${b * perBand + r}").as(s"r$r")): _*).as("bucket")
    }
    val buckets = d.select(col("doc_id") +: (0 until numHashes).map(i => col(s"h$i")) :+
      explode(array(bandCols: _*)).as("bucket"): _*)

    val l = buckets.select(col("bucket"), col("doc_id").as("a"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("siga"))
    val r = buckets.select(col("bucket"), col("doc_id").as("b"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("sigb"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash per doc: sign of per-bit weighted sums of token hashes.
    * Near-dups = hamming distance ≤ maxDist within 16-bit block buckets
    * (pigeonhole: dist ≤ 3 ⇒ at least one of 4 blocks equal).
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(lower(trim(text)), "\\W+"))
    val h = transform(toks, t => xxhash64(t))
    (0 until 64).map { bit =>
      val mask = lit(1L << bit)
      val vote = aggregate(h, lit(0L),
        (acc, x) => acc + when(x.bitwiseAND(mask) =!= 0L, 1L).otherwise(-1L))
      when(vote > 0, mask).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  def simhashNearDup(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), simhash(col("text")).as("sig"))
    val blocks = (0 until 4).map { b =>
      d.select(col("doc_id"), col("sig"),
        lit(b).as("block"), shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }.reduce(_ unionByName _)
    val l = blocks.select(col("block"), col("key"), col("doc_id").as("a"), col("sig").as("siga"))
    val r = blocks.select(col("block"), col("key"), col("doc_id").as("b"), col("sig").as("sigb"))
    l.join(r, Seq("block", "key")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Exact n-gram Jaccard over all pairs sharing ≥1 shingle, via an
    * inverted-index join: explode (doc, shingle), self-join on shingle,
    * count matches per pair = |A∩B| (shingles are distinct per doc), then
    * |A∪B| = |A|+|B|−|A∩B| from per-doc sizes. No arrays cross the shuffle,
    * so this is the 100 TB-exact-dedup shape (pair space bounded by shared
    * shingles, not n²). DuckDB-oracle-backed.
    */
  def ngramJaccardExact(spark: SparkSession, dir: String, threshold: Double = 0.03): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = d.select(col("doc_id"), size(col("sh")).as("nsh"))
    val inv = d.select(col("doc_id"), explode(col("sh")).as("g"))
    val inter = inv.as("x").join(inv.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("nsh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("nsh").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard for candidate pairs from minhash LSH — the
    * verify-stage exact re-check (candidates only; never all pairs).
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val cands = minhashLsh(spark, dir, threshold = 0.2).select("a", "b")
    val d = docs(spark, dir).select(col("doc_id"), shingles(col("text")).as("sh"))
    cands
      .join(d.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(d.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
