package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV sketch must (a) BE the k smallest distinct hashes — checked
  * against a driver-side sort — whatever the partitioning (merge path) or
  * duplication of the input, (b) estimate within KMV theory's error on
  * random data, and (c) agree exactly with the relational window
  * definition the d8 oracle uses.
  */
class SketchesSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val k = 32

  test("sketch == k smallest distinct hashes under repartition + duplicates") {
    val rnd = new scala.util.Random(20260817L)
    val vals = (1 to 5000).map(_ => s"v${rnd.nextInt(1200)}") // heavy dups
    val df = vals.toDF("v").withColumn("h", Sketches.kmvHash(col("v")))
    val hashes = df.select("h").as[Long].collect().toSet.toArray.sorted
    val want = hashes.take(k).toSeq

    val kmv = udaf(new Sketches.KmvAgg(k))
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts).agg(kmv(col("h"))).as[Seq[Long]].head()
      assert(got == want, s"parts=$parts")
    }
  }

  test("estimate within 4 sigma of exact on seeded random sets; exact below k") {
    val rnd = new scala.util.Random(7L)
    for (n <- Seq(10, 31, 500, 5000)) {
      val df = (1 to n).map(i => s"item_${i}_${rnd.nextInt()}").toDF("v")
        .withColumn("h", Sketches.kmvHash(col("v")))
      val kmv = udaf(new Sketches.KmvAgg(k))
      val est = df.agg(kmv(col("h")).as("mins"))
        .select(Sketches.kmvEstimate(col("mins"), k)).as[Double].head()
      if (n < k) assert(est == n.toDouble, s"n=$n must be exact")
      else {
        val sigma = 1.0 / math.sqrt(k - 2)
        assert(math.abs(est - n) / n < 4 * sigma, s"n=$n est=$est")
      }
    }
  }

  test("CMS: estimate >= exact always, == exact absent collisions, partition-invariant") {
    val rnd = new scala.util.Random(20260817L)
    // zipf-ish: token i appears ~ 600/i times
    val toks = (1 to 120).flatMap(i => Seq.fill(600 / i)(s"tok$i"))
    val shuffled = rnd.shuffle(toks)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (d, w) = (4, 512)
    for (parts <- Seq(1, 13)) {
      val tdf = shuffled.toDF("t").repartition(parts)
      val counters = Sketches.cmsCounters(tdf, d, w)
      val probes = exact.keys.toSeq.toDF("t")
      val est = Sketches.cmsEstimate(counters, probes, d, w)
        .as[(String, Long)].collect().toMap
      assert(est.keySet == exact.keySet)
      exact.foreach { case (t, n) =>
        assert(est(t) >= n, s"$t: CMS must never underestimate")
      }
      // w=512 over 120 tokens: expect a large majority exact (min over 4 rows)
      val exactHits = exact.count { case (t, n) => est(t) == n }
      assert(exactHits >= exact.size * 9 / 10, s"only $exactHits/${exact.size} exact")
    }
    // an unseen token estimates 0 (empty buckets coalesce)
    val est0 = Sketches.cmsEstimate(
      Sketches.cmsCounters(shuffled.toDF("t"), d, w), Seq("NEVER_SEEN").toDF("t"), d, w)
      .as[(String, Long)].collect().toMap
    assert(est0("NEVER_SEEN") >= 0) // 0 unless all 4 buckets collide with real tokens
  }

  test("bottom-k sample == driver-side k smallest (h, id); quantile idx exact") {
    val rnd = new scala.util.Random(20260817L)
    val rows = (1 to 800).map(i => (i.toLong, rnd.nextInt(10000).toLong))
    val df = rows.toDF("doc_id", "n_chars")
      .withColumn("h", Sketches.kmvHash(col("doc_id").cast("string")))
    val hs = df.select("h", "doc_id", "n_chars").as[(Long, Long, Long)].collect()
    val want = hs.sortBy(r => (r._1, r._2)).take(32).toSeq
    val sampler = udaf(new Sketches.BottomKSampleAgg(32))
    for (parts <- Seq(1, 11)) {
      val got = df.repartition(parts)
        .agg(sampler(col("h"), col("doc_id"), col("n_chars")))
        .as[Seq[(Long, Long, Long)]].head()
      assert(got == want, s"parts=$parts")
    }
    // feeding duplicates must not change the sample
    val got2 = df.unionByName(df.limit(100))
      .agg(sampler(col("h"), col("doc_id"), col("n_chars")))
      .as[Seq[(Long, Long, Long)]].head()
    assert(got2 == want)
  }

  test("d10 query: exact order stats right; estimates within sample tolerance") {
    val dir = "/root/testdata/sf0.001"
    val got = Sketches.d10QuantileSample(spark, dir)
      .as[(String, Long, Int, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, n, m, estP50, estP90, exactP50, exactP90) =>
      // exact columns against a driver-side sort
      val all = Relational.table(spark, dir, "documents")
        .filter(col("lang") === lang)
        .select("n_chars", "doc_id").as[(Long, Long)].collect()
        .sortBy(identity).map(_._1)
      assert(n == all.length)
      assert(exactP50 == all(((n - 1) / 2).toInt), lang)
      assert(exactP90 == all((((n - 1) * 9) / 10).toInt), lang)
      assert(m == math.min(64, n))
      // a 64-point uniform sample's p50/p90 land within a generous rank band
      def rankOf(v: Long) = all.count(_ <= v).toDouble / n
      assert(math.abs(rankOf(estP50) - 0.5) < 0.25, s"$lang p50 rank ${rankOf(estP50)}")
      assert(math.abs(rankOf(estP90) - 0.9) < 0.25, s"$lang p90 rank ${rankOf(estP90)}")
    }
  }

  test("d8 query: est column equals the relational window replica, rows per lang") {
    val dir = "/root/testdata/sf0.001"
    val got = Sketches.d8KmvDistinct(spark, dir)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // relational replica of the oracle's definition, in Spark
    val h = Relational.table(spark, dir, "documents")
      .select(col("lang"), Sketches.kmvHash(col("text")).as("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("h")
    val want = h.withColumn("rn", row_number().over(w))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), max(when(col("rn") === 64, col("h"))).as("hk"))
      .select(col("lang"), col("n"),
        when(col("hk").isNull, col("n").cast("double"))
          .otherwise(lit(63.0) / (col("hk").cast("double") / lit(1152921504606846976.0))))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("bloom OR-bitset: exactly the planted bits, invariant to partitioning; out-of-range fails loudly") {
    val mBits = 256
    val rnd = new scala.util.Random(20260818L)
    val rows = (1 to 400).map(_ =>
      Array.fill(3)(rnd.nextInt(mBits))) // heavy duplication across rows
    val wantBits = rows.flatten.toSet
    val bloom = udaf(new Sketches.BloomOrAgg(mBits))
    for (parts <- Seq(1, 8)) {
      val words = rows.toDF("ps").repartition(parts)
        .agg(bloom(col("ps"))).as[Seq[Long]].head()
      assert(words.length == mBits / 64)
      val gotBits = (0 until mBits).filter(p =>
        ((words(p >>> 6) >>> (p & 63)) & 1L) == 1L).toSet
      assert(gotBits == wantBits, s"parts=$parts")
    }
    val err = intercept[org.apache.spark.SparkException] {
      Seq(Array(mBits)).toDF("ps").agg(bloom(col("ps"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("d25 HLL == independent register replay; accuracy; linear-counting branch") {
    // three languages: big vocab (raw-estimate branch), tiny vocab
    // (linear-counting branch), singleton
    val rnd = new scala.util.Random(20260818L)
    val big = (1 to 300).map(_ => (1 to 12).map(_ => s"w${rnd.nextInt(3000)}").mkString(" "))
    val tiny = (1 to 40).map(_ => (1 to 5).map(_ => s"t${rnd.nextInt(12)}").mkString(" "))
    val rows =
      big.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") } ++
      tiny.zipWithIndex.map { case (t, i) => (1000L + i, t, "de") } ++
      Seq((2000L, "solo", "fr"))
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "hll-").toString
    rows.toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent driver-side HLL replay (same hash recipe, same op order)
    def md5hex60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def replay(texts: Seq[String]): (Long, Double, Double) = {
      val toks = texts.filter(_.trim.nonEmpty)
        .flatMap(_.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty))
      val regs = new Array[Int](64)
      toks.foreach { t =>
        val h = md5hex60(t)
        val b = (h % 64).toInt
        val w = h >>> 6
        val rho = if (w == 0) 55 else 55 - java.lang.Long.toBinaryString(w).length
        if (rho > regs(b)) regs(b) = rho
      }
      val s = regs.map(r => 1L << (55 - r)).sum.toDouble
      val v = regs.count(_ == 0).toLong
      val alpha = 0.7213 / (1.0 + 1.079 / 64.0)
      val raw = alpha * 4096.0 * (1L << 55).toDouble / s
      val e = if (raw <= 160.0 && v > 0) 64.0 * math.log(64.0 / v.toDouble) else raw
      val exact = toks.distinct.size.toLong
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (exact, r6(e), r6((e - exact.toDouble) / exact.toDouble))
    }
    val want = Map(
      "en" -> replay(big), "de" -> replay(tiny), "fr" -> replay(Seq("solo")))

    val got = Sketches.d25HllDistinct(spark, dir)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set("en", "de", "fr"))
    want.foreach { case (lang, w) =>
      assert(got(lang) == w, s"$lang: got ${got(lang)}, want $w")
    }
    // branch sanity: the tiny vocab must have taken linear counting (raw
    // estimate far below 160 with empty registers) and be near-exact there
    assert(math.abs(got("de")._2 - got("de")._1.toDouble) / got("de")._1 < 0.35)
    // the big vocab rides the raw branch within HLL theory (1.04/√64 ≈ 13%
    // σ; allow 4σ)
    assert(math.abs(got("en")._3) < 0.52, s"en rel_err ${got("en")._3}")
  }
}
