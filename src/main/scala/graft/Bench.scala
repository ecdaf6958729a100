package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * printed as one JSON line.
  *
  * Each query runs twice and the second (steady-state) time is reported:
  * the first execution pays JVM JIT + whole-stage-codegen compilation,
  * which at real scale amortizes to zero but at sf0.1 dominated the
  * measurement noise (the same query swung 0.6s ↔ 8s depending on run
  * order).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      timeOnce(fn) // warm-up: JIT + codegen compile
      // drop the warm-up's persisted intermediates BEFORE timing: the
      // CacheManager substitutes identical plan subtrees with the warm-up's
      // InMemoryRelations (posting lists, signature frames, texts), which
      // would let the timed run skip the work those caches represent — the
      // timed number must include building a query's own caches
      spark.catalog.clearCache()
      val t = name -> timeOnce(fn)
      // and clear again so a long session's block manager doesn't
      // accumulate one cache per query
      spark.catalog.clearCache()
      t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
