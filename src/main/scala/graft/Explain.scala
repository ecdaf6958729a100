package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for the queries whose plan
  * shape carries the scale contract (pushdown, broadcast choice, codegen
  * spans). `sbt "runMain graft.Explain [name ...]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q6_forecast_revenue", "q2_revenue_by_nation", "kg4_triples", "s1_ann_brute")
    names.foreach { name =>
      if (name.startsWith("time:")) {
        val q = name.stripPrefix("time:")
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).count()
          println(f"[time] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } else {
        println(s"\n========== $name ==========")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
