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
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
