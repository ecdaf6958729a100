package graft.streaming

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming IVF ingest twin must assign every delta vector to the
  * SAME cell as the batch `Similarity.ivfAssign` — byte-equal (vec_id,
  * cell) rows — so a deployment can switch the s11 delta half to a stream
  * without the index drifting.
  */
class VectorStreamSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming delta assignment == batch ivfAssign on the frozen codebook") {
    // the file stream source needs a DIRECTORY; the fixture table is a
    // single parquet file — stage it into one (the CrawlStreamSpec pattern)
    val embDir = {
      val root = Files.createTempDirectory(Paths.get("target"), "vecin-").toString
      Files.copy(Paths.get(s"$dir/embeddings.parquet"),
        Paths.get(root, "b00.parquet"))
      root
    }
    val e = spark.read.parquet(embDir)
      .withColumn("_n", Similarity.norm(col("embedding")))
    val split = e.agg(floor(max("vec_id") * 0.8).cast("long")).as[Long].head()
    val centsDf = Similarity
      .trainedCentroids(e.filter(col("vec_id") < split), nCells = 16, iters = 3)
      .select(col("cell"), col("cvec"), Similarity.norm(col("cvec")).as("_cn"))

    val batch = Similarity.ivfAssign(e.filter(col("vec_id") >= split), centsDf)
      .select(col("vec_id"), col("cell").cast("int"))
      .as[(Long, Int)].collect().toMap

    val centsArr: Array[Array[Float]] = centsDf
      .select(col("cell"), col("cvec")).as[(Int, Seq[Float])]
      .collect().sortBy(_._1).map(_._2.toArray)
    val bc = spark.sparkContext.broadcast(centsArr)
    val checkpoint = Files.createTempDirectory(
      Paths.get("target"), "vecstream-").toString
    val got = StreamingExtract.drain(spark,
        VectorStream.ivfIngestStream(spark, embDir, split, bc),
        "ivf_ingest_stream", checkpoint)
      .as[(Long, Int)].collect().toMap
    bc.destroy()

    assert(got.nonEmpty && got.keySet == batch.keySet,
      s"stream must cover exactly the delta (${batch.size} vectors)")
    val diff = got.collect { case (id, c) if batch(id) != c => (id, c, batch(id)) }
    assert(diff.isEmpty, s"cells diverged: ${diff.take(5)}")
  }
}
