package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The s11 incremental-ANN ingest path as a Structured Stream (SURVEY.md
  * §2.9): newly arriving vectors assign to the FROZEN coarse codebook as a
  * stateless narrow map over the stream — no state store, no watermark,
  * because cell assignment is a pure per-row function of (vector,
  * centroids). This is the streaming twin of `Similarity.ivfAssign`
  * restricted to the delta batch, spec-pinned byte-equal to it; the
  * persisted index then grows by MERGE exactly as the batch ingest does.
  */
object VectorStream {

  /** Cell assignment mirroring the batch Column pipeline BIT-EXACTLY:
    * cosine = fdot(v,c) / (sqrt(fdot(v,v)) * sqrt(fdot(c,c))) with float
    * multiplies and double accumulation in array order (the graft_fdot
    * contract), 0.0 when a norm product is zero (the cosineWithNorms
    * guard), and ties to the LOWER cell id (the row_number (cos DESC, cell
    * ASC) tie-break) via strict greater-than. Embedder.cosine is NOT used:
    * its sqrt(na·nb) differs from sqrt(na)·sqrt(nb) in the last ulp, which
    * an argmax near a tie would surface.
    */
  def assignCell(v: Array[Float], cents: Array[Array[Float]]): Int = {
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val nv = math.sqrt(fdot(v, v))
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val denom = nv * math.sqrt(fdot(cents(c), cents(c)))
      val cos = if (denom == 0.0) 0.0 else fdot(v, cents(c)) / denom
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** Streaming delta ingest over an embeddings parquet directory: rows with
    * `vec_id >= splitId` (the s11 batch-boundary rule) assign to the
    * broadcast codebook. Returns a streaming (vec_id, cell) frame — the
    * index rows a real deployment MERGEs into the persisted base.
    */
  def ivfIngestStream(spark: SparkSession, embDir: String, splitId: Long,
                      cents: Broadcast[Array[Array[Float]]]): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(embDir).schema
    spark.readStream.schema(schema).parquet(embDir)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .filter(_._1 >= splitId)
      .map { case (id, v) => (id, assignCell(v.toArray, cents.value)) }
      .toDF("vec_id", "cell")
  }
}
