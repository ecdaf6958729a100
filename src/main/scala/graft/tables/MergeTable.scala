package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-*semantics* table: bucketed Parquet + JSON snapshot manifests +
  * key-based MERGE, per SURVEY.md §7.4 (no Iceberg jar in the sandbox; the
  * interface is what a real Iceberg catalog would replace).
  *
  * Layout:
  *   path/data/snap-N/_bucket=K/ (parquet)  — data written by snapshot N
  *   path/_manifests/v{N}.json              — snapshot manifest:
  *       {snapshotId, parent, rowCount, buckets: {K -> snap that owns K}}
  *   path/_current                          — current snapshot id (atomic move)
  *
  * MERGE is read-merge-rewrite of *touched buckets only*: rows hash-bucket by
  * key; a merge reads just the buckets present in the incoming batch,
  * anti-joins old-by-key, unions, and rewrites those buckets under a new
  * snapshot — unaffected buckets keep their old files (manifest pointers
  * carry over). At 100 TB this bounds merge I/O to O(touched data), the same
  * contract as Iceberg MERGE with bucket partitioning.
  *
  * Idempotency: deterministic keys + MERGE ⇒ re-running a stage converges to
  * the same table (ref analog: `INSERT … ON CONFLICT` upserts +
  * deterministic `_id = qid_lang_chunk`, src/wikidataDB.py:46-76,
  * docker/3_Add_Wikidata_to_AstraDB/run.py:88).
  */
final class MergeTable(spark: SparkSession, val path: String,
                       val keyCols: Seq[String], val numBuckets: Int = 32) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def currentFile = Paths.get(path, "_current")
  private def manifestFile(v: Long) = Paths.get(path, "_manifests", s"v$v.json")

  def currentSnapshot: Option[Long] =
    if (Files.exists(currentFile)) Some(Files.readString(currentFile).trim.toLong) else None

  def exists: Boolean = currentSnapshot.isDefined

  private def readManifest(v: Long): (Long, Map[Int, Long], Long) = {
    val node = mapper.readTree(Files.readString(manifestFile(v)))
    val buckets = node.get("buckets").properties().asScala
      .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
    (node.get("parent").asLong(), buckets, node.get("rowCount").asLong())
  }

  def rowCount: Long = currentSnapshot.map(readManifest(_)._3).getOrElse(0L)

  private def bucketDir(snap: Long, bucket: Int): String =
    s"$path/data/snap-$snap/_bucket=$bucket"

  private def bucketExpr = pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast("int")

  /** Current table contents (without the internal bucket column). */
  def read(): DataFrame = currentSnapshot match {
    case None => throw new IllegalStateException(s"table $path has no snapshot")
    case Some(v) => readSnapshot(v)
  }

  /** Time travel: the table as of snapshot `v` — manifests are immutable and
    * old bucket files are never rewritten, so any historical snapshot stays
    * readable (Iceberg snapshot-read semantics).
    */
  def readSnapshot(v: Long): DataFrame = {
    val (_, buckets, _) = readManifest(v)
    val dirs = buckets.toSeq.map { case (b, snap) => bucketDir(snap, b) }
      .filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }

  /** All snapshot ids, oldest first. */
  def snapshots: Seq[Long] = {
    val dir = Paths.get(path, "_manifests")
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).toArray.map(_.toString)
      .flatMap(s => "v(\\d+)\\.json$".r.findFirstMatchIn(s).map(_.group(1).toLong))
      .sorted.toSeq
  }

  def readOrEmpty(schemaOf: DataFrame): DataFrame =
    if (exists) read() else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf.schema)

  /** MERGE: upsert `df` by key. New rows win over old rows with the same key.
    * Returns the new snapshot id.
    */
  def merge(df: DataFrame): Long = {
    val newSnap = currentSnapshot.getOrElse(0L) + 1
    val incoming = df.dropDuplicates(keyCols).withColumn("_bucket", bucketExpr)

    val (oldBuckets: Map[Int, Long], parent: Long) = currentSnapshot match {
      case Some(v) => (readManifest(v)._2, v)
      case None    => (Map.empty[Int, Long], 0L)
    }

    // buckets touched by this batch
    val touched = incoming.select("_bucket").distinct().collect().map(_.getInt(0)).toSet
    val touchedWithData = touched.filter(oldBuckets.contains)

    val merged =
      if (touchedWithData.isEmpty) incoming
      else {
        val oldDirs = touchedWithData.toSeq.map(b => bucketDir(oldBuckets(b), b))
        val old = spark.read.parquet(oldDirs: _*).withColumn("_bucket", bucketExpr)
        val survivors = old.join(incoming.select(keyCols.map(col): _*), keyCols, "left_anti")
        survivors.unionByName(incoming)
      }

    Files.createDirectories(Paths.get(path, "_manifests"))
    merged.write.mode("overwrite").partitionBy("_bucket")
      .parquet(s"$path/data/snap-$newSnap")

    // new manifest: touched buckets point at newSnap, others carry over
    val newBuckets = oldBuckets ++ touched.map(_ -> newSnap).toMap
    val rowCount = {
      val keptOld = currentSnapshot match {
        case Some(_) if (oldBuckets.keySet -- touched).nonEmpty =>
          val dirs = (oldBuckets.keySet -- touched).toSeq.map(b => bucketDir(oldBuckets(b), b))
            .filter(d => Files.exists(Paths.get(d)))
          if (dirs.isEmpty) 0L else spark.read.parquet(dirs: _*).count()
        case _ => 0L
      }
      keptOld + merged.count()
    }
    val bucketsJson = newBuckets.toSeq.sortBy(_._1)
      .map { case (b, s) => s""""$b": $s""" }.mkString("{", ", ", "}")
    val json =
      s"""{"snapshotId": $newSnap, "parent": $parent, "rowCount": $rowCount,
         | "createdMs": ${System.currentTimeMillis()}, "buckets": $bucketsJson}""".stripMargin
    Files.writeString(manifestFile(newSnap), json)

    // atomic-ish current pointer flip
    val tmp = Paths.get(path, s"_current.tmp")
    Files.writeString(tmp, newSnap.toString)
    Files.move(tmp, currentFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    newSnap
  }
}
