package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal KG maintenance: collapse repeated per-crawl observations of a
  * single-valued fact into SCD-2 validity intervals. A crawl that
  * re-extracts an unchanged triple must NOT open a new version — only
  * value CHANGES do. (Wikidata models this explicitly with P580/P582
  * qualifiers; a web crawl has to RECOVER it from fetch timestamps, which
  * is exactly this operator.)
  *
  * Scale shape: two window functions over the SAME (keys, ts) partitioning
  * — Catalyst plans one Exchange + one Sort and stacks both Window
  * operators on it, so the whole history build is a single shuffle of
  * (keys, value, ts) scalars. No self-join, no collect.
  */
object Scd {

  /** observations (keyCols…, valueCol, tsCol) → one row per maximal run of
    * equal consecutive values per key: (keyCols…, value, valid_from,
    * valid_to) with valid_to NULL on the current version. Timestamps must
    * be unique per key (distinct crawl windows); a re-observation of the
    * SAME value extends the open interval instead of versioning it.
    */
  def intervals(obs: DataFrame, keyCols: Seq[String],
                valueCol: String, tsCol: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val byTs = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val changePoints = obs
      .withColumn("_prev", lag(col(valueCol), 1).over(byTs))
      .withColumn("_prevTs", lag(col(tsCol), 1).over(byTs))
      // first observation, or a genuine value change. "First" is detected
      // on the TIMESTAMP lag (never null), not the value lag — a lagged
      // NULL value is ambiguous between "no previous row" and "previous
      // value was NULL", and conflating them would re-version repeated
      // NULL observations. The value comparison itself is null-safe (<=>),
      // so NULL → x and x → NULL transitions version correctly.
      .filter(col("_prevTs").isNull || !(col(valueCol) <=> col("_prev")))
    changePoints
      .select((keys :+ col(valueCol).as("value") :+ col(tsCol).as("valid_from")): _*)
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keys: _*).orderBy(col("valid_from"))))
  }
}
