package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides these behind `private[sql]`;
  * living inside the org.apache.spark.sql package tree is the standard way
  * for an extension library to expose a custom Catalyst Expression as a
  * user-facing Column (same pattern as spark-connectors in the wild).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans — the
    * persist-lifecycle audit hook (CacheHygieneSpec): every query entry must
    * release what it persisted once its result is materialized. This
    * deliberately checks the SQL cache registry, not
    * `sparkContext.getPersistentRDDs` — eagerly `localCheckpoint`ed results
    * legitimately hold their (small) RDD blocks until GC.
    */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
