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
}
