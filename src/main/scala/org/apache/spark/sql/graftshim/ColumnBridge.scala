package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 made the Column ↔ Expression conversion helpers `private[sql]`
  * (the Column API was decoupled from Catalyst for Spark Connect). Custom
  * native expressions still need the conversion on the classic driver
  * path, so this shim — placed under the `org.apache.spark.sql` package, a
  * standard technique for Spark extension libraries — re-exposes exactly
  * the two helpers and nothing else.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime function registration for sessions built WITHOUT
    * `spark.sql.extensions=graft.functions.GraftExtensions` (e.g. the
    * harness driver's): makes the custom expressions callable from
    * `spark.sql(...)` on an already-running session.
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
