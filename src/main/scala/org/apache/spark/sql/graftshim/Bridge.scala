package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Compile-time bridge into Spark's `private[sql]` Column ↔ Expression
  * converters. Spark 4 removed the public `Column(expr)` constructor
  * (Column is now backed by a `ColumnNode`); the supported internal
  * path is `org.apache.spark.sql.classic.ExpressionUtils`. This object
  * lives under `org.apache.spark.sql` purely to satisfy the
  * `private[sql]` qualifier — it contains no Spark code.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a Catalyst expression
    * builder (the SQL-surface twin of the Column API — lets
    * `spark.sql("SELECT sdbm_hash(...)")` resolve without a UDF).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
