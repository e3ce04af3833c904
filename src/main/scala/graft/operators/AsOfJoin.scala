package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, attach the latest
  * right row with the same key and `rightTime <= leftTime` — the
  * operator the prompt's custom-op ladder names first. Built by
  * COMPOSITION (preference (a)): tag both sides, union, and take
  * `last(non-null right, ignoreNulls)` over a key-partitioned window
  * ordered by (time, side). One shuffle on the key, no range
  * cross-product, works at any skewless scale; a custom
  * LogicalPlan/Strategy is not needed because the built-ins express
  * the semantics exactly (SURVEY.md §4 verdict).
  *
  * Ties: a right row at exactly leftTime matches (inclusive), because
  * the side tag sorts right(0) before left(1) at equal times. Callers
  * should dedupe the right side to unique (key, time) first if
  * multiple right rows can share a timestamp — as-of semantics are
  * otherwise ambiguous on every engine.
  */
object AsOfJoin {

  /** Left as-of join. Output: all left columns plus `rightCols` from
    * the matched right row (null when no right row precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lvType = StructType(leftCols.map(c => left.schema(c)))
    val rvType = StructType(rightCols.map(c => right.schema(c)))
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lv"),
      lit(null).cast(rvType).as("__rv"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lvType).as("__lv"),
      struct(rightCols.map(col): _*).as("__rv"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val projected = leftCols.map(c => col("__lv").getField(c).as(c)) ++
      rightCols.map(c => col("__match").getField(c).as(c))
    matched.select(projected: _*)
  }
}
