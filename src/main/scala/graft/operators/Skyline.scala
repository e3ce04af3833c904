package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the "best trade-off" query of
  * Börzsönyi, Kossmann & Stocker (ICDE 2001): keep every row not
  * dominated by another (dominated = some row is ≤ on cost AND ≥ on
  * gain, strictly better on at least one). The canonical use here is
  * catalog curation (cheapest part per quality level) and, in the
  * training-data pipeline, cost/quality frontier selection (tokens
  * vs quality score).
  *
  * The naive plan is a quadratic NOT EXISTS self-join; the classic
  * single-node plan is one global sort + running max — an
  * unpartitioned window, i.e. a single task at 100 TB. This
  * implementation uses the bucketed two-stage running-max instead
  * (the same trick the equi-depth histogram uses to avoid a global
  * sort window):
  *
  *   1. bucket rows by `cost div bucketWidth`; per-bucket max gain is
  *      ONE hash aggregation (data-sized, parallel);
  *   2. the running max over STRICTLY CHEAPER buckets is an ordered
  *      window over the bucket table — bounded by the cost DOMAIN
  *      (range/bucketWidth rows), not the corpus, so the single
  *      partition is deliberate and tiny;
  *   3. within each bucket, the strictly-cheaper max is a RANGE
  *      window partitioned by bucket (parallel across buckets), and
  *      the same-cost max a window keyed by (bucket, cost).
  *
  * A row survives iff gain > max gain over all strictly cheaper rows
  * AND gain = max gain at its exact cost — the dominance test reduced
  * to two window lookups. Costs are exact integers (cents), so the
  * RANGE frame offset of 1 is exact and both engines agree bit-wise.
  */
object Skyline {

  /** `in`: (id: long, cost: long, gain: long) — minimize cost,
    * maximize gain. Returns the skyline rows (id, cost, gain).
    * `bucketWidth` only shapes the plan, never the result.
    */
  def pareto2d(in: DataFrame, bucketWidth: Long = 100L): DataFrame = {
    require(bucketWidth >= 1)
    val b = in.withColumn("bk", expr(s"cost div $bucketWidth"))
    val bmax = b.groupBy(col("bk")).agg(max(col("gain")).as("bm"))
    // running max over strictly-cheaper buckets; domain-bounded window
    val prev = bmax.withColumn("pm",
      max(col("bm")).over(Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    val wIn = Window.partitionBy(col("bk")).orderBy(col("cost"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("bk"), col("cost"))
    b.join(prev.select(col("bk"), col("pm")), "bk")
      .withColumn("inb", max(col("gain")).over(wIn))
      .withColumn("eqm", max(col("gain")).over(wEq))
      .filter(col("gain") === col("eqm") &&
        col("gain") > greatest(
          coalesce(col("inb"), lit(Long.MinValue)),
          coalesce(col("pm"), lit(Long.MinValue))))
      .select(col("id"), col("cost"), col("gain"))
  }
}
