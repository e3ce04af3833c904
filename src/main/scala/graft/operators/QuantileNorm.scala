package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across groups — map every group's value
  * distribution onto the POOLED distribution (the microarray-era
  * distribution aligner, Bolstad et al. 2003, reused in corpus work to
  * make per-source quality/length scores comparable before global
  * thresholding: a source whose scorer runs hot no longer floods a
  * top-p cut).
  *
  * Exact-rank formulation, no interpolation (interpolation formulas
  * are the classic cross-engine hazard): a row at rank r of its
  * group's n values maps to the pooled value at rank ⌈r·N/n⌉ =
  * (r·N + n − 1) div n. Ties order deterministically by (value, id),
  * so the result is a pure function of the input.
  *
  * Scale shape: the per-group rank is a group-partitioned window
  * (parallel across groups); the pooled side NEVER globally sorts
  * rows — it aggregates to per-VALUE counts and takes a running sum
  * over the value DOMAIN (cardinality-bounded, same argument as the
  * equi-depth histogram's boundary table), then each row finds its
  * target value through a range join against that domain-sized
  * cumulative table (broadcast by size, residual range predicate —
  * the histograms' boundary-lookup shape). Row-sized work is two
  * shuffles (group window + group-count join); everything else is
  * domain-sized.
  */
object QuantileNorm {

  /** `in`: (id, group, v: long). Returns (id, group, v, norm_v) where
    * norm_v is the pooled-distribution value at the row's mapped rank.
    */
  def quantileNormalize(in: DataFrame): DataFrame = {
    val wg = Window.partitionBy(col("group")).orderBy(col("v"), col("id"))
    val ranked = in.withColumn("r", row_number().over(wg))
    val gn = in.groupBy(col("group")).agg(count(lit(1)).as("n"))
    val vc = in.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wv = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // domain-bounded cumulative table: one row per DISTINCT value
    val cum = vc.withColumn("cum", sum(col("c")).over(wv))
      .withColumn("cum_prev", col("cum") - col("c"))
      .select(col("v").as("pv"), col("cum_prev"), col("cum"))
    val tot = in.agg(count(lit(1)).as("big_n"))
    ranked.join(gn, "group")
      .crossJoin(tot) // 1-row broadcast
      .withColumn("rstar", expr("(r * big_n + n - 1) div n"))
      .join(cum,
        col("rstar") > col("cum_prev") && col("rstar") <= col("cum"))
      .select(col("id"), col("group"), col("v"), col("pv").as("norm_v"))
  }
}
