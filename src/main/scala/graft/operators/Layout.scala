package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning — the
  * write-side optimization the reference never needed (its layout was
  * Cassandra's) but a 100 TB parquet lake lives on: rows Z-order
  * (Morton) interleaved on two dimensions cluster near each other in
  * BOTH, so min/max row-group statistics prune scans filtered on
  * either dimension (the Delta/Iceberg `ZORDER BY` idea, expressed as
  * plain Spark: a codegen-friendly integer column expression + one
  * range repartition + an intra-partition sort — no custom writer).
  *
  * The interleave is pure 64-bit integer shift/mask arithmetic
  * (classic magic-number bit spreading), so the z-value is
  * engine-exact and oracle-checkable.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit lane (magic-number bit spreading, the standard Morton
    * construction).
    */
  def spread16(c: Column): Column = {
    val masked = c.bitwiseAND(lit(0xFFFFL))
    val s8 = masked.bitwiseOR(shiftleft(masked, 8))
      .bitwiseAND(lit(0x00FF00FFL))
    val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x33333333L))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: bits of `a` on even
    * positions, bits of `b` on odd. Monotone locality: close (a, b)
    * pairs get close z-values.
    */
  def zorder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for writing: range-partition on the z-value (each
    * output file covers a compact z-interval → compact rectangles in
    * (a, b) space) and sort within partitions (row-group stats stay
    * tight inside each file). `numFiles` is the target output file
    * count.
    */
  def clusterByZ(df: DataFrame, a: Column, b: Column,
      numFiles: Int): DataFrame = {
    val z = zorder2(a, b).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hive-style date partitioning — the other half of the lake layout
    * story: Z-order clusters WITHIN files; directory partitioning
    * prunes whole directories before a single file is opened. A time
    * filter on `partCol` becomes a `PartitionFilters` entry in the
    * scan (listing-level pruning — at 100 TB the difference between
    * touching 5 days and 3 years of files). Derives `partCol` =
    * `to_date(tsCol)` so readers filter on the partition column
    * directly.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, outDir: String,
      partCol: String = "event_date"): Unit =
    df.withColumn(partCol, to_date(col(tsCol)))
      .write.partitionBy(partCol).mode("overwrite").parquet(outDir)
}
