package graft.operators

import graft.functions.idiv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — the operator Spark's built-in
  * equi-join machinery lacks: matching point rows to interval rows on
  * containment (`start <= ts <= end`). A naive inequality join
  * degenerates to BroadcastNestedLoopJoin (O(N·M), driver-bound);
  * this implementation quantizes time into fixed-width buckets so the
  * whole join runs as a shuffle equi-join:
  *
  *   - each POINT falls in exactly one bucket;
  *   - each INTERVAL is exploded to every bucket it overlaps
  *     (ceil(length/width)+1 rows — bounded fan-out for bounded
  *     intervals, and the width knob trades fan-out against
  *     candidate-filter selectivity);
  *   - equi-join on (keys, bucket), then the exact containment filter.
  *
  * A (point, interval) pair can only meet in the point's single
  * bucket, so matches are structurally unique — no dedup pass. The
  * shuffle is on (keys, bucket), which also spreads a hot key's
  * traffic across its time range. This is the same
  * bucket-candidates + exact-verify shape as the MinHash and sign-LSH
  * dedup paths; nothing is broadcast and nothing is quadratic.
  */
object RangeJoin {

  /** Exact floor-division bucket of an event-time column in
    * microseconds (pmod keeps it correct for pre-epoch timestamps,
    * where truncating division would round toward zero).
    */
  private def bucketOf(c: Column, widthUs: Long): Column = {
    // (x - pmod(x, w)) is an exact multiple of w, so integral `div`
    // is exact floor division for any sign — and stays exact past
    // 2^53 µs where the double-division form would drift.
    val us = unix_micros(c)
    idiv(us - pmod(us, lit(widthUs)), lit(widthUs))
  }

  /** Join `points` (event-time `pointTs`) to `intervals`
    * (`[start, end]`, inclusive both ends) on equal `keys` plus
    * containment. Output: all point columns + the interval's columns
    * (minus its join keys).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String = "ts",
      start: String = "session_start", end: String = "session_end",
      bucketSeconds: Long = 3600L): DataFrame = {
    val widthUs = bucketSeconds * 1000000L
    val p = points.withColumn("_bucket", bucketOf(col(pointTs), widthUs))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(start), widthUs),
        bucketOf(col(end), widthUs))))
    p.join(iv, keys :+ "_bucket")
      .filter(col(pointTs) >= col(start) && col(pointTs) <= col(end))
      .drop("_bucket")
  }
}
