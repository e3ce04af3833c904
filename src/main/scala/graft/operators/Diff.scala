package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the "what changed between two corpus drops" audit
  * run before promoting a new crawl/ingest: classify every key as
  * added (`A`, in the new snapshot only), removed (`R`, old only) or
  * changed (`C`, both sides present with different content).
  * Unchanged keys — the overwhelming majority of a 100 TB corpus —
  * are dropped, so the output is proportional to the churn, not the
  * corpus.
  *
  * Shape: ONE full-outer shuffle join on the key columns; the content
  * comparison is a null-safe equality over the non-key columns (no
  * hashing pass, no second scan). At scale both sides shuffle once on
  * the same key — AQE coalesces the post-join partitions, and a
  * key-bucketed layout on both snapshots (BucketingSpec) removes the
  * shuffle entirely.
  *
  * Output: key columns + `op` + each non-key column twice
  * (`old_<c>`, `new_<c>`) so the audit shows what a `C` actually
  * changed. Column sets must match; mismatched schemas fail loud at
  * plan time rather than diffing incomparable snapshots.
  *
  * PRECONDITION: the key must be unique within each snapshot — a
  * duplicated key fans out m×n in the full-outer join and the `op`
  * classification is no longer per-key. Dedup first ([[Dedup.keepLatest]]
  * is the usual upstream) where ingest can produce duplicates.
  */
object Diff {

  def snapshot(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs " +
        s"${newSnap.columns.toSeq}")
    val dataCols = oldSnap.columns.filterNot(keys.contains).toSeq
    val o = oldSnap.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__in_old"): _*)
    val n = newSnap.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__in_new"): _*)
    val changed = dataCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, "A")
          .when(col("__in_new").isNull, "R")
          .when(changed, "C"))
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ Seq(col("op")) ++
        dataCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Merkle-style bucket reconciliation — [[snapshot]]'s 100 TB scale
    * path, the anti-entropy pattern of replicated stores (Cassandra
    * repair, Dynamo): instead of full-outer-joining BOTH whole
    * snapshots, each side first folds to per-bucket digests (bucket =
    * key div `bucketWidth`; digest = row count + sum of a caller-
    * supplied integer row fingerprint — order-independent, map-side
    * combinable, so the digest pass is one aggregation each and the
    * digest tables are keyspace/W-sized). Only buckets whose digests
    * DISAGREE are then drilled with the exact per-key comparison —
    * row-level shuffle work proportional to the CHURNED buckets, not
    * the corpus. With identical snapshots the row-level phase touches
    * zero rows.
    *
    * The sum-digest is exact integer arithmetic, so a digest match
    * with differing content requires fingerprint-sum collision AND
    * equal counts within one bucket — callers needing cryptographic
    * certainty put a wider fingerprint in `fp`; the structure is
    * unchanged. Result is IDENTICAL to [[snapshot]] restricted to
    * (key, op): every differing key lives in a differing bucket
    * (DiffSpec pins the equivalence).
    *
    * `fp` must be an integer column expression computable on both
    * snapshots (deterministic, content-derived). Output: (bucket,
    * key, op, old_fp, new_fp) ordered by caller.
    */
  def bucketReconcile(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, fp: Column, bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth >= 1)
    def keyed(df: DataFrame) = df
      .withColumn("fp", fp)
      .withColumn("bucket", expr(s"$keyCol div $bucketWidth"))
    def digest(df: DataFrame, n: String, s: String) = keyed(df)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(n), sum(col("fp")).as(s))
    val diffBuckets = digest(oldSnap, "n_o", "s_o")
      .join(digest(newSnap, "n_n", "s_n"), Seq("bucket"), "full_outer")
      .filter(!(col("n_o") <=> col("n_n")) || !(col("s_o") <=> col("s_n")))
      .select(col("bucket"))
    // churn-sized: AQE broadcasts it when few buckets disagree
    val o = keyed(oldSnap).join(diffBuckets, "bucket")
      .select(col("bucket"), col(keyCol), col("fp").as("old_fp"))
    val n = keyed(newSnap).join(diffBuckets, "bucket")
      .select(col("bucket"), col(keyCol), col("fp").as("new_fp"))
    o.join(n, Seq("bucket", keyCol), "full_outer")
      .withColumn("op",
        when(col("old_fp").isNull, "A")
          .when(col("new_fp").isNull, "R")
          .when(col("old_fp") =!= col("new_fp"), "C"))
      .filter(col("op").isNotNull)
      .select(col("bucket"), col(keyCol), col("op"),
        col("old_fp"), col("new_fp"))
  }
}
