package graft.operators

import org.apache.spark.sql.DataFrame
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
}
