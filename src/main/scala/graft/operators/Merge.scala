package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC / merge-into semantics as plain Spark — the lakehouse MERGE
  * pattern (apply a keyed change stream of upserts and deletes onto a
  * snapshot) without a table format: resolve the WINNING change per
  * key with one window, then one left_anti + one union.
  *
  * 100 TB shape: the window and the anti-join both shuffle on the
  * merge key only; the target moves through exactly one anti-join
  * (no full rewrite of untouched rows beyond the scan, which is what
  * any snapshot-producing merge must do); nothing is broadcast by
  * hint, so a corpus-sized change set degrades to a shuffle join
  * under AQE.
  */
object Merge {

  /** Apply a change set onto `target`. `changes` carries the target's
    * data columns plus `versionCol` (monotone per key; highest wins —
    * ties must not exist, enforce upstream) and `opCol` with values
    * `U` (upsert) or `D` (delete). Semantics: per key, the
    * highest-version change decides — `D` removes the key, `U`
    * replaces (or inserts) the row; keys without changes pass
    * through.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val dataCols = target.columns.toSeq
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    // every changed key shadows its target row (deletes stay gone,
    // upserts are re-added with the new values)
    val changedKeys = latest.select(keys.map(col): _*).distinct()
    target.join(changedKeys, keys, "left_anti").unionByName(upserts)
  }

  /** SCD Type-2 historization: turn a keyed, versioned change log
    * into validity intervals — one row per (key, version) with
    * `valid_from` = its version, `valid_to` = the next version for
    * the key (null while current) and an `is_current` flag. One
    * window over the merge key; versions must be unique per key.
    * The standard dimension-history build, run after [[applyCdc]]'s
    * conflict resolution at ingest.
    */
  def scd2(changes: DataFrame, keys: Seq[String],
      versionCol: String = "version"): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Plain last-wins upsert (no deletes, no versions): every key in
    * `updates` replaces its target row. `updates` must be
    * key-distinct — enforce with [[applyCdc]] and a version column
    * when it isn't.
    */
  def upsert(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dataCols = target.columns.toSeq
    val u = updates.select(dataCols.map(col): _*)
    target.join(u.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(u)
  }
}
