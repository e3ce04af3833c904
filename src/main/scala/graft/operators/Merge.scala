package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * data columns plus `versionCol` (monotone per key; highest wins)
    * and `opCol` with values `U` (upsert) or `D` (delete). Semantics:
    * per key, the highest-version change decides — `D` removes the
    * key, `U` replaces (or inserts) the row; keys without changes
    * pass through.
    *
    * Fails loud (at execution, distributed — no extra pass) on the
    * two silent-corruption inputs: a TIED top version per key (the
    * winner would be partitioning-dependent) and an op value outside
    * {U, D} (it would be silently treated as an upsert). Both guards
    * ride the expressions of the surviving row, so Catalyst cannot
    * prune them, and the tie check reuses the SAME window spec as the
    * ranking — one shuffle total, unchanged from the unguarded plan.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    // on the rank-1 row, lead(version) is the runner-up version: equal
    // means the top version is tied and the "winner" is arbitrary
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next_v", lead(col(versionCol), 1).over(w))
      .filter(col("__rn") === 1)
      .withColumn(opCol,
        when(col(versionCol) <=> col("__next_v"),
          raise_error(concat(lit(s"applyCdc: tied top $versionCol for key ("),
            concat_ws(",", keys.map(c => col(c).cast("string")): _*),
            lit(s") — version must be unique per key"))).cast("string"))
        .when(col(opCol).isin("U", "D"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"applyCdc: unexpected $opCol value: "),
          coalesce(col(opCol).cast("string"), lit("null")))).cast("string")))
      .drop("__rn", "__next_v")
    val dataCols = target.columns.toSeq
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    // every changed key shadows its target row (deletes stay gone,
    // upserts are re-added with the new values). The key projection
    // keeps opCol in a filter so the guards fire for deletes too.
    val changedKeys = latest.filter(col(opCol).isin("U", "D"))
      .select(keys.map(col): _*).distinct()
    target.join(changedKeys, keys, "left_anti").unionByName(upserts)
  }

  /** SCD Type-2 historization: turn a keyed, versioned change log
    * into validity intervals — one row per (key, version) with
    * `valid_from` = its version, `valid_to` = the next version for
    * the key (null while current) and an `is_current` flag. One
    * window over the merge key. The standard dimension-history build,
    * run after [[applyCdc]]'s conflict resolution at ingest.
    *
    * Versions must be unique per key — a duplicate would make
    * `valid_to`/`is_current` ambiguous (zero-width intervals whose
    * assignment depends on sort-tie order). Instead of silently
    * producing that, the operator fails loud at execution: duplicates
    * sort adjacent, so `lag(version) == version` detects them inside
    * the SAME window as the interval build (no extra shuffle), and
    * the raise rides the `valid_to` expression so pruning can't drop
    * it.
    */
  def scd2(changes: DataFrame, keys: Seq[String],
      versionCol: String = "version"): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol))
    val vType = changes.schema(versionCol).dataType.sql
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to",
        when(lag(col(versionCol), 1).over(w) <=> col(versionCol),
          raise_error(concat(lit(s"scd2: duplicate (key, $versionCol) ("),
            concat_ws(",", (keys :+ versionCol).map(c =>
              col(c).cast("string")): _*),
            lit(") — pre-aggregate the change log first")))
            .cast(vType))
        .otherwise(lead(col(versionCol), 1).over(w)))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Time-travel read over an SCD2 history: the state of every key as
    * of version instant `asOf` — the row whose validity interval
    * contains it (`valid_from <= asOf < valid_to`, open-ended for the
    * current row). At most one row per key by [[scd2]] construction
    * (the intervals partition the version axis).
    *
    * Pure pushable filter — no shuffle, no window: once the history
    * exists, reconstructing ANY historical snapshot is a scan, which
    * is the point of storing dimensions as SCD2 at 100 TB (versus
    * materializing one snapshot per day). With valid_from in the file
    * sort/partition key, the filter prunes at the scan.
    */
  def scd2AsOf(hist: DataFrame, asOf: Column): DataFrame =
    hist.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))

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

  /** Incremental aggregate (materialized-view) maintenance: count/sum
    * per key kept current under an insert/delete delta WITHOUT
    * re-aggregating the base. Deltas are signed (+1/+v for op `I`,
    * −1/−v for op `D`), pre-aggregated to one row per touched key,
    * then FULL OUTER merged into the existing state; keys whose count
    * reaches zero drop out. This is the classic self-maintainable
    * view algebra for distributive aggregates (count/sum — and avg as
    * their quotient): correct because the aggregate is an abelian
    * group, so `agg(base ⊎ delta) = agg(base) ⊕ agg(delta)`.
    *
    * Scale shape: the delta aggregation shuffles only delta rows and
    * the merge join shuffles state ∂-side-bounded by touched keys —
    * at 100 TB the base table is never rescanned, which is the whole
    * point of maintaining the view. `valCol` must be an exact type
    * (integer/decimal units): a double sum would drift from the
    * recompute it must stay bit-equal to.
    *
    * `state`: (key, n, s) from a previous [[aggState]] call.
    * `delta`: (key, op, valCol) with op ∈ {I, D}; D rows must match
    * base rows exactly (loud-failure guards live upstream in
    * [[applyCdc]]'s validation).
    */
  def incrementalAgg(state: DataFrame, delta: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val sign = when(col("op") === "I", lit(1L))
      .when(col("op") === "D", lit(-1L))
      .otherwise(raise_error(concat(lit("incrementalAgg: invalid op "),
        col("op"))))
    val d = delta.groupBy(col(keyCol))
      .agg(sum(sign).as("dn"), sum(sign * col(valCol)).as("ds"))
    state.join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }

  /** The (key, n, s) aggregate state [[incrementalAgg]] maintains. */
  def aggState(base: DataFrame, keyCol: String, valCol: String): DataFrame =
    base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("s"))
}
