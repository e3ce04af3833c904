package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract a pipeline
  * asserts over a corpus drop before promoting it (the Deequ/
  * Great-Expectations idea re-expressed as plain Spark aggregates):
  * each check compiles to an exact violation count plus a pass flag,
  * evaluated in as few passes as the check class permits.
  *
  * Execution shape at scale:
  *  - every ROW-LEVEL check (not-null, range, pattern, set
  *    membership, custom predicate) folds into ONE aggregate pass —
  *    a single scan however many checks ride it, all map-side
  *    combinable sums of 0/1 flags;
  *  - ALL UNIQUENESS checks together add ONE hash aggregation: they
  *    fuse into a single GROUPING SETS pass (Expand → one shuffle
  *    keyed by (grouping_id, key tuple)), however many key tuples
  *    are checked;
  *  - REFERENTIAL integrity adds one left-anti join per named
  *    dimension (broadcast when the dimension is small — Catalyst
  *    decides).
  * Nothing is collected; the report is one row per check.
  *
  * Output: (check, detail, violations, passed) — `violations` is the
  * exact offending-row (or duplicate-key / orphan-row) count.
  */
object Expectations {

  sealed trait Check { def name: String; def detail: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    val name = "not_null"; val detail = col
  }
  /** `col` must lie in [lo, hi] (nulls count as violations). */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check {
    val name = "in_range"; val detail = s"$col[$lo,$hi]"
  }
  /** `col` must match the (RE2-safe) regex (nulls violate). */
  final case class Matches(col: String, regex: String) extends Check {
    val name = "matches"; val detail = col
  }
  /** `col` must be one of `allowed` (nulls violate). */
  final case class InSet(col: String, allowed: Seq[String]) extends Check {
    val name = "in_set"; val detail = col
  }
  /** Arbitrary row predicate that must hold (expressed as a Column so
    * it stays codegen'd; nulls violate).
    */
  final case class Predicate(label: String, expr: Column) extends Check {
    val name = "predicate"; val detail = label
  }
  /** The column tuple must be unique across the table. Violations =
    * rows in excess of one per key.
    */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = "unique"; val detail = cols.mkString(",")
  }

  private def violationFlag(c: Check): Column = c match {
    case NotNull(col0) => when(col(col0).isNull, 1L).otherwise(0L)
    case InRange(col0, lo, hi) =>
      when(col(col0).isNull || col(col0) < lo || col(col0) > hi, 1L)
        .otherwise(0L)
    case Matches(col0, re) =>
      when(col(col0).isNull || !col(col0).rlike(re), 1L).otherwise(0L)
    case InSet(col0, allowed) =>
      when(col(col0).isNull || !col(col0).isin(allowed: _*), 1L)
        .otherwise(0L)
    case Predicate(_, e) => when(e.isNull || !e, 1L).otherwise(0L)
    case _: Unique =>
      throw new IllegalArgumentException("unique is not row-level")
  }

  /** Evaluate `checks` over `df`; see class doc for the plan shape.
    * Row-level checks share one pass; ALL Unique checks share one
    * grouping-sets aggregation (one shuffle total).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val (uniques, rowLevel) = checks.partition(_.isInstanceOf[Unique])
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLevel.nonEmpty) {
      // one aggregate row: [v0, v1, ...]; unpivot to long via stack
      val aggs = rowLevel.zipWithIndex.map { case (c, i) =>
        sum(violationFlag(c)).as(s"v$i")
      }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      // unpivot via typed lit() structs, not an interpolated stack()
      // SQL string — a check name/detail containing a quote is data,
      // not syntax (e.g. a Predicate label over a quoted column)
      val rows = rowLevel.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check"), lit(c.detail).as("detail"),
          col(s"v$i").as("violations"))
      }
      parts += wide.select(explode(array(rows: _*)).as("kv"))
        .select(col("kv.check"), col("kv.detail"), col("kv.violations"))
    }
    if (uniques.nonEmpty) {
      // ALL uniqueness checks fused into ONE shuffle via GROUPING
      // SETS: the Expand operator emits each row once per key tuple,
      // a single hash aggregation counts per (grouping_id, key), and
      // one map-side-combinable global agg folds each set's
      // Σ(n−1) excess. N checks used to be N hash aggs = N shuffles;
      // now the shuffle count is 1 regardless of N. grouping_id (not
      // null-ness of the passthrough columns) identifies the set a
      // group row belongs to — a null KEY VALUE is data, not set
      // membership.
      val us = uniques.collect { case u: Unique => u }
      val allCols = us.flatMap(_.cols).distinct
      val k = allCols.size
      val gidOf = us.map { u =>
        allCols.zipWithIndex.collect {
          case (c, i) if !u.cols.contains(c) => 1L << (k - 1 - i)
        }.sum
      }
      val grouped = df
        .groupingSets(us.map(_.cols.map(col)), allCols.map(col): _*)
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      val aggs = us.zip(gidOf).zipWithIndex.map { case ((_, gid), i) =>
        coalesce(sum(when(col("gid") === gid, col("n") - 1)), lit(0L))
          .as(s"u$i")
      }
      val wide = grouped.agg(aggs.head, aggs.tail: _*)
      val rows = us.zipWithIndex.map { case (u, i) =>
        struct(lit(u.name).as("check"), lit(u.detail).as("detail"),
          col(s"u$i").as("violations"))
      }
      parts += wide.select(explode(array(rows: _*)).as("kv"))
        .select(col("kv.check"), col("kv.detail"), col("kv.violations"))
    }
    parts.reduce(_ unionByName _)
      .select(col("check"), col("detail"), col("violations"),
        (col("violations") === 0).as("passed"))
  }

  /** Referential-integrity check as its own entry point (needs the
    * dimension table): violations = child rows whose key has no match
    * in `parent` (null keys violate too — an FK that is null is not
    * a reference). One left-anti join; Catalyst broadcasts small
    * parents.
    */
  def refIntegrity(child: DataFrame, parent: DataFrame, childKey: String,
      parentKey: String): DataFrame = {
    val orphanCount = child
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphanCount.select(lit("ref_integrity").as("check"),
      lit(s"$childKey->$parentKey").as("detail"), col("violations"),
      (col("violations") === 0).as("passed"))
  }
}
