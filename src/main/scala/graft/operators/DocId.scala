package graft.operators

import graft.functions.{sdbm_hash, Render}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sphinx document-id derivation from key columns — reference `getId`
  * (Query.java:194-218).
  *
  * Semantics:
  *   - exactly one key of an integer type (int/bigint/varint) → the
  *     value itself (F4, Query.java:201-204). The reference read it
  *     with `getInt` even for bigint/varint — a truncation defect; we
  *     cast to long (documented divergence, SURVEY.md §2).
  *   - otherwise (F5, Query.java:206-218): the first int/bigint key
  *     column (schema order) seeds the hash; every other key column is
  *     rendered to its canonical text (F8) and space-joined; the id is
  *     `sdbm_hash(seed, joined)` (F6).
  *
  * Divergence note: the reference picked the seed *per row* — a key
  * whose value happened to be 0 was skipped in favor of the next
  * numeric key (`hashBase == 0` check, Query.java:210). That makes id
  * derivation value-dependent in a way that is almost certainly
  * accidental; we bind the seed column at plan-build time from the
  * schema, which is deterministic and vectorizable.
  */
object DocId {

  private def isIntLike(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case d: DecimalType if d.scale == 0 => true // varint stand-in
    case _ => false
  }

  private def isSeedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The doc-id column (LongType) for the given key columns. */
  def docId(schema: StructType, keys: Seq[String]): Column = {
    require(keys.nonEmpty, "at least one key column is required")
    val types = keys.map(k => k -> schema(k).dataType).toMap
    if (keys.size == 1 && isIntLike(types(keys.head))) {
      col(keys.head).cast(LongType)
    } else {
      val seedKey = keys.find(k => isSeedType(types(k)))
      val seed = seedKey
        .map(k => coalesce(col(k).cast(LongType), lit(0L)))
        .getOrElse(lit(0L))
      val rest = keys.filterNot(seedKey.contains)
      val joined = concat_ws(" ", rest.map(k => Render.render(col(k), types(k))): _*)
      sdbm_hash(seed, joined)
    }
  }

  def docId(df: DataFrame, keys: Seq[String]): Column = docId(df.schema, keys)
}
