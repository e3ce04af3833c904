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
  * accidental; by default we bind the seed column at plan-build time
  * from the schema, which is deterministic and vectorizable. For
  * migrations that must keep ids stable with an existing index built
  * by the reference, `strictParity = true` reproduces the per-row
  * branch exactly (as a CASE cascade — still pure codegen'd column
  * math): per row, every numeric key up to and including the first
  * NONZERO one is consumed by the seed scan (a zero-valued numeric key
  * is assigned into `hashBase` — a no-op — and never reaches the
  * joined string), the first nonzero numeric value becomes the seed,
  * and numeric keys after it render into the string like any other
  * column. Nulls count as 0 (the reference's unset-Cassandra-cell
  * `getInt` behavior). `strictParity` also reproduces the
  * `getInt`-on-wide-value truncation defects: the single-numeric-key
  * id (Query.java:203) and the composite-key seed (Query.java:211)
  * are both read through a 32-bit window, sign-extended — so a bigint
  * key of 2³² yields id 0, and the TRUNCATED value feeds the
  * `hashBase == 0` skip test (a key that truncates to zero is
  * consumed by the seed scan exactly like a true zero). The default
  * mode reads the full 64-bit value (documented divergence).
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
  def docId(schema: StructType, keys: Seq[String],
      strictParity: Boolean = false): Column = {
    require(keys.nonEmpty, "at least one key column is required")
    val types = keys.map(k => k -> schema(k).dataType).toMap
    if (keys.size == 1 && isIntLike(types(keys.head))) {
      if (strictParity) Render.trunc32(col(keys.head)) // getInt, Q:203
      else col(keys.head).cast(LongType)
    } else if (!strictParity) {
      val seedKey = keys.find(k => isSeedType(types(k)))
      val seed = seedKey
        .map(k => coalesce(col(k).cast(LongType), lit(0L)))
        .getOrElse(lit(0L))
      val rest = keys.filterNot(seedKey.contains)
      val joined = concat_ws(" ", rest.map(k => Render.render(col(k), types(k))): _*)
      sdbm_hash(seed, joined)
    } else {
      // per-row reference semantics (Query.java:206-218); null → 0.
      // The seed is read through getInt (Q:211): 32-bit truncated
      // BEFORE the zero test, so values ≡ 0 (mod 2³²) are skipped
      // like true zeros.
      def truncated(k: String): Column =
        Render.trunc32(coalesce(col(k).cast(LongType), lit(0L)))
      def nz(k: String): Column = truncated(k) =!= 0L
      val numericKeys = keys.filter(k => isSeedType(types(k)))
      // seed = first numeric key whose TRUNCATED value is nonzero
      val seed = coalesce(numericKeys.map(k =>
        when(nz(k), truncated(k))) :+ lit(0L): _*)
      // a numeric key reaches the string only when an EARLIER numeric
      // key already seeded the hash (prefix-nonzero condition);
      // concat_ws skips the null produced by a false `when`, exactly
      // like the reference's StringJoiner never seeing the value
      var prefixNz: Column = lit(false)
      val pieces = keys.map { k =>
        if (isSeedType(types(k))) {
          val piece = when(prefixNz, Render.render(col(k), types(k)))
          prefixNz = prefixNz || nz(k)
          piece
        } else Render.render(col(k), types(k))
      }
      sdbm_hash(seed, concat_ws(" ", pieces: _*))
    }
  }

  def docId(df: DataFrame, keys: Seq[String]): Column = docId(df.schema, keys)

  def docId(df: DataFrame, keys: Seq[String], strictParity: Boolean): Column =
    docId(df.schema, keys, strictParity)
}
