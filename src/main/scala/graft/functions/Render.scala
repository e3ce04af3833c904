package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed value → canonical text rendering — the `getValue` dispatch of
  * the reference (Query.java:231-277), re-expressed as pure Catalyst
  * column expressions so the whole projection stays in whole-stage
  * codegen (no UDFs).
  *
  * Canonical forms (divergences from the reference are deliberate and
  * documented — SURVEY.md §2 "defects"):
  *   - int/bigint/decimal/varint: decimal string, same as Java
  *     `toString` (Query.java:232-235, 248-249, 254-255);
  *   - boolean: `true`/`false` (Query.java:238-239);
  *   - float/double: Spark's cast-to-string (shortest round-trip repr —
  *     identical to Java `toString` for the non-scientific range);
  *   - timestamp: canonical `yyyy-MM-dd HH:mm:ss` in the session zone
  *     (UTC). The reference used locale/zone-dependent
  *     `java.util.Date.toString` (Query.java:252-253) — irreproducible
  *     by design, so we pin a stable form instead;
  *   - binary: uppercase hex. The reference printed the ByteBuffer
  *     *descriptor*, not the bytes (Query.java:225, 242-243) — a defect
  *     we do not reproduce;
  *   - set/list: elements rendered then space-joined; empty → ""
  *     (Query.java:268-277); null elements render as "" keeping arity;
  *   - map/struct (unsupported by the reference, Query.java:265):
  *     rendered as JSON — a flagged extension rather than "";
  *   - null anything → "" (the reference NPEs on nulls,
  *     Query.java:249/280 — defined behavior instead).
  */
object Render {

  /** Canonical text for a column of the given type; never null. */
  def render(c: Column, dt: DataType): Column = dt match {
    case StringType => coalesce(c, lit(""))
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        _: DecimalType | FloatType | DoubleType | DateType =>
      coalesce(c.cast(StringType), lit(""))
    case TimestampType | TimestampNTZType =>
      coalesce(date_format(c, "yyyy-MM-dd HH:mm:ss"), lit(""))
    case BinaryType => coalesce(hex(c), lit(""))
    case ArrayType(et, _) =>
      // Space-joined rendered elements (Query.java:268-277).
      coalesce(array_join(transform(c, e => render(e, et)), " "), lit(""))
    case _: MapType | _: StructType =>
      coalesce(to_json(c), lit(""))
    case _ => coalesce(c.cast(StringType), lit(""))
  }

  /** Render every column of a schema: (name, renderedColumn) pairs in
    * field order — the reference's whole-row projection (F3,
    * Query.java:186-190).
    */
  def renderAll(schema: StructType): Seq[(String, Column)] =
    schema.fields.toSeq.map(f => f.name -> render(col(f.name), f.dataType))

  /** Sign-extending 32-bit truncation of a long — Java's `(int)` /
    * the Cassandra driver's `getInt` on a wider value. Shift-based so
    * it can't throw under ANSI-mode overflow checking.
    */
  def trunc32(c: Column): Column =
    shiftright(shiftleft(c.cast(LongType), 32), 32)

  /** Bug-for-bug rendering for migrations pinned to a reference-built
    * index — reproduces the reference's per-row `getValue` defects
    * that [[render]] deliberately fixes (opt-in, mirroring
    * `DocId.docId(strictParity = true)`):
    *
    *   - timestamp: `java.util.Date.toString()` form
    *     (`EEE MMM dd HH:mm:ss zzz yyyy`, Query.java:252-253) under
    *     the session time zone — the reference used the JVM default
    *     zone and locale; pin the session zone (UTC) for
    *     reproducibility;
    *   - binary: the ByteBuffer DESCRIPTOR, not the bytes
    *     (`java.nio.HeapByteBuffer[pos=0 lim=N cap=N]`,
    *     Query.java:225, 242-243);
    *   - counter (`counter = true` on an integral column): the value
    *     read through `getInt` (Query.java:246-247) — truncated to 32
    *     bits, sign-extended;
    *   - everything else: canonical [[render]] (the reference's
    *     remaining arms are not defective).
    *
    * Nulls still render as "" (the reference NPEd; an emulated crash
    * helps no migration).
    */
  def renderStrict(c: Column, dt: DataType,
      counter: Boolean = false): Column = dt match {
    case TimestampType | TimestampNTZType =>
      coalesce(date_format(c, "EEE MMM dd HH:mm:ss zzz yyyy"), lit(""))
    case BinaryType =>
      coalesce(concat(lit("java.nio.HeapByteBuffer[pos=0 lim="),
        octet_length(c).cast(StringType), lit(" cap="),
        octet_length(c).cast(StringType), lit("]")), lit(""))
    case ByteType | ShortType | IntegerType | LongType if counter =>
      coalesce(trunc32(c).cast(StringType), lit(""))
    case _ => render(c, dt)
  }
}
