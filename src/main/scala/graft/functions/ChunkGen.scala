package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `chunk_text(text, size, overlap)` — graft's UDTF: a Catalyst
  * `Generator` (table-valued function) emitting one
  * `(chunk_id: long, chunk: string)` row per overlapping character
  * window of the input, completing the UDF/UDAF/UDTF surface next to
  * the scalar expressions ([[graft.GraftExtensions]]) and the typed
  * `Aggregator`s ([[Udafs]]).
  *
  * Semantics are bit-identical to the relational formulation
  * [[graft.operators.TextStats.chunk]] (stride = size − overlap;
  * chunk i covers `[i·stride, i·stride + size)`; every doc yields at
  * least one chunk; a null document yields no rows — the usual
  * generator convention, like `explode(NULL)`). The relational twin
  * IS the codegen'd scale path — `explode(sequence(...))` stays
  * inside whole-stage codegen while any eval-mode generator cannot
  * (`CodegenFallback`); this expression is the SQL-surface
  * capability proof:
  *
  *   SELECT doc_id, c.chunk_id, c.chunk
  *   FROM documents LATERAL VIEW chunk_text(text, 120, 30) c
  *
  * `size`/`overlap` must be positive int literals with
  * overlap < size — enforced at analysis time, not per row.
  *
  * Reference tie-in: the reference has no table functions (its
  * pipeline is one hard-coded projection, Query.java:144-192); this
  * is part of the extended north-star surface.
  */
case class ChunkTextGen(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  private val stride = size - overlap

  override def checkInputDataTypes(): TypeCheckResult =
    if (size <= 0 || overlap < 0 || overlap >= size) {
      TypeCheckResult.TypeCheckFailure(
        s"chunk_text needs size > overlap >= 0, got size=$size overlap=$overlap")
    } else if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"chunk_text expects a string column, got ${child.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val s = t.asInstanceOf[UTF8String].toString
    // window by CODE POINTS, not UTF-16 units — Spark's length/substr
    // (and the relational twin built on them) count code points, so an
    // astral character must advance the window by one, not two.
    // offs(i) = UTF-16 offset of code point i; offs(nCp) = s.length
    val nCp = s.codePointCount(0, s.length)
    val offs = new Array[Int](nCp + 1)
    var i = 0
    var o = 0
    while (i < nCp) {
      offs(i) = o
      o += Character.charCount(s.codePointAt(o))
      i += 1
    }
    offs(nCp) = s.length
    val n = math.max(1L, (nCp.toLong - overlap + stride - 1) / stride)
    (0L until n).iterator.map { k =>
      val fromCp = math.min((k * stride).toInt, nCp)
      val toCp = math.min(fromCp + size, nCp)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      row.setLong(0, k)
      row.update(1, UTF8String.fromString(
        s.substring(offs(fromCp), offs(toCp))))
      row
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTextGen =
    copy(child = newChild)
  override def prettyName: String = "chunk_text"
}
