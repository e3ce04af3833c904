package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** The reference's doc-id string hash — an sdbm variant
  * (reference: src/main/java/ru/factsearch/Query.java:303-316).
  *
  * Semantics, replicated bit-exactly:
  *   - `hash = c + (hash << 6) + (hash << 16) - hash` folded left over
  *     the UTF-16 code units of the string, seeded with `seed`;
  *   - null string → 0 (regardless of seed);
  *   - non-positive result → two's-complement negation `~hash + 1`
  *     (so the result CAN still be 0 — a reference quirk we preserve:
  *     Query.java:311-315).
  */
object SdbmHash {
  def hash(seed: Long, s: String): Long = {
    if (s == null) return 0L
    var h = seed
    var i = 0
    val n = s.length
    while (i < n) {
      h = s.charAt(i) + (h << 6) + (h << 16) - h
      i += 1
    }
    if (h > 0) h else ~h + 1
  }

  /** Same hash over UTF8String without materializing a java.lang.String.
    * UTF-16 iteration is required for fidelity, so we convert; kept as
    * the single codegen entry point.
    */
  def hashUtf8(seed: Long, s: org.apache.spark.unsafe.types.UTF8String): Long =
    if (s == null) 0L else hash(seed, s.toString)
}

/** Catalyst expression for [[SdbmHash]]: `(seed: long, s: string) → long`.
  * Never null (null string hashes to 0, matching the reference).
  * Implements `doGenCode` so it stays inside whole-stage codegen.
  */
case class SdbmHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"sdbm_hash expects (long, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sdbm_hash"

  override def eval(input: InternalRow): Any = {
    val b = left.eval(input)
    val s = right.eval(input)
    if (s == null) 0L
    else SdbmHash.hash(
      if (b == null) 0L else b.asInstanceOf[Long],
      s.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val seedVal =
      if (left.nullable) s"(${l.isNull} ? 0L : ${l.value})" else s"${l.value}"
    val block =
      code"""
        ${l.code}
        ${r.code}
        long ${ev.value} = 0L;
        if (!${r.isNull}) {
          ${ev.value} = graft.functions.SdbmHash.hashUtf8($seedVal, ${r.value});
        }
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SdbmHashExpr =
    copy(left = newLeft, right = newRight)
}
