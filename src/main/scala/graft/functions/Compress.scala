package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Deflate-compressed size of a string's UTF-8 bytes — the
  * compression-ratio quality signal (Gopher / RedPajama-class corpus
  * filters): boilerplate, templated, and low-entropy text compresses
  * far below natural prose, so `deflate_len / n_bytes` separates them
  * with one cheap pass and no vocabulary.
  *
  * Returns the compressed LENGTH (long); ratios are left to the
  * caller as one exact-integer division so the stored signal is an
  * integer (engine-portable, no FP accumulation). Fixed Deflater
  * configuration (level 6, raw/nowrap, no dictionary) keeps results
  * deterministic for a given zlib; tests pin orderings (repetitive <
  * prose), not absolute byte counts, which zlib builds may vary.
  *
  * Not expressible in ANSI SQL → queries over it are no_oracle,
  * pinned by property tests like the other sketch kernels.
  */
object Compress {
  // one native Deflater + scratch buffer per executor thread, reused
  // via reset(): per-row construction/end() of a native zlib stream
  // (plus an 8 KB allocation) would dominate the projection's cost at
  // corpus scale. reset() restores the construction-time config, so
  // determinism is unchanged.
  //
  // LIFETIME: each live thread pins one native zlib stream + 8 KB.
  // Spark executors run long-lived fixed task pools, so the steady
  // state is #threads holders — but a host with thread CHURN (dynamic
  // pools creating/dropping threads) would otherwise leak one native
  // stream per dropped thread, so every holder is registered with a
  // Cleaner that end()s the Deflater once its thread dies and the
  // ThreadLocal entry becomes unreachable. The cleanup action must not
  // capture the holder itself (that would keep it reachable forever) —
  // it captures only the Deflater.
  private val cleaner = java.lang.ref.Cleaner.create()

  /** Count of Deflaters end()'d by the Cleaner — observability for the
    * thread-churn test; monotone, test-only reads.
    */
  private[graft] val cleaned = new java.util.concurrent.atomic.AtomicLong

  private final class Holder {
    val deflater = new java.util.zip.Deflater(6, true)
    val buf = new Array[Byte](8192)
  }

  private val local = ThreadLocal.withInitial[Holder] { () =>
    val h = new Holder
    // capture the Deflater through a LOCAL, not a field read — a field
    // read in the lambda would capture `h` itself and pin it reachable
    val d = h.deflater
    cleaner.register(h, () => { d.end(); cleaned.incrementAndGet() })
    h
  }

  /** Deflate length of the UTF-8 encoding of `s`; null → 0, "" → 0. */
  def deflateLen(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0L
    val h = local.get()
    val d = h.deflater
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(h.buf)
    total
  }
}

/** Catalyst expression for [[Compress.deflateLen]]: string → long,
  * never null. `doGenCode` keeps it inside whole-stage codegen.
  */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "deflate_len"

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    Compress.deflateLen(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val block =
      code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.Compress.deflateLen(${c.value});
        }
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLenExpr = copy(child = newChild)
}
