package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.util.hashing.MurmurHash3

/** Document-sketch kernels for near-duplicate detection at scale —
  * these do NOT exist in the reference (its dedup surface is absent;
  * SURVEY.md §2b "extended"); they are the north-star LLM-pipeline
  * operators, built as Catalyst expressions so a 100 TB dedup pass is
  * one narrow projection per document (no row explosion for the
  * signature computation itself — only the tiny band keys shuffle).
  *
  * Hashing is `scala.util.hashing.MurmurHash3` over token UTF-8
  * bytes: deterministic across JVMs / executors / Spark versions.
  */
object Sketches {

  /** k-permutation MinHash signature of a token array. One pass over
    * the tokens, k running minima of per-seed murmur3 (unsigned-int
    * domain). Empty/all-null input → all Long.MaxValue (matches no
    * band of any real document).
    */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          val h = MurmurHash3.bytesHash(bytes, j).toLong & 0xffffffffL
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array: per-bit vote of each token's
    * 64-bit hash (two murmur3-32 halves). Empty input → 0.
    */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val h = (MurmurHash3.bytesHash(bytes, 0xA5).toLong << 32) |
          (MurmurHash3.bytesHash(bytes, 0x5A).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `minhash_sig(tokens, k) → array<long>` (null in → null out). */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 128, s"k must be in [1,128], got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  protected override def nullSafeEval(input: Any): Any =
    Sketches.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** `simhash64(tokens) → long` (null in → null out). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  protected override def nullSafeEval(input: Any): Any =
    Sketches.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
}
