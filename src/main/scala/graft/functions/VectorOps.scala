package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Tight-loop vector/sketch kernels. Higher-order functions
  * (`zip_with`/`aggregate`/`transform`) are interpreted per element in
  * Spark — fine for one array, ruinous inside an O(N²) similarity
  * join. These expressions compile to a single static call inside
  * whole-stage codegen, which is what makes brute-force verification
  * and LSH bucketing affordable at scale.
  */
object VectorOps {
  /** Exact int64 dot product of two long arrays. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Sliding word-n-gram shingles of a token array (native loop twin
    * of Dedup.wordShingles; null tokens are skipped inside a window,
    * matching array_join's null handling so both formulations produce
    * identical shingle strings).
    */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      var wrote = false
      while (j < n) {
        val t = arr.getUTF8String(i + j)
        if (t != null) {
          if (wrote) sb.append(' ')
          sb.append(t.toString)
          wrote = true
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash over the word-n-gram shingles of a token array, fused:
    * shingle strings are built and hashed in one pass, nothing is
    * materialized. (MinHash is invariant to duplicate shingles, so no
    * distinct step is needed.)
    */
  def minhashShingled(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val sh = shingles(arr, n)
    Sketches.minhash(sh, k)
  }

  /** Sorted distinct 64-bit hashes of the word-n-gram shingles of a
    * token array, fused (shingle built + hashed per window, nothing
    * string-typed leaves the expression). This is the Jaccard-verify
    * payload: carrying 8-byte hashes instead of shingle strings
    * through the candidate joins shrinks the persisted/shuffled
    * verify state ~10× for long documents; a 64-bit collision
    * (~N²·2⁻⁶⁴ per doc) is far below the sketch's own error.
    */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      var wrote = false
      while (j < n) {
        val t = arr.getUTF8String(i + j)
        if (t != null) {
          if (wrote) sb.append(' ')
          sb.append(t.toString)
          wrote = true
        }
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(i) = (MurmurHash3.bytesHash(bytes, 0xA5).toLong << 32) |
        (MurmurHash3.bytesHash(bytes, 0x5A).toLong & 0xffffffffL)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Distinct character n-grams of a string in first-occurrence order
    * — the native-loop twin of the `transform(sequence…substr)` +
    * `array_distinct` formulation (Dedup.charNgrams), which is
    * interpreted per element as a higher-order function. Windows walk
    * Unicode CODE POINTS (Spark's `substr` counts code points, not
    * UTF-16 units), so both formulations agree on multi-byte text.
    */
  /** Σ count(c)² over the string's code points — the Simpson-index
    * collision numerator in ONE pass per string. The alternative
    * (explode each character into a row, two groupBy shuffles) moves
    * a row per character through the shuffle — at corpus scale that
    * is the data itself, exploded. Called from codegen.
    */
  def charCollision(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var idx = 0
    while (idx < str.length) {
      val cp = str.codePointAt(idx)
      idx += Character.charCount(cp)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().toLong; sum += c * c }
    sum
  }

  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    // code-point start offsets in UTF-16 index space
    val nCp = str.codePointCount(0, len)
    if (nCp < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nCp + 1)
    var idx = 0
    var cp = 0
    while (idx < len) {
      starts(cp) = idx
      idx += Character.charCount(str.codePointAt(idx))
      cp += 1
    }
    starts(cp) = len
    val seen = new java.util.LinkedHashSet[String]((nCp - n + 1) * 2)
    var i = 0
    while (i <= nCp - n) {
      seen.add(str.substring(starts(i), starts(i + n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  /** Count of common elements of two SORTED distinct long arrays
    * (single merge pass). Runs once per candidate pair in the verify
    * join — array_intersect would build a hash set per invocation.
    */
  def sortedSharedCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { s += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    s
  }

  /** Deterministic pseudo-random plane component (murmur3-derived, no
    * RNG state) — the single source of truth for LSH planes (also used
    * by Similarity.planes).
    */
  def planeComponent(p: Int, j: Int): Double =
    MurmurHash3.stringHash(s"plane:$p:$j").toDouble / Int.MaxValue

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planesFor(nPlanes: Int, dim: Int,
      offset: Int): Array[Array[Double]] = {
    // hit the cache before the size guard: once the bound is reached,
    // existing keys must keep being served (recomputing the plane
    // matrix per ROW is the cost this cache exists to avoid); only
    // genuinely new keys fall back to uncached computation. Bounded
    // because ragged input dims must not grow executor memory forever
    // (multi-table banding puts nTables entries per distinct dim).
    val key = (nPlanes, dim, offset)
    val hit = planeCache.get(key)
    if (hit != null) return hit
    if (planeCache.size > 256) {
      return Array.tabulate(nPlanes, dim)((p, j) => planeComponent(offset + p, j))
    }
    planeCache.computeIfAbsent(key, { case (np, d, o) =>
      Array.tabulate(np, d)((p, j) => planeComponent(o + p, j))
    })
  }

  /** Sign-random-projection LSH bucket of a double array: bit i is the
    * sign of the dot product with plane (offset + i). Distinct offsets
    * give statistically independent LSH tables (multi-table banding —
    * a near neighbor is found if it agrees on ALL planes of ANY
    * table). Plane coefficients are row-invariant and cached per
    * (nPlanes, dim, offset) — recomputing the murmur per element would
    * dominate the per-row cost.
    */
  def signLsh(vec: ArrayData, nPlanes: Int, offset: Int): Long = {
    val dim = vec.numElements()
    val planes = planesFor(nPlanes, dim, offset)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var dot = 0.0
      var j = 0
      while (j < dim) {
        dot += vec.getDouble(j) * plane(j)
        j += 1
      }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def signLsh(vec: ArrayData, nPlanes: Int): Long = signLsh(vec, nPlanes, 0)

  /** All-m product-quantization code assignment in ONE pass: `cents`
    * is the flattened [m][ksub][dsub] codebook; returns the m nearest
    * sub-centroid indices by exact integer squared L2 with a
    * FIRST-index tie-break (strict `<`) — identical codes to an
    * argmin over a per-centroid distance array, without building
    * m × ksub distance expressions per row (which blows whole-stage
    * codegen's method limit and falls back to interpretation).
    */
  def pqEncode(v: ArrayData, cents: Array[Long], m: Int,
      ksub: Int): ArrayData = {
    val dim = v.numElements()
    val dsub = dim / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var d = 0L
        var j = 0
        while (j < dsub) {
          val diff = v.getLong(s * dsub + j) - cents(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_encode(array<long>) → array<int>` — all-m PQ code assignment
  * against a plan-literal flattened codebook, codegen'd tight loop.
  */
case class PqEncodeExpr(child: Expression, cents: Seq[Long], m: Int,
    ksub: Int) extends UnaryExpression {
  require(m > 0 && ksub > 0 && cents.length % (m * ksub) == 0,
    "flattened codebook must be m*ksub sub-centroids")
  @transient private lazy val centsArr: Array[Long] = cents.toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.pqEncode(input.asInstanceOf[ArrayData], centsArr, m, ksub)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", centsArr, "long[]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.pqEncode($a, $ref, $m, $ksub)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeExpr = copy(child = newChild)
}

/** `dot_long(array<long>, array<long>) → long` — codegen'd loop. */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long expects two array<bigint>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotLongExpr = copy(left = l, right = r)
}

/** `word_shingles(tokens, n) → array<string>` — codegen'd loop. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle width must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
}

/** `minhash_shingled(tokens, n, k) → array<long>` — fused shingle+hash. */
case class MinHashShingledExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 128, s"k must be in [1,128], got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingled"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.minhashShingled(input.asInstanceOf[ArrayData], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.minhashShingled($c, $n, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashShingledExpr =
    copy(child = c)
}

/** `shingle_hashes(tokens, n) → array<long>` — sorted distinct 64-bit
  * shingle hashes, fused (codegen'd).
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle width must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

/** `char_ngrams(string, n) → array<string>` — distinct character
  * n-grams, codegen'd loop.
  */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 2, "n-gram width must be at least 2")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.charNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.charNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgramsExpr =
    copy(child = c)
}

/** `shared_count(sorted array<long>, sorted array<long>) → long` —
  * merge-pass intersection size (codegen'd).
  */
case class SortedSharedCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shared_count expects two array<bigint>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "shared_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedSharedCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.sortedSharedCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedSharedCountExpr =
    copy(left = l, right = r)
}

/** `char_collision(string) → long` — Σ count(c)² over code points
  * (Simpson-index numerator), codegen'd single pass.
  */
case class CharCollisionExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_collision expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "char_collision"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.charCollision(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.charCollision($c)")
  override protected def withNewChildInternal(c: Expression): CharCollisionExpr =
    copy(child = c)
}

/** `sign_lsh(array<double>, nPlanes[, planeOffset]) → long` —
  * codegen'd bucket id; planeOffset selects the LSH table's planes.
  */
case class SignLshExpr(child: Expression, nPlanes: Int,
    planeOffset: Int = 0) extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 63, "nPlanes must be in [1,63]")
  require(planeOffset >= 0, "planeOffset must be >= 0")
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh"
  protected override def nullSafeEval(input: Any): Any =
    VectorOps.signLsh(input.asInstanceOf[ArrayData], nPlanes, planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.signLsh($c, $nPlanes, $planeOffset)")
  override protected def withNewChildInternal(c: Expression): SignLshExpr =
    copy(child = c)
}
