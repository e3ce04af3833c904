package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Bridge

/** Column-level entry points for graft's custom Catalyst expressions. */
package object functions {

  /** THE integer division for every exact-rational output column —
    * Spark's `div` operator, centralized so the next cross-engine
    * division mismatch has one place to audit (r11 verdict: 15 call
    * sites each carried their own truncation assumption, and the
    * ewma-class oracle bugs all live in division semantics).
    *
    * Contract:
    *   - Semantics: TRUNCATES toward zero (Spark `div`); THROWS on
    *     divide-by-zero (graft sessions run Spark 4's ANSI default).
    *     A site whose divisor can be zero must guard it explicitly
    *     (`when(b =!= 0, idiv(a, b))`) — a silent NULL would be a
    *     semantics decision this helper refuses to make.
    *   - DuckDB oracle twins spell it `a // b` (or `div`) on
    *     integer/HUGEINT operands, which also truncates — but ONLY
    *     the non-negative case is semantics-proof across engines and
    *     versions (truncation == floor there). Every call site must
    *     either prove both operands non-negative at that point, or
    *     floor-adjust explicitly and say so in a comment.
    *   - Operands must already be integral (long/decimal) — this
    *     helper does not cast; a double operand is a bug at the call
    *     site, not here.
    */
  def idiv(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("div", a, b)

  /** THE exact-integer wide type for overflow limbs (gradients,
    * marginal products, variance sums) — one definition next to
    * [[idiv]], whose contract governs every call site that divides
    * these back down to int64.
    */
  val Dec38: org.apache.spark.sql.types.DecimalType =
    org.apache.spark.sql.types.DecimalType(38, 0)

  /** Reference doc-id hash (Query.java:303-316) as a codegen'd
    * expression: `sdbm_hash(seed, str)`. Null string → 0.
    */
  def sdbm_hash(seed: Column, s: Column): Column =
    Bridge.column(SdbmHashExpr(
      Bridge.expression(seed.cast("long")),
      Bridge.expression(s.cast("string"))))

  /** k-minima MinHash signature of a token array (array<long>). */
  def minhash_sig(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(tokens), k))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))

  /** Exact int64 dot product of two array<long> columns (codegen'd). */
  def dot_long(a: Column, b: Column): Column =
    Bridge.column(DotLongExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Sliding word n-gram shingles of a token array (codegen'd). */
  def word_shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(tokens), n))

  /** Fused shingle+MinHash signature (codegen'd, no materialization). */
  def minhash_shingled(tokens: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashShingledExpr(Bridge.expression(tokens), n, k))

  /** Sorted distinct 64-bit shingle hashes (codegen'd, fused). */
  def shingle_hashes(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(tokens), n))

  /** Intersection size of two sorted long arrays (codegen'd merge). */
  def shared_count(a: Column, b: Column): Column =
    Bridge.column(SortedSharedCountExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Distinct character n-grams of a string, first-occurrence order
    * (codegen'd loop — the HOF formulation is interpreted per element).
    */
  /** Deflate-compressed byte length of a string (codegen'd);
    * null/"" → 0. Compression-ratio quality signal.
    */
  def deflate_len(c: Column): Column =
    Bridge.column(DeflateLenExpr(Bridge.expression(c.cast("string"))))

  def char_ngrams(c: Column, n: Int): Column =
    Bridge.column(CharNgramsExpr(Bridge.expression(c.cast("string")), n))

  /** Simpson-index collision numerator Σ count(cp)² (codegen'd). */
  def char_collision(c: Column): Column =
    Bridge.column(CharCollisionExpr(Bridge.expression(c.cast("string"))))

  /** All-m PQ code assignment against a flattened codebook literal
    * (codegen'd tight loop; see PqEncodeExpr).
    */
  def pq_encode(v: Column, cents: Seq[Long], m: Int, ksub: Int): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(v), cents, m, ksub))

  /** KLL quantile sketch aggregate (serialized sketch per group). */
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    Bridge.column(
      KllSketchAggExpr(Bridge.expression(c.cast("double")), k)
        .toAggregateExpression())

  /** Query-time union of serialized KLL sketches. */
  def kll_merge_agg(c: Column, k: Int = 200): Column =
    Bridge.column(
      KllMergeAggExpr(Bridge.expression(c), k).toAggregateExpression())

  /** Quantile estimate from a serialized KLL sketch. */
  def kll_quantile(sketch: Column, fraction: Column): Column =
    Bridge.column(KllQuantileExpr(Bridge.expression(sketch),
      Bridge.expression(fraction.cast("double"))))

  /** Unicode NFC canonical composition (codegen'd; UAX #15). */
  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c.cast("string"))))

  /** Diacritic folding: NFD then drop combining marks (codegen'd). */
  def strip_accents(c: Column): Column =
    Bridge.column(StripAccentsExpr(Bridge.expression(c.cast("string"))))

  /** UDTF: overlapping character-window chunks as generated rows
    * `(chunk_id, chunk)` — use inside `select` like `explode`:
    * `docs.select($"doc_id", chunk_text($"text", 120, 30))`.
    */
  def chunk_text(c: Column, size: Int, overlap: Int): Column =
    Bridge.column(ChunkTextGen(
      Bridge.expression(c.cast("string")), size, overlap))

  /** Sign-random-projection LSH bucket id of an array<double>;
    * `planeOffset` selects an independent LSH table's planes.
    */
  def sign_lsh(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    Bridge.column(SignLshExpr(
      Bridge.expression(vec.cast("array<double>")), nPlanes, planeOffset))

  /** Extract a literal Int argument from a SQL function call. */
  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Name → builder for every SQL-exposed graft expression — the one
    * source of truth shared by the per-session [[registerSql]] and the
    * config-driven [[graft.GraftExtensions]] injection.
    */
  val sqlFunctions: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    // coerce like the Column API (`seed.cast("long")`): SQL integer
    // literals arrive as INT and would fail the strict type check
    "sdbm_hash" -> { case Seq(a, b) =>
      SdbmHashExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(a,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(b,
          org.apache.spark.sql.types.StringType)) },
    "minhash_shingled" -> { case Seq(t, n, k) =>
      MinHashShingledExpr(t, litInt(n, "n"), litInt(k, "k")) },
    "simhash64" -> { case Seq(t) => SimHash64Expr(t) },
    "dot_long" -> { case Seq(a, b) => DotLongExpr(a, b) },
    "word_shingles" -> { case Seq(t, n) =>
      WordShinglesExpr(t, litInt(n, "n")) },
    "shingle_hashes" -> { case Seq(t, n) =>
      ShingleHashesExpr(t, litInt(n, "n")) },
    "shared_count" -> { case Seq(a, b) => SortedSharedCountExpr(a, b) },
    "sign_lsh" -> {
      case Seq(v, p) => SignLshExpr(v, litInt(p, "planes"))
      case Seq(v, p, o) =>
        SignLshExpr(v, litInt(p, "planes"), litInt(o, "planeOffset"))
    },
    "char_ngrams" -> { case Seq(c, n) => CharNgramsExpr(c, litInt(n, "n")) },
    "char_collision" -> { case Seq(c) => CharCollisionExpr(c) },
    "nfc_normalize" -> { case Seq(c) => NfcNormalizeExpr(c) },
    "strip_accents" -> { case Seq(c) => StripAccentsExpr(c) },
    // the UDTF leg of the surface: resolves under LATERAL VIEW /
    // generator positions because the built expression IS a Generator
    "chunk_text" -> { case Seq(c, s, o) =>
      ChunkTextGen(c, litInt(s, "size"), litInt(o, "overlap")) },
    // aggregate builders: the analyzer wraps a returned
    // AggregateFunction in its AggregateExpression automatically
    "kll_sketch_agg" -> { case Seq(c, k) =>
      KllSketchAggExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(c,
          org.apache.spark.sql.types.DoubleType), litInt(k, "k")) },
    "kll_merge_agg" -> { case Seq(c, k) =>
      KllMergeAggExpr(c, litInt(k, "k")) },
    "kll_quantile" -> { case Seq(s, f) =>
      KllQuantileExpr(s,
        org.apache.spark.sql.catalyst.expressions.Cast(f,
          org.apache.spark.sql.types.DoubleType)) })

  /** Register graft's expressions as SQL functions on a session, so
    * `spark.sql` text queries can call them: sdbm_hash(seed, s),
    * minhash_shingled(tokens, n, k), simhash64(tokens),
    * dot_long(a, b), word_shingles(tokens, n), sign_lsh(vec, planes).
    * (Sessions built through [[graft.Sessions]] get them injected at
    * construction via [[graft.GraftExtensions]]; this is the runtime
    * hook for sessions graft doesn't own.)
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
