package graft.operators

import graft.functions.{dot_long, sign_lsh}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Similarity search over embedding columns (`array<float>`) — the
  * extended north-star surface (SURVEY.md §2b).
  *
  * Determinism design: embeddings are quantized to int64
  * (`round(x*10000)`) before any arithmetic. Dot products and norms
  * are then EXACT integer sums, and the final cosine is one
  * correctly-rounded double expression — bit-identical on any engine
  * (this is what makes the DuckDB oracle hash-match on FP data).
  *
  * Scale posture: brute-force variants are O(Q·N) / O(N²) and exist as
  * ground truth + small-N paths; the LSH variant is the 100 TB path —
  * sign-random-projection buckets make candidate generation linear,
  * with per-bucket top-k.
  */
object Similarity {

  /** Integer-quantized copy of an embedding column. */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * 10000).cast("long"))

  /** Exact int dot product of two quantized vectors — a codegen'd
    * tight loop (DotLongExpr), NOT zip_with/aggregate: higher-order
    * functions are interpreted per element, which multiplies into
    * minutes inside an O(N²) pair join.
    */
  def qdot(a: Column, b: Column): Column = dot_long(a, b)

  /** Deterministic cosine from quantized vectors + precomputed square
    * norms: dot / sqrt(na*nb), all in exactly-rounded double ops.
    */
  def qcosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  private def withQuantized(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("norm", qdot(col("qv"), col("qv")))

  /** All pairs with cosine >= minCosine (embedding near-dup dedup).
    * Brute force O(N²) — ground truth; use [[annTopK]]'s bucketing at
    * scale. Output: (id_a, id_b, cosine).
    */
  def cosinePairs(emb: DataFrame, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = withQuantized(emb, idCol, vecCol)
    q.as("a").join(q.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        qcosine(qdot(col("a.qv"), col("b.qv")), col("a.norm"), col("b.norm"))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Exact top-k neighbors for each query vector (brute force over the
    * candidate set). Output: (query_id, rank, neighbor_id, cosine).
    * Rank ties (exactly equal cosine) break by neighbor id.
    */
  def topK(queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = withQuantized(queries, idCol, vecCol)
    val c = withQuantized(candidates, idCol, vecCol)
    val scored = broadcast(q).as("q").join(c.as("c"), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        qcosine(qdot(col("q.qv"), col("c.qv")), col("q.norm"), col("c.norm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component j
    * of plane p derived from murmur3 — no RNG state, reproducible on
    * every executor.
    */
  private[operators] def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        MurmurHash3.stringHash(s"plane:$p:$j").toDouble / Int.MaxValue
      }
    }

  /** Sign-random-projection bucket id (nPlanes bits) for an embedding.
    * At scale this is the shuffle key: vectors only meet candidates in
    * their own bucket, making ANN candidate generation linear.
    * Codegen'd (SignLshExpr) — plane components match [[planes]].
    */
  def lshBucket(vecCol: Column, nPlanes: Int, dim: Int): Column =
    sign_lsh(vecCol, nPlanes)

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket. Output shape matches [[topK]] (rank within bucket).
    */
  def annTopK(emb: DataFrame, queryFilter: Column, k: Int,
      nPlanes: Int = 6, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
      .withColumn("qv", quantize(col("v")))
      .withColumn("norm", qdot(col("qv"), col("qv")))
      .drop("v")
    val queries = bucketed.filter(queryFilter)
    val scored = broadcast(queries).as("q")
      .join(bucketed.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        qcosine(qdot(col("q.qv"), col("c.qv")), col("q.norm"), col("c.norm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
