package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical (tf·idf) ranking and a vector
  * (exact cosine) ranking of the same corpus with reciprocal-rank
  * fusion (RRF, Cormack et al. SIGIR'09) — the standard two-tower
  * search shape (BM25-family + embedding ANN) reduced to its exact,
  * oracle-checkable core.
  *
  * Determinism: RRF contributions are integer-quantized to
  * micro-units — `1e6 div (k + rank)` — so the fused score is a
  * BIGINT sum, bit-identical on any engine/partitioning (the usual
  * `1/(k+rank)` doubles would hash-diverge on summation order; at
  * k=60 the quantization never reorders candidates because distinct
  * ranks ≤ ~940 map to distinct quotients, and beyond that the
  * candidate pools are capped far earlier by `poolK`).
  *
  * 100 TB shape: both candidate generators are the existing scale
  * paths — [[TextStats.searchTopK]] compiles to a pruned explode +
  * TakeOrderedAndProject (no global sort), and the exact
  * [[Similarity.topK]] used here has the LSH/IVF ANN twins as the
  * corpus-scale substitutes. Fusion itself touches only the two
  * ≤poolK-row candidate pools: the window ranks and the full-outer
  * join are driver-trivial no matter the corpus size.
  *
  * Id contract: `docs.doc_id` and `embs.vec_id` index the same
  * corpus (doc i ↔ its embedding i), as in the fixture tables.
  */
object Retrieval {

  /** Top-k fused results for one query (`terms` for the lexical leg,
    * the embedding of `queryVecId` for the vector leg). Output:
    * (doc_id, lex_rank, vec_rank, rrf_micros) — a null rank means
    * that leg did not surface the doc in its top-`poolK` pool.
    */
  def hybridTopK(docs: DataFrame, embs: DataFrame, terms: Seq[String],
      queryVecId: Long, k: Int = 10, rrfK: Int = 60,
      poolK: Int = 20): DataFrame = {
    // lexical pool: integer-exact tf·idf scores, already totally
    // ordered; the unpartitioned window re-ranks only the ≤poolK
    // surviving rows (a single tiny partition by construction)
    val lex = TextStats.searchTopK(docs, terms, poolK)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id").as("lid"), col("lex_rank"))
    // vector pool: exact quantized-cosine top-poolK for the query
    // vector (rank ties break by neighbor id inside the operator)
    val vec = Similarity
      .topK(embs.filter(col("vec_id") === queryVecId), embs, poolK)
      .select(col("neighbor_id").as("vid"), col("rank").as("vec_rank"))
    def rrf(rank: org.apache.spark.sql.Column) =
      coalesce(call_function("div", lit(1000000L), lit(rrfK.toLong) + rank),
        lit(0L))
    lex.join(vec, col("lid") === col("vid"), "fullOuter")
      .select(coalesce(col("lid"), col("vid")).as("doc_id"),
        col("lex_rank"), col("vec_rank"),
        (rrf(col("lex_rank")) + rrf(col("vec_rank"))).as("rrf_micros"))
      .orderBy(col("rrf_micros").desc, col("doc_id"))
      .limit(k)
  }
}
