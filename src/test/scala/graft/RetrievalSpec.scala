package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hybrid RRF fusion: both-pool docs outrank single-pool docs, a
  * single-leg doc carries a null rank for the missing leg, the score
  * is an exact integer, and results are partitioning-independent.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // doc 1 matches the query terms AND is the closest vector; doc 2 is
  // lexical-only; doc 3 is vector-only; doc 4 is in neither pool.
  // vec_id 0 is the query vector.
  private def fixtures = {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark window merge spark"),
      (2L, "spark merge plan"),
      (3L, "nothing relevant here"),
      (4L, "also irrelevant text")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),   // cosine ≈ 0.994 → vec rank 1
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Array(0.7f, 0.3f, 0.0f)),   // cosine ≈ 0.919 → vec rank 2
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    (docs, embs)
  }

  test("doc in both pools wins; single-leg docs carry a null rank") {
    val (docs, embs) = fixtures
    val out = Retrieval.hybridTopK(docs, embs,
      Seq("spark", "window", "merge"), queryVecId = 0L, poolK = 2).collect()
    assert(out.head.getLong(0) === 1L) // both-pool doc fuses highest
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toMap
    assert(byId(1L)._1.isDefined && byId(1L)._2.isDefined)
    assert(byId(2L)._1.isDefined && byId(2L)._2.isEmpty)  // lexical only
    assert(byId(3L)._1.isEmpty && byId(3L)._2.isDefined)  // vector only
    assert(!byId.contains(4L))
    // exact integer RRF: rank 1 both legs = 2 * (1e6 div 61)
    assert(byId(1L)._3 === 2L * (1000000L / 61L))
  }

  test("fusion is partitioning-independent") {
    val (docs, embs) = fixtures
    val a = Retrieval.hybridTopK(docs.repartition(1), embs.repartition(1),
      Seq("spark", "merge"), 0L).collect().toSeq
    val b = Retrieval.hybridTopK(docs.repartition(7), embs.repartition(5),
      Seq("spark", "merge"), 0L).collect().toSeq
    assert(a === b)
  }

  test("prfSearch expansion rescues a vocabulary-mismatched doc the " +
      "plain query cannot reach") {
    import spark.implicits._
    // query 'apple': docs 1-2 match directly and dominate the
    // feedback set; their non-query term 'banana' becomes the
    // expansion term; doc 3 contains ONLY 'banana' — invisible to
    // the raw query, found by the expanded one
    val docs = Seq(
      (1L, "apple banana pie"),
      (2L, "apple banana tart"),
      (3L, "banana split dessert"),
      (4L, "cherry cake slice")
    ).toDF("doc_id", "text")
    val expanded = Retrieval.prfSearch(docs, Seq("apple"), k = 10,
      fbDocs = 2, expTerms = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(expanded.contains(3L),
      s"expansion must surface the banana-only doc: $expanded")
    assert(!expanded.contains(4L), "unrelated doc stays invisible")
    val raw = graft.operators.TextStats.bm25TopK(docs, Seq("apple"))
      .select("doc_id").as[Long].collect().toSeq
    assert(!raw.contains(3L), "without PRF doc 3 is unreachable")
  }

  test("prfSearch is deterministic and degrades to plain BM25 when " +
      "feedback adds nothing") {
    import spark.implicits._
    // single-doc corpus: feedback = that doc, whose every non-query
    // term expands, but ranking still returns exactly the corpus
    val docs = Seq((1L, "apple only here")).toDF("doc_id", "text")
    def run() = Retrieval.prfSearch(docs, Seq("apple"), k = 5,
      fbDocs = 1, expTerms = 2)
      .select("doc_id", "score").as[(Long, Long)].collect().toSeq
    val got = run()
    assert(got.map(_._1) == Seq(1L))
    assert(run() == got)
  }

  test("mmrRerank: a near-duplicate of the top hit drops below a " +
      "less relevant but diverse candidate — hand-computed scores") {
    import spark.implicits._
    // A (rel 100) and near-dup B (rel 99, jaccard 5000 bp to A),
    // diverse C (rel 50): plain top-2 = A,B; MMR = A,C,B
    val cands = Seq(
      (1L, 100L, "xxxxxxx"), (2L, 99L, "xxxxxxy"),
      (3L, 50L, "zzzzzzz")).toDF("id", "rel", "text")
    val got = graft.operators.Retrieval.mmrRerank(cands, k = 3)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 50000000L), (2L, 3L, 25000000L),
      (3L, 2L, 24500000L)))
  }
}
