package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operators must be total on degenerate inputs — an empty partition,
  * filter, or scale factor must yield empty results, not analysis or
  * runtime errors (the driver runs every query at several SFs).
  */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dedup operators are total on empty input") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(docs).count() == 0)
    assert(Dedup.minhashPairs(docs).count() == 0)
    assert(Dedup.simhashPairs(docs).count() == 0)
    assert(Dedup.ngramJaccardPairs(docs).count() == 0)
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(pairs).count() == 0)
    assert(Dedup.dropNearDuplicates(docs, pairs).count() == 0)
  }

  test("similarity operators are total on empty input") {
    import spark.implicits._
    val emb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.cosinePairs(emb, 0.5).count() == 0)
    assert(Similarity.topK(emb, emb, 5).count() == 0)
    assert(Similarity.annTopK(emb, col("id") >= 0, 5).count() == 0)
    assert(Similarity.ivfTopK(emb, col("id") >= 0, 5).count() == 0)
  }

  test("single-document corpus produces no pairs anywhere") {
    import spark.implicits._
    val one = Seq((1L, "just one document with enough words for shingles"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashPairs(one).count() == 0)
    assert(Dedup.simhashPairs(one).count() == 0)
    assert(Dedup.ngramJaccardPairs(one).count() == 0)
  }
}
