package graft

import graft.operators.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

/** Benchmark decontamination: long-n-gram overlap flagging. */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val benchSpan =
    "the quick brown fox jumps over the lazy dog near the river bank"

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, s"some prefix then $benchSpan and a suffix"), // verbatim copy
      (2L, "completely unrelated content about spark catalyst expressions"),
      (3L, benchSpan), // the benchmark text itself
      (4L, "short")    // too short to produce any 30-gram
    ).toDF("doc_id", "text")
  }

  private def bench = {
    import spark.implicits._
    Seq((100L, s"eval question: $benchSpan answer: yes"))
      .toDF("doc_id", "text")
  }

  test("documents containing a benchmark span are flagged; unrelated " +
      "and too-short ones are not") {
    import spark.implicits._
    val got = Decontaminate.flagged(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("clean returns the complement of flagged") {
    import spark.implicits._
    val kept = Decontaminate.clean(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("shared_ngrams counts distinct overlapping grams") {
    import spark.implicits._
    val counts = Decontaminate.flagged(corpus, bench)
      .select("doc_id", "shared_ngrams").as[(Long, Long)].collect().toMap
    // doc 3 is exactly the span: length 64 → 35 distinct 30-grams, all
    // present inside the longer benchmark text
    assert(counts(3L) == benchSpan.length - 29)
    // doc 1 embeds the span with different neighbors: at least the
    // fully-interior grams collide, fewer than the doc's total grams
    assert(counts(1L) >= benchSpan.length - 29)
  }

  test("empty benchmark flags nothing; minShared raises the bar") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Decontaminate.flagged(corpus, empty).count() == 0)
    assert(Decontaminate.clean(corpus, empty).count() == corpus.count())
    val strict = Decontaminate.flagged(corpus, bench, minShared = 1000)
    assert(strict.count() == 0)
  }
}
