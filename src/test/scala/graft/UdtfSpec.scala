package graft

import graft.functions.chunk_text
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UDTF surface: the chunk_text Generator must be bit-identical to
  * the relational TextStats.chunk formulation (the codegen'd scale
  * path), resolve in the SQL LATERAL VIEW position through the
  * injected function registry, follow the explode(NULL) convention,
  * and reject bad window parameters at analysis time.
  */
class UdtfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a" * 553),            // multi-chunk, fixture max length
      (2L, "short"),              // shorter than one window → 1 chunk
      (3L, ""),                   // empty string still yields 1 chunk
      (4L, null.asInstanceOf[String]), // null → NO rows (explode conv.)
      (5L, "x" * 120),            // exactly one window, no remainder
      (6L, "y" * 121)             // one char past → second chunk
    ).toDF("doc_id", "text")
  }

  test("generator output is bit-identical to the relational chunk op") {
    val gen = docs.na.drop(Seq("text"))
      .select(col("doc_id"), chunk_text(col("text"), 120, 30))
      .orderBy("doc_id", "chunk_id")
    val rel = operators.TextStats.chunk(
        docs.na.drop(Seq("text")), size = 120, overlap = 30)
      .orderBy("doc_id", "chunk_id")
    assert(gen.columns.toSeq === Seq("doc_id", "chunk_id", "chunk"))
    assert(gen.collect().toSeq === rel.collect().toSeq)
  }

  test("null input emits no rows; empty string emits one empty chunk") {
    val out = docs.select(col("doc_id"), chunk_text(col("text"), 120, 30))
      .groupBy("doc_id").count().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 4 (null) is absent entirely; doc 3 ("") has exactly 1 chunk;
    // doc 1: ceil((553-30)/90) = 6 windows
    assert(out === Seq((1L, 6L), (2L, 1L), (3L, 1L), (5L, 1L), (6L, 2L)))
  }

  test("resolves as a SQL table function under LATERAL VIEW") {
    docs.createOrReplaceTempView("udtf_docs")
    val n = spark.sql("""
      SELECT doc_id, c.chunk_id, c.chunk
      FROM udtf_docs LATERAL VIEW chunk_text(text, 120, 30) c
    """).count()
    assert(n === 11) // 6 + 1 + 1 + 0 + 1 + 2
  }

  test("seeded random sweep: generator matches the relational op on " +
      "arbitrary text (unicode incl. astral) and window geometry") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // alphabet stresses every boundary: ASCII, combining mark, BMP
    // CJK, and an ASTRAL (surrogate-pair) codepoint
    val alphabet = Array("a", "b", " ", "é", "́", "中",
      new String(Character.toChars(0x1F600)))
    def randText() = (0 until rnd.nextInt(300))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for ((size, overlap) <- Seq((7, 0), (10, 3), (64, 63), (200, 50))) {
      val docs = (1L to 40L).map(i => (i, randText())).toDF("doc_id", "text")
      val gen = docs.select(col("doc_id"), chunk_text(col("text"), size, overlap))
        .orderBy("doc_id", "chunk_id").collect().toSeq
      val rel = operators.TextStats.chunk(docs, size, overlap)
        .orderBy("doc_id", "chunk_id").collect().toSeq
      assert(gen == rel, s"size=$size overlap=$overlap diverged")
    }
  }

  test("bad window parameters fail at analysis time, not per row") {
    val e = intercept[AnalysisException] {
      docs.select(chunk_text(col("text"), 100, 100)).collect()
    }
    assert(e.getMessage.contains("size > overlap"))
  }
}
