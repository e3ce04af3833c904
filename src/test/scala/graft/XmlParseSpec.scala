package graft

import graft.operators.XmlPipe
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native-parser leg of the round trip: Spark 4's built-in
  * `from_xml` must consume the fragments [[XmlPipe.formatDocs]]
  * produces — undeclared `sphinx:` prefix and all — recovering typed
  * values with entities unescaped. The docset READER
  * ([[XmlPipe.readDocset]]) covers the sharded-file path; this covers
  * a stock Spark consumer with no graft code on the read side
  * (driver-gated end to end by the `xml_parse_roundtrip` query).
  */
class XmlParseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType.fromDDL(
    "_id BIGINT, doc_id BIGINT, source STRING, text STRING, n_chars BIGINT")
  private def parse(frag: String) = {
    val s = spark
    import s.implicits._
    Seq(frag).toDF("doc")
      .select(from_xml(col("doc"), schema,
        new java.util.HashMap[String, String]()).as("p"))
      .select("p._id", "p.doc_id", "p.source", "p.text", "p.n_chars")
      .collect()(0)
  }

  test("from_xml parses a handwritten fragment: attribute id, " +
      "entity unescaping, typed ints") {
    val r = parse("\n<sphinx:document id=\"7\"><doc_id>7</doc_id>" +
      "<source>web &amp; print</source><text>a &lt;b&gt; &amp;amp; c</text>" +
      "<n_chars>11</n_chars></sphinx:document>")
    assert(r.getLong(0) == 7L && r.getLong(1) == 7L)
    assert(r.getString(2) == "web & print")
    // double-escaped entity comes back as the literal "&amp;" —
    // escape∘unescape is the identity even for entity-bearing data
    assert(r.getString(3) == "a <b> &amp; c")
    assert(r.getLong(4) == 11L)
  }

  test("from_xml round-trips formatDocs output bit-exactly for " +
      "markup-bearing strings") {
    val s = spark
    import s.implicits._
    val src = Seq(
      (1L, "plain prose", "web", 11L),
      (2L, "tags <b>bold</b> & amp; entities &lt;kept&gt;", "crawl", 45L),
      (3L, "", "empty", 0L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val back = XmlPipe.formatDocs(
        src.select(col("doc_id"), col("text"), col("source"), col("n_chars")),
        Seq("doc_id"))
      .select(from_xml(col("doc"), StructType.fromDDL(
        "_id BIGINT, doc_id BIGINT, text STRING, source STRING, n_chars BIGINT"),
        new java.util.HashMap[String, String]()).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("p.text").as("text"),
        col("p.source").as("source"), col("p.n_chars").as("n_chars"))
    val diff = back.exceptAll(src).count() + src.exceptAll(back).count()
    assert(diff == 0, "from_xml(formatDocs(x)) != x")
  }
}
