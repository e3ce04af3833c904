package graft

import graft.functions.SdbmHash
import graft.operators.{DocId, XmlPipe}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F4/F5 doc-id derivation corners (reference Query.java:194-218). */
class DocIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("single decimal(38,0) key (varint stand-in) passes through") {
    import spark.implicits._
    val df = Seq("9007199254740993").toDF("v")
      .select(col("v").cast("decimal(38,0)").as("k"))
    val got = df.select(DocId.docId(df, Seq("k")).as("id"))
      .as[Long].collect().head
    assert(got == 9007199254740993L) // would truncate via the reference's getInt
  }

  test("no numeric key: seed 0, all keys rendered and joined") {
    import spark.implicits._
    val df = Seq(("alpha", "beta")).toDF("s1", "s2")
    val got = df.select(DocId.docId(df, Seq("s1", "s2")).as("id"))
      .as[Long].collect().head
    assert(got == SdbmHash.hash(0L, "alpha beta"))
  }

  test("numeric key seeds wherever it appears; others join in key order") {
    import spark.implicits._
    val df = Seq(("alpha", 42L, 1.5)).toDF("s", "k", "d")
    val got = df.select(DocId.docId(df, Seq("s", "k", "d")).as("id"))
      .as[Long].collect().head
    assert(got == SdbmHash.hash(42L, "alpha 1.5"))
  }

  test("null key values render as empty string, not NPE (divergence)") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 7L)).toDF("s", "k")
    val got = df.select(DocId.docId(df, Seq("s", "k")).as("id"))
      .as[Long].collect().head
    assert(got == SdbmHash.hash(7L, ""))
  }

  test("struct/map fields rendered as JSON are XML-escaped") {
    import spark.implicits._
    val df = Seq((1L, Map("f" -> "a & b <x>"))).toDF("doc_id", "m")
    val doc = XmlPipe.formatDocs(df, Seq("doc_id"))
      .select("doc").as[String].collect().head
    assert(doc.contains("<m>{\"f\":\"a &amp; b &lt;x&gt;\"}</m>"), doc)
  }

  test("binary field values are CDATA-wrapped hex in documents") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](0x0a, 0x1b, -1))).toDF("doc_id", "payload")
    val doc = XmlPipe.formatDocs(df, Seq("doc_id"))
      .select("doc").as[String].collect().head
    assert(doc.contains("<payload><![CDATA[0A1BFF]]></payload>"))
  }
}
