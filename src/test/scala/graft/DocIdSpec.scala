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

  test("strictParity matches a direct port of the reference seed scan " +
      "(zero-heavy property run)") {
    import spark.implicits._
    // Oracle: verbatim port of Query.java:206-218 — numeric keys are
    // consumed by the seed scan while hashBase==0 (a 0 value is a
    // no-op assignment, swallowed), later numerics join the string.
    // Null renders as "" (the library's documented null divergence);
    // null counts as 0 for the seed (Cassandra's unset-cell getInt).
    val rnd = new scala.util.Random(7)
    def num(): Option[Long] = rnd.nextInt(10) match {
      case r if r < 3 => Some(0L)                    // zero-heavy
      case r if r < 4 => None
      case _          => Some(rnd.nextInt(1000).toLong + 1L)
    }
    val rows = (0 until 300).map { _ =>
      (num(), rnd.alphanumeric.take(rnd.nextInt(6)).mkString, num(), num())
    }
    val df = rows.toDF("a", "s", "b", "c")
    val got = df
      .select(DocId.docId(df, Seq("a", "s", "b", "c"), strictParity = true)
        .as("id"))
      .as[Long].collect().toSeq
    val expected = rows.map { case (a, s, b, c) =>
      var base = 0L
      val sj = new java.util.StringJoiner(" ")
      def step(v: Option[Long]): Unit =
        if (base == 0L) base = v.getOrElse(0L)
        else sj.add(v.map(_.toString).getOrElse(""))
      step(a); sj.add(s); step(b); step(c)
      SdbmHash.hash(base, sj.toString)
    }
    assert(got == expected)
  }

  test("strictParity diverges from default exactly when a leading " +
      "numeric key is zero") {
    import spark.implicits._
    val zero = Seq((0L, "x", 7L)).toDF("a", "s", "b")
    val strictZero = zero.select(
      DocId.docId(zero, Seq("a", "s", "b"), strictParity = true).as("id"))
      .as[Long].collect().head
    val defaultZero = zero.select(
      DocId.docId(zero, Seq("a", "s", "b")).as("id"))
      .as[Long].collect().head
    // reference: a=0 swallowed, b seeds → sdbm(7, "x")
    assert(strictZero == SdbmHash.hash(7L, "x"))
    // default: schema-bound seed a=0, b renders → sdbm(0, "x 7")
    assert(defaultZero == SdbmHash.hash(0L, "x 7"))
    assert(strictZero != defaultZero)
    // nonzero leading numeric: both modes agree
    val nz = Seq((5L, "x", 7L)).toDF("a", "s", "b")
    val strictNz = nz.select(
      DocId.docId(nz, Seq("a", "s", "b"), strictParity = true).as("id"))
      .as[Long].collect().head
    val defaultNz = nz.select(
      DocId.docId(nz, Seq("a", "s", "b")).as("id"))
      .as[Long].collect().head
    assert(strictNz == defaultNz && strictNz == SdbmHash.hash(5L, "x 7"))
  }

  test("strictParity reproduces getInt truncation against a direct " +
      "Java-port oracle (wide-value property run)") {
    import spark.implicits._
    // Oracle: Query.java getId with the driver reads ported verbatim,
    // including the (int) window on the single-key id (Q:203) and the
    // composite seed (Q:211); string-joined numerics go through
    // getValue's getLong (Q:235) — full width, NOT truncated.
    val rnd = new scala.util.Random(13)
    def wide(): Long = rnd.nextInt(6) match {
      case 0 => 0L
      case 1 => 1L << 32                        // truncates to 0 → seed-skipped
      case 2 => (rnd.nextLong() & 0xFFFFFFFFL) | (1L << 33)
      case 3 => -(1L << 35) + rnd.nextInt(100)
      case 4 => rnd.nextInt(1000).toLong
      case _ => rnd.nextLong()
    }
    val rows = (0 until 300).map { _ =>
      (wide(), rnd.alphanumeric.take(rnd.nextInt(5)).mkString, wide())
    }
    // single wide key
    val single = rows.map(_._1).toDF("k")
    val gotSingle = single
      .select(DocId.docId(single, Seq("k"), strictParity = true).as("id"))
      .as[Long].collect().toSeq
    assert(gotSingle == rows.map(_._1.toInt.toLong))
    // composite (a, s, b): seed scan over TRUNCATED values
    val df = rows.toDF("a", "s", "b")
    val got = df
      .select(DocId.docId(df, Seq("a", "s", "b"), strictParity = true).as("id"))
      .as[Long].collect().toSeq
    val expected = rows.map { case (a, s, b) =>
      var base = 0L
      val sj = new java.util.StringJoiner(" ")
      def step(v: Long): Unit =
        if (base == 0L) base = v.toInt.toLong    // getInt, sign-extended
        else sj.add(v.toString)                  // getValue getLong: full width
      step(a); sj.add(s); step(b)
      SdbmHash.hash(base, sj.toString)
    }
    assert(got == expected)
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
