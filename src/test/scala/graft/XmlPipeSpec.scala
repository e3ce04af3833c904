package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import graft.functions.SdbmHash
import graft.operators.XmlPipe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for F10/F11 framing (reference Query.java:147-192):
  * leading `\n` per document, undeclared `sphinx:` prefix, escaping,
  * CDATA placement for mem-markup, trailing `\n` before the close tag.
  */
class XmlPipeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docsDf = {
    import spark.implicits._
    Seq(
      ("a<b&c>d", "s1", 7L, 5L),
      ("[[1,2],[3]]", "s2", 8L, 11L),
      ("plain", "s3", 9L, 5L)
    ).toDF("text", "source", "doc_id", "n_chars")
  }

  test("golden docset — single numeric key (F4 passthrough)") {
    val docs = XmlPipe.formatDocs(docsDf, Seq("doc_id"))
    val out = new ByteArrayOutputStream()
    XmlPipe.writeDocset(docs, out)
    val got = out.toString(StandardCharsets.UTF_8)
    val want =
      "<?xml version=\"1.0\" encoding=\"utf-8\"?><sphinx:docset>" +
        "\n<sphinx:document id=\"7\"><text>a&lt;b&amp;c&gt;d</text>" +
        "<source>s1</source><doc_id>7</doc_id><n_chars>5</n_chars></sphinx:document>" +
        "\n<sphinx:document id=\"8\"><text><![CDATA[<mem>1 2</mem><mem>3</mem>]]></text>" +
        "<source>s2</source><doc_id>8</doc_id><n_chars>11</n_chars></sphinx:document>" +
        "\n<sphinx:document id=\"9\"><text>plain</text>" +
        "<source>s3</source><doc_id>9</doc_id><n_chars>5</n_chars></sphinx:document>" +
        "\n</sphinx:docset>"
    assert(got == want)
  }

  test("composite key ids use the sdbm hash with the numeric seed (F5/F6)") {
    val docs = XmlPipe.formatDocs(docsDf, Seq("source", "doc_id"))
    val ids = docs.select("id").collect().map(_.getLong(0)).toSeq
    // seed = doc_id (first int/bigint key), joined string = rendered source
    val want = Seq(
      SdbmHash.hash(7L, "s1"), SdbmHash.hash(8L, "s2"), SdbmHash.hash(9L, "s3"))
    assert(ids == want)
  }

  test("null values render as empty elements (defined behavior vs ref NPE)") {
    import spark.implicits._
    val df = Seq((Some("x"), 1L), (None, 2L)).toDF("text", "doc_id")
    val docs = XmlPipe.formatDocs(df, Seq("doc_id")).orderBy(col("id"))
    val got = docs.select("doc").as[String].collect().toSeq
    assert(got(1).contains("<text></text>"))
  }

  test("empty input produces a valid empty docset (header + newline + close)") {
    val docs = XmlPipe.formatDocs(docsDf.filter("doc_id < 0"), Seq("doc_id"))
    val out = new ByteArrayOutputStream()
    XmlPipe.writeDocset(docs, out)
    assert(out.toString(StandardCharsets.UTF_8) ==
      "<?xml version=\"1.0\" encoding=\"utf-8\"?><sphinx:docset>\n</sphinx:docset>")
  }

  test("strictParity formatDocs: truncated ids, descriptor blobs, " +
      "Date.toString timestamps") {
    import spark.implicits._
    val df = Seq(((1L << 32) + 7L, Array[Byte](1, 2, 3),
      java.sql.Timestamp.valueOf("2024-02-29 13:05:09")))
      .toDF("k", "payload", "ts")
    val doc = XmlPipe.formatDocs(df, Seq("k"), strictParity = true)
      .select("id", "doc").as[(Long, String)].collect().head
    assert(doc._1 == 7L, "strict single-key id must truncate through getInt")
    assert(doc._2.contains(
      "<payload><![CDATA[java.nio.HeapByteBuffer[pos=0 lim=3 cap=3]]]></payload>"),
      doc._2)
    assert(doc._2.contains("<ts>Thu Feb 29 13:05:09 UTC 2024</ts>"), doc._2)
    // default mode on the same frame: full-width id, hex blob, ISO ts
    val sane = XmlPipe.formatDocs(df, Seq("k"))
      .select("id", "doc").as[(Long, String)].collect().head
    assert(sane._1 == (1L << 32) + 7L)
    assert(sane._2.contains("<payload><![CDATA[010203]]></payload>"))
    assert(sane._2.contains("<ts>2024-02-29 13:05:09</ts>"))
  }

  test("streaming docsets: every micro-batch shard is an individually " +
      "well-formed docset and no document is lost (delta-index shape)") {
    val dir = "/root/testdata/sf0.001"
    val ss = graft.streaming.EventsStream.streamSession(spark)
    val src = graft.streaming.EventsStream.source(ss, dir)
      .select(col("event_id"), col("event_type"))
    val docs = XmlPipe.formatDocs(src, Seq("event_id"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-stream-docset").toFile
    try {
      val q = XmlPipe.writeStreamingDocsets(docs, tmp.toString)
      try q.processAllAvailable() finally q.stop()
      val shards = java.nio.file.Files.walk(tmp.toPath).iterator().asScala
        .map(_.toFile)
        .filter(f => f.isFile && f.getName.startsWith("part-")).toSeq
      assert(shards.nonEmpty)
      var nDocs = 0
      shards.foreach { f =>
        val text = new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(text.startsWith(
          "<?xml version=\"1.0\" encoding=\"utf-8\"?><sphinx:docset>"),
          f.getName)
        assert(text.stripLineEnd.endsWith("</sphinx:docset>"), f.getName)
        nDocs += "<sphinx:document id=".r.findAllIn(text).size
      }
      val want = Tables.load(spark, dir, "events").count()
      assert(nDocs == want, s"docs across shards $nDocs != events $want")
    } finally SparkTestSession.deleteRecursively(tmp)
  }

  test("readDocset inverts the export exactly, including entity-laden " +
      "and multi-line values") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a<b&c>d", "plain"),
      (2L, "already &lt;escaped&gt; literal", "x&y"),
      (3L, "line one\nline two", ""),
      (4L, null.asInstanceOf[String], "tail"))
    val docs = rows.toDF("doc_id", "text", "note")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-readback").toFile
    try {
      val out = new java.io.File(tmp, "ds").toString
      XmlPipe.writeShardedDocsets(
        XmlPipe.formatDocs(docs, Seq("doc_id")), out)
      val back = XmlPipe.readDocset(spark, out, Seq("text", "note"))
        .orderBy("id").as[(Long, String, String)].collect().toSeq
      val want = rows.map { case (id, t, n) =>
        // nulls render as empty elements → read back as empty strings
        (id, Option(t).getOrElse(""), Option(n).getOrElse(""))
      }
      assert(back == want)
    } finally SparkTestSession.deleteRecursively(tmp)
  }

  test("readDocset round-trips 300 randomized values: entities, " +
      "unicode, newlines, quote/angle soup") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet =
      "ab &<>\"'&amp;&lt;\n\tπ漢字é]]></text><text>" // adversarial soup
    val rows = (1L to 300L).map { i =>
      val len = rnd.nextInt(60)
      val s = (0 until len)
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (i, s)
    }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-fuzz-rt").toFile
    try {
      val out = new java.io.File(tmp, "ds").toString
      XmlPipe.writeShardedDocsets(
        XmlPipe.formatDocs(rows.toDF("doc_id", "body"), Seq("doc_id")), out)
      val back = XmlPipe.readDocset(spark, out, Seq("body"))
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(back == rows)
    } finally SparkTestSession.deleteRecursively(tmp)
  }

  test("streaming docset sink is exactly-once across stop/restart: " +
      "batch ids resume from the checkpoint, no document lost or " +
      "duplicated") {
    import spark.implicits._
    val ss = graft.streaming.EventsStream.streamSession(spark)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("body", StringType)))
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-docset-src").toFile
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-docset-out").toFile
    def docsStream = {
      val raw = ss.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      XmlPipe.formatDocs(raw, Seq("doc_id"))
    }
    def land(rows: Seq[(Long, String)], name: String): Unit = {
      val stage = new java.io.File(srcDir, s"_stage_$name")
      rows.toDF("doc_id", "body").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
    try {
      land((1L to 5L).map(i => (i, s"first $i")), "chunk1")
      val q1 = XmlPipe.writeStreamingDocsets(docsStream, outDir.toString)
      try q1.processAllAvailable() finally q1.stop()
      // second chunk lands while the query is DOWN; restart must pick
      // it up from the checkpoint without re-emitting chunk1
      land((6L to 9L).map(i => (i, s"second $i")), "chunk2")
      val q2 = XmlPipe.writeStreamingDocsets(docsStream, outDir.toString)
      try q2.processAllAvailable() finally q2.stop()
      val ids = java.nio.file.Files.walk(outDir.toPath).iterator().asScala
        .map(_.toFile)
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .flatMap { f =>
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          "<sphinx:document id=\"(-?\\d+)\"".r
            .findAllMatchIn(text).map(_.group(1).toLong)
        }.toSeq
      assert(ids.sorted == (1L to 9L), s"got $ids")
    } finally {
      SparkTestSession.deleteRecursively(srcDir)
      SparkTestSession.deleteRecursively(outDir)
    }
  }

  test("sharded docsets: each shard is a complete docset") {
    val tmp = java.nio.file.Files.createTempDirectory("xmlshard").toString
    val docs = XmlPipe.formatDocs(docsDf.repartition(2), Seq("doc_id"))
    XmlPipe.writeShardedDocsets(docs, tmp)
    val files = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
    assert(files.size == 2)
    for (f <- files) {
      val content = new String(
        java.nio.file.Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      assert(content.startsWith(XmlPipe.Header))
      assert(content.trim.endsWith("</sphinx:docset>"))
    }
  }
}
