package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import javax.xml.stream.XMLOutputFactory

import graft.operators.XmlPipe
import org.scalatest.funsuite.AnyFunSuite

/** Byte-compatibility property test: the reference serialized through
  * javax.xml.stream (Query.java:144-192); our documents are built from
  * column expressions. This spec re-implements the reference's write
  * loop literally over StAX (as a TEST ORACLE only — SURVEY.md §5
  * strategy 3) and checks our docset equals StAX output byte-for-byte
  * on randomized adversarial inputs (specials, unicode, JSON matrices,
  * malformed JSON).
  */
class StaxParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Literal mirror of the reference pipeline for string fields:
    * docset framing (Q:147-150, 166-169), per-row document (Q:182-192)
    * and parseString's matrix→CDATA logic (Q:279-301).
    */
  private def staxDocset(rows: Seq[(Long, Seq[(String, String)])]): String = {
    val bos = new ByteArrayOutputStream()
    // Pin the JDK's built-in writer: the reference's classpath had no
    // StAX provider (pom.xml:11-56), so it serialized through the JDK
    // default. Spark's classpath ships Woodstox, which would otherwise
    // hijack newInstance() and uses different conventions (single-quote
    // XML declaration, unescaped '>' in text).
    System.setProperty("javax.xml.stream.XMLOutputFactory",
      "com.sun.xml.internal.stream.XMLOutputFactoryImpl")
    val w = XMLOutputFactory.newInstance().createXMLStreamWriter(bos, "UTF-8")
    w.writeStartDocument("utf-8", "1.0")
    w.setPrefix("sphinx", "sphinx")
    w.writeStartElement("sphinx", "docset")
    for ((id, fields) <- rows) {
      w.writeCharacters("\n")
      w.writeStartElement("sphinx", "document")
      w.writeAttribute("id", id.toString)
      for ((name, value) <- fields) {
        w.writeStartElement(name)
        val n = value.length
        val bracketed = n > 0 &&
          ((value.charAt(0) == '[' && value.charAt(n - 1) == ']') ||
            (value.charAt(0) == '{' && value.charAt(n - 1) == '}'))
        val parsed: Option[String] =
          if (!bracketed) None
          else try {
            val t = new com.fasterxml.jackson.core.`type`.TypeReference[
              java.util.List[Array[Integer]]] {}
            val sense = mapper.readValue[java.util.List[Array[Integer]]](value, t)
            val sb = new StringBuilder
            sense.forEach { mem =>
              sb.append(mem.map(_.toString).mkString("<mem>", " ", "</mem>"))
            }
            Some(sb.toString)
          } catch { case _: Exception => None }
        parsed match {
          case Some(markup) => w.writeCData(markup)
          case None => w.writeCharacters(value)
        }
        w.writeEndElement()
      }
      w.writeEndElement()
    }
    w.writeCharacters("\n")
    w.writeEndElement()
    w.flush()
    bos.toString(StandardCharsets.UTF_8)
  }

  private def adversarialStrings(rnd: scala.util.Random): String = {
    rnd.nextInt(9) match {
      case 0 => "plain text " + rnd.nextInt(1000)
      case 1 => s"specials &<>&amp; ${rnd.nextInt(100)} <tag> & more"
      case 2 => "ünïcödé ☃ 漢字 " + rnd.nextInt(100)
      case 3 => s"[[${rnd.nextInt(100)},${rnd.nextInt(100)}],[${rnd.nextInt(100)}]]"
      case 4 => s"[${rnd.nextInt(100)},${rnd.nextInt(100)}]" // flat → fallback
      case 5 => s"""{"k": ${rnd.nextInt(100)}}"""            // object → fallback
      case 6 => "[[not json]]"                               // malformed → fallback
      case 7 => ""                                           // empty
      case 8 => s"""[["${rnd.nextInt(100)}","+${rnd.nextInt(9)}"]]""" // jackson coercion
    }
  }

  test("docset output is byte-identical to the StAX serializer on random inputs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val rows = (0 until 20).map { i =>
        (trial * 100L + i,
          Seq("content" -> adversarialStrings(rnd),
            "title" -> adversarialStrings(rnd)))
      }
      val expected = staxDocset(rows.map { case (id, fs) =>
        // reference emits ALL selected columns, including the key
        (id, fs :+ ("doc_id" -> id.toString))
      })
      // graft emits fields in dataframe column order: doc_id is a
      // column too — reorder so doc_id comes last like the mirror
      import spark.implicits._
      val df = rows.map { case (id, fs) => (fs(0)._2, fs(1)._2, id) }
        .toDF("content", "title", "doc_id")
      val out = new ByteArrayOutputStream()
      XmlPipe.writeDocset(XmlPipe.formatDocs(df, Seq("doc_id")), out)
      val got = out.toString(StandardCharsets.UTF_8)
      assert(got == expected, s"trial $trial diverged")
    }
  }
}
