package graft

import graft.operators.Scrub
import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def redactOne(text: String): (Long, Long, Long, Long, String) = {
    import spark.implicits._
    Scrub.redact(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_email", "n_ipv4", "n_phone", "n_numid", "redacted")
      .as[(Long, Long, Long, Long, String)].collect().head
  }

  test("each default rule redacts its PII class") {
    assert(redactOne("write to bob.smith+x@mail.example.org today") ==
      ((1L, 0L, 0L, 0L, "write to <EMAIL> today")))
    assert(redactOne("from 192.168.0.1 and 10.0.0.7") ==
      ((0L, 2L, 0L, 0L, "from <IP> and <IP>")))
    assert(redactOne("call +1-555-014-2288 now") ==
      ((0L, 0L, 1L, 0L, "call <PHONE> now")))
    assert(redactOne("ssn-like 123456789 and card 4111111111111111") ==
      ((0L, 0L, 0L, 2L, "ssn-like <ID> and card <ID>")))
  }

  test("sequential rules never double-count an already-redacted span") {
    // the email's digits and the IP's octets must not also fire numid;
    // the phone's digit groups are each < 9 digits so numid stays 0
    assert(redactOne("u123456789@ex.com at 1.2.3.4 ref 987654321") ==
      ((1L, 1L, 0L, 1L, "<EMAIL> at <IP> ref <ID>")))
  }

  test("conservative non-matches survive") {
    val (e, i, p, n, red) = redactOne(
      "v1.2.3 released; meeting at 5, room 101; a@b only")
    assert((e, i, p, n) == ((0L, 0L, 0L, 0L)))
    assert(red == "v1.2.3 released; meeting at 5, room 101; a@b only")
  }

  test("clean and empty text yield zero counts, unchanged text") {
    assert(redactOne("no pii here at all") ==
      ((0L, 0L, 0L, 0L, "no pii here at all")))
    assert(redactOne("") == ((0L, 0L, 0L, 0L, "")))
  }

  private def cleanOne(text: String): String = {
    import spark.implicits._
    Scrub.htmlClean(Seq((1L, text)).toDF("doc_id", "text"))
      .select("text").as[String].collect().head
  }

  test("htmlClean strips tags, script/style bodies and comments, " +
      "decodes entities once, collapses whitespace") {
    assert(cleanOne("<html><body><p>Hello <b>world</b></p></body></html>")
      == "Hello world")
    // script/style CONTENT goes, not just the tags
    assert(cleanOne("a<script>var x = '<p>';</script>b") == "a b")
    assert(cleanOne("a<style>p { color: red }</style>b") == "a b")
    assert(cleanOne("a<!-- hidden\nnav -->b") == "a b")
    // entity decode
    assert(cleanOne("1 &lt; 2 &amp;&amp; 3 &gt; 2") == "1 < 2 && 3 > 2")
    assert(cleanOne("say &quot;hi&quot; &amp; &#39;bye&#39;")
      == "say \"hi\" & 'bye'")
    // the double-decode trap: &amp;lt; is the TEXT "&lt;", not "<"
    assert(cleanOne("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
    // tags become separators, never gluing words
    assert(cleanOne("one<br>two<div>three</div>") == "one two three")
    // whitespace (incl. &nbsp;) collapses, ends trim
    assert(cleanOne("  a\t\tb&nbsp;&nbsp;c\r\nd  ") == "a b c d")
    // multiline script with attributes
    assert(cleanOne("x<script type=\"text/javascript\">\nif (a<b) {}\n" +
      "</script>y") == "x y")
  }

  test("pseudonymize: stable tokens, salt rotation, referential " +
      "integrity") {
    import spark.implicits._
    val df = Seq((1L, 42L), (2L, 42L), (3L, 7L)).toDF("event_id", "uid")
    val toks = Scrub.pseudonymize(df, Seq("uid"), salt = "s1", prefix = "u")
      .orderBy("event_id").select("uid").as[String].collect().toSeq
    // same input value -> same token (joins on the pseudonym work)
    assert(toks(0) == toks(1) && toks(0) != toks(2))
    assert(toks.forall(_.startsWith("u_")))
    // rotating the salt re-keys every token
    val rot = Scrub.pseudonymize(df, Seq("uid"), salt = "s2", prefix = "u")
      .orderBy("event_id").select("uid").as[String].collect().toSeq
    assert(toks.zip(rot).forall { case (a, b) => a != b })
  }

  test("summary aggregates per group with hit-doc count") {
    import spark.implicits._
    val df = Seq(
      ("a", "mail x@y.io and z@w.co"),
      ("a", "clean"),
      ("b", "ip 1.2.3.4")).toDF("source", "text")
    val got = Scrub.summary(df).orderBy("source")
      .select("source", "n_docs", "n_docs_hit", "sum_email", "sum_ipv4")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 1L, 2L, 0L), ("b", 1L, 1L, 0L, 1L)))
  }

  test("encodingAudit: clean ASCII passes, control bytes and mojibake " +
      "markers fail, plain non-ASCII is counted but allowed") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain ascii"),
      (2L, "café ok"),          // accented: counted, still ok
      (3L, "bad\u0007byte"),         // C0 control -> fail
      (4L, "mojibake Ã©")  // 'Ã©' marker -> fail
    ).toDF("doc_id", "text")
    val got = Scrub.encodingAudit(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got(0) == ((1L, 11L, 0L, 0L, 0L, true)))
    assert(got(1)._3 == 1L && got(1)._6, "accented char must pass")
    assert(got(2)._4 == 1L && !got(2)._6, "control byte must fail")
    assert(got(3)._5 == 1L && got(3)._3 == 2L && !got(3)._6,
      "mojibake marker must fail")
  }

  test("kAnonymity: per-class row and sensitive-distinct flags at " +
      "the k and l thresholds, boundary inclusive") {
    import spark.implicits._
    val df = Seq(
      // class (t1, 1): 5 rows, 2 users -> k_ok (boundary), l_ok
      ("t1", 1L, 10L), ("t1", 1L, 10L), ("t1", 1L, 10L),
      ("t1", 1L, 11L), ("t1", 1L, 11L),
      // class (t1, 2): 2 rows, 1 user -> neither
      ("t1", 2L, 10L), ("t1", 2L, 10L),
      // class (t2, 1): 6 rows, 1 user -> k only
      ("t2", 1L, 12L), ("t2", 1L, 12L), ("t2", 1L, 12L),
      ("t2", 1L, 12L), ("t2", 1L, 12L), ("t2", 1L, 12L)
    ).toDF("event_type", "day", "user_id")
    val got = Scrub.kAnonymity(df, Seq("event_type", "day"), "user_id",
        k = 5L, l = 2L)
      .orderBy("event_type", "day")
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      ("t1", 1L, 5L, 2L, true, true),
      ("t1", 2L, 2L, 1L, false, false),
      ("t2", 1L, 6L, 1L, true, false)))
    intercept[IllegalArgumentException] {
      Scrub.kAnonymity(df, Seq.empty, "user_id")
    }
  }
}
