package graft

import graft.operators.Urls
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u")
      .select(Urls.canonicalizeUrl(org.apache.spark.sql.functions.col("u")))
      .as[String].collect().head
  }

  private def domain(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u")
      .select(Urls.domainOf(org.apache.spark.sql.functions.col("u")))
      .as[String].collect().head
  }

  test("canonicalize lowers scheme/host, strips default ports, " +
      "collapses slashes, drops fragment") {
    assert(canon("HTTP://WWW.Example.COM:80//a//b/?q=1#frag")
      == "http://www.example.com/a/b?q=1")
    assert(canon("https://Host.com:443/x") == "https://host.com/x")
    // non-default ports survive
    assert(canon("http://h.com:8080/x") == "http://h.com:8080/x")
    // https:80 is NOT a default port — survives
    assert(canon("https://h.com:80/x") == "https://h.com:80/x")
    // trailing slash strips, including root
    assert(canon("http://h.com/") == "http://h.com")
    assert(canon("http://h.com/a/") == "http://h.com/a")
  }

  test("utm params strip in first, middle, last and only positions; " +
      "query order otherwise preserved") {
    assert(canon("http://h.com/p?utm_source=x&b=2&utm_medium=y&c=3")
      == "http://h.com/p?b=2&c=3")
    assert(canon("http://h.com/p?a=1&utm_campaign=z")
      == "http://h.com/p?a=1")
    assert(canon("http://h.com/p?utm_source=x") == "http://h.com/p")
    assert(canon("http://h.com/p?b=2&a=1") == "http://h.com/p?b=2&a=1")
  }

  test("domainOf lowers the host and drops userinfo and port") {
    assert(domain("HTTP://alice@WWW.Example.COM:8080/x")
      == "www.example.com")
    assert(domain("https://h.com/p?q=1") == "h.com")
    // no scheme: no domain (empty, never a throw)
    assert(domain("not a url") == "")
  }

  test("non-URL input passes through the chain without throwing") {
    assert(canon("not a url") == "not a url")
    assert(canon("") == "")
  }
}
