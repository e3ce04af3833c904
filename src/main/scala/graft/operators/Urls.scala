package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-hygiene stage before any per-URL
  * operation on a web corpus (keep-latest recrawl dedup, per-domain
  * mixture weighting, frontier dedup): syntactically different URLs
  * that name the same resource must collapse to one key, or every
  * downstream "per URL" statistic silently double-counts.
  *
  * Canonical form: lowercased scheme and host, default ports (http:80,
  * https:443) stripped, duplicate path slashes collapsed, trailing
  * path slashes stripped, `utm_*` tracking parameters removed, and the
  * fragment dropped (it never reaches the server). Query parameter
  * ORDER is deliberately preserved — reordering can change semantics
  * for some endpoints, and a sort is not expressible in the regex
  * subset the oracle shares.
  *
  * All rules live in the java.util.regex ∩ RE2 dialect (no lookbehind
  * — RE2 has none, which is why the double-slash collapse runs on the
  * structurally-split path, not on the whole URL where `://` would
  * need protecting). Pure narrow codegen'd projection; the DuckDB twin
  * mirrors the chain with `\1`-style references, and the oracle gate
  * catches any drift. Non-URL input (no `scheme://`) passes through
  * the tail rules unchanged — garbage in, garbage out, never a throw.
  */
object Urls {

  private val schemeHost = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // utm params: non-first (delimiter inside each match, so global
    // replace catches runs), then first-with-successor, then only-param
    val noUtm1 = regexp_replace(noFrag, "&utm_[A-Za-z0-9_]*=[^&]*", "")
    val noUtm2 = regexp_replace(noUtm1, "\\?utm_[A-Za-z0-9_]*=[^&]*&", "?")
    val noUtm = regexp_replace(noUtm2, "\\?utm_[A-Za-z0-9_]*=[^&]*$", "")
    val noP80 = regexp_replace(noUtm,
      "(?i)^(http://[^/:?#]+):80([/?]|$)", "$1$2")
    val noPort = regexp_replace(noP80,
      "(?i)^(https://[^/:?#]+):443([/?]|$)", "$1$2")
    val head = lower(regexp_extract(noPort, schemeHost, 0))
    val tail = regexp_replace(noPort, schemeHost, "")
    val path = regexp_extract(tail, "^[^?]*", 0)
    val query = regexp_extract(tail, "\\?.*$", 0)
    val cleanPath =
      regexp_replace(regexp_replace(path, "/{2,}", "/"), "/+$", "")
    concat(head, cleanPath, query)
  }

  /** Lowercased host of a URL (userinfo and port stripped) — the
    * grouping key for per-domain corpus stats and mixture weights.
    * Registrable-domain (eTLD+1) grouping needs the public-suffix
    * list and is out of scope; group by host or by a suffix join.
    */
  def domainOf(u: Column): Column =
    lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/:?#@]*@)?([^/:?#]*)", 1))
}
