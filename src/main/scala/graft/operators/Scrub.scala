package graft.operators

import graft.functions.sdbm_hash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / content scrubbing — the standard training-data hygiene stage
  * that redacts emails, phone numbers, IP addresses, and long numeric
  * identifiers before a corpus is used for training.
  *
  * Design: a scrub pass is a pure narrow projection — chained
  * `regexp_count` + `regexp_replace` expressions, one per rule, all
  * inside whole-stage codegen. At 100 TB this is a single map stage
  * over the corpus with no shuffle; the only data movement is whatever
  * the caller does with the result.
  *
  * Rules are applied SEQUENTIALLY in declaration order, and each
  * rule's hit count is measured on the text as left by the previous
  * rules. That makes the (counts, redacted) pair a deterministic
  * function of the rule list — a later rule can never double-count a
  * span an earlier rule already redacted (e.g. the digits of an IP
  * address don't also count as a numeric id once `<IP>` replaced them).
  *
  * Pattern dialect: every default pattern sticks to the regex subset
  * where java.util.regex (Spark) and RE2 (DuckDB/C++ engines) agree —
  * explicit character classes, bounded repetition, `\b` ASCII word
  * boundaries — so results are oracle-verifiable across engines.
  */
object Scrub {

  /** One redaction rule: a name (becomes the `n_<name>` count column),
    * a regex, and the replacement token.
    */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default rule set, ordered most-specific-first: emails before
    * numeric ids (an email's digits must not survive as an "id" hit),
    * IPs before numeric ids likewise, phones before ids (country/area
    * digits). Patterns are deliberately conservative: matching too
    * much (a version string as an IP) is noise; missing an exotic
    * format is recoverable by adding a rule.
    */
  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    Rule("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"),
    Rule("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    Rule("numid", "\\b[0-9]{9,}\\b", "<ID>"))

  /** Redact `textCol` under `rules`, keeping `keyCols` and returning
    * one `n_<rule>` hit count per rule plus the fully-redacted text.
    * Pure projection — no shuffle, no UDF.
    */
  def redact(docs: DataFrame, rules: Seq[Rule] = DefaultRules,
      textCol: String = "text",
      keyCols: Seq[String] = Seq("doc_id")): DataFrame = {
    val (redacted, counts) =
      rules.foldLeft((col(textCol), Vector.empty[Column])) {
        case ((txt, cs), r) =>
          val hits = regexp_count(txt, lit(r.pattern)).cast("long")
            .as(s"n_${r.name}")
          (regexp_replace(txt, r.pattern, r.replacement), cs :+ hits)
      }
    docs.select(keyCols.map(col) ++ counts :+ redacted.as("redacted"): _*)
  }

  /** Per-group scrub summary: docs scanned, docs with at least one
    * hit, and total hits per rule. One map-side-combinable groupBy —
    * the aggregate a pipeline dashboards after a scrub pass.
    */
  def summary(docs: DataFrame, rules: Seq[Rule] = DefaultRules,
      textCol: String = "text", groupCol: String = "source"): DataFrame = {
    val r = redact(docs, rules, textCol, keyCols = Seq(groupCol))
    val countCols = rules.map(ru => col(s"n_${ru.name}"))
    val anyHit = countCols.reduce(_ + _) > 0L
    val aggs = Seq(count(lit(1)).as("n_docs"),
      sum(when(anyHit, 1L).otherwise(0L)).as("n_docs_hit")) ++
      rules.map(ru => sum(col(s"n_${ru.name}")).as(s"sum_${ru.name}"))
    r.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** HTML/boilerplate strip — the standard pre-cleaning stage that
    * runs BEFORE quality scoring and dedup on web-crawled corpora
    * (tags inflate length stats, entities break shingles, script
    * bodies poison n-gram models). Ordered rule chain, each a
    * sequential `regexp_replace` like [[redact]]:
    *
    *   1. script/style elements WITH their content (code is not prose),
    *   2. comments,
    *   3. all remaining tags → a space (block boundaries must not glue
    *      adjacent words together),
    *   4. the common entities (`&amp;` LAST, so `&amp;lt;` decodes to
    *      the literal text `&lt;`, not to `<` — double-decoding is the
    *      classic sanitizer bug),
    *   5. whitespace collapse + trim.
    *
    * Patterns stay in the java.util.regex ∩ RE2 subset (inline `(?is)`
    * flags, non-greedy bounded scans, explicit whitespace class — no
    * `\s`, whose definition differs between the engines), so the DuckDB
    * oracle reproduces the chain verbatim. Pure narrow projection:
    * whole-stage codegen, no shuffle, no UDF.
    */
  val HtmlRules: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&amp;" -> "&",
    "[ \\t\\r\\n\\f]+" -> " ")

  /** The rule chain as a column expression, for composition inside
    * other projections.
    */
  def htmlCleanCol(text: Column): Column =
    trim(HtmlRules.foldLeft(text) { case (t, (pat, repl)) =>
      regexp_replace(t, pat, repl)
    })

  /** Replace `textCol` in place with its cleaned form (all other
    * columns pass through) — the shape the hygiene pipeline composes:
    * htmlClean → quality filter → dedup → decontaminate.
    */
  def htmlClean(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, htmlCleanCol(col(textCol)))

  /** Deterministic pseudonymization of identifier columns: each value
    * becomes `<prefix>_<sdbm(salt ++ value)>`. The same value under
    * the same salt always maps to the same token, so referential
    * integrity across tables survives (joins on the pseudonym still
    * work); rotating the salt re-keys the whole corpus. Pure narrow
    * projection — no lookup table to build, secure, or shuffle.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String = "",
      prefix: String = "id"): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, concat(lit(s"${prefix}_"),
        sdbm_hash(lit(0L), concat(lit(salt), col(c).cast("string")))))
    }

  /** Encoding-hygiene audit — the byte-sanity pass a crawl corpus
    * gets before tokenization (mojibake and stray control bytes
    * poison BPE merges and leak into generations): per doc, counts of
    * non-ASCII codepoints, forbidden control characters (C0 minus
    * tab/newline/CR), and the classic UTF-8-read-as-Latin-1 mojibake
    * marker 'Ã' (U+00C3 — the first byte every 2-byte UTF-8 sequence
    * becomes under that mis-decode), plus the pass flag. Pure narrow
    * regex/replace projections — identical spellings in the SQL twin,
    * no shuffle until the caller aggregates.
    */
  def encodingAudit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nonAscii =
      (length(t) - length(regexp_replace(t, "[^\\x00-\\x7F]", "")))
        .cast("long")
    val control = (length(t) - length(regexp_replace(t,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")
    val mojibake = (length(t) - length(replace(t, lit("Ã"))))
      .cast("long")
    docs.select(col("doc_id"), length(t).cast("long").as("n_chars"),
      nonAscii.as("n_non_ascii"), control.as("n_control"),
      mojibake.as("n_mojibake"))
      .withColumn("encoding_ok",
        col("n_control") === 0 && col("n_mojibake") === 0)
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007) — the release-hygiene check run before publishing a
    * dataset keyed on quasi-identifiers: every equivalence class over
    * the `quasiCols` combination must contain at least `k` rows
    * (re-identification resistance) AND at least `l` distinct values
    * of the sensitive column (attribute-disclosure resistance —
    * k-anonymity alone fails when a class is homogeneous in the
    * sensitive attribute). Emits one row per equivalence class with
    * both flags, so the caller both counts violations and sees WHICH
    * classes to generalize or suppress.
    *
    * Output: (quasiCols…, n_rows, n_sensitive, k_ok, l_ok).
    *
    * 100 TB shape: one hash aggregate keyed on the quasi-identifier
    * tuple with a distinct-count inside — the partial-aggregate path
    * Spark already map-side-combines; output is |classes| rows, which
    * a sane quasi-identifier choice keeps far below the input. No
    * joins, no windows.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long = 5L, l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_ok", col("n_rows") >= k)
      .withColumn("l_ok", col("n_sensitive") >= l)
  }
}
