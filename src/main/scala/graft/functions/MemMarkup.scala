package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-int-matrix → `<mem>` markup — reference `parseString`
  * (Query.java:279-301). A string value that is bracketed like JSON
  * (`[...]` or `{...}`) is parsed as a list of integer arrays; each
  * inner array renders as `<mem>i1 i2 …</mem>`, concatenated. Parse
  * failure (including `{...}` objects, which can never be a
  * `List<Integer[]>`) falls back to the raw text. The CDATA-vs-text
  * decision this feeds lives in the XML formatter (XmlPipe).
  *
  * Pure-expression implementation: `from_json` into string cells +
  * higher-order validation. Cells must be integral (plain or quoted —
  * Jackson's `List<Integer[]>` mapper coerces `"1"` → 1 via
  * `Integer.parseInt`, so `[["1","2"]]` IS markup in the reference).
  * A null cell made the reference NPE inside its own try/catch →
  * fallback, which the strict null check reproduces. Remaining
  * documented divergence: Jackson's ACCEPT_FLOAT_AS_INT truncation
  * (`[[1.5]]` → `<mem>1</mem>`) is not replicated — float cells fall
  * back to raw text here.
  */
object MemMarkup {
  val MatrixSchema: ArrayType = ArrayType(ArrayType(StringType))
  private val IntPattern = "^[+-]?\\d+$"

  /** Reference trigger check (Query.java:281-282): first+last char are
    * `[`/`]` or `{`/`}`. (Empty/null strings are not triggers; the
    * reference crashed on those — defined behavior here.)
    */
  def looksBracketed(c: Column): Column =
    (startswith(c, lit("[")) && endswith(c, lit("]"))) ||
      (startswith(c, lit("{")) && endswith(c, lit("}")))

  /** Strictly-parsed int matrix (array<array<int>>), or null when the
    * value doesn't parse the way Jackson's `List<Integer[]>` mapper
    * would have. Cells are parsed as strings first so quoted ints
    * coerce like Jackson; the int cast also rejects overflow the way
    * `Integer.parseInt` throws.
    */
  def parsedMatrix(c: Column): Column = {
    val p = from_json(c, MatrixSchema)
    // try_cast: ANSI mode (Spark 4 default) makes a plain cast THROW
    // on overflow; null-on-failure is what maps to Jackson's
    // NumberFormatException → reference fallback
    val anyBad = exists(p, a => a.isNull || exists(a,
      x => x.isNull || !x.rlike(IntPattern) || x.try_cast("int").isNull))
    when(looksBracketed(c) && p.isNotNull && !anyBad,
      transform(p, a => transform(a, x => x.try_cast("int"))))
  }

  /** True when the value will be emitted as parsed `<mem>` markup. */
  def isMem(c: Column): Column = parsedMatrix(c).isNotNull

  /** The markup-or-original value: `<mem>…</mem>` concatenation when
    * the strict parse succeeds, the raw text otherwise (never null for
    * non-null input).
    */
  def memMarkup(c: Column): Column = {
    val rendered = array_join(
      transform(
        parsedMatrix(c),
        a => concat(lit("<mem>"), array_join(a.cast("array<string>"), " "), lit("</mem>"))),
      "")
    coalesce(rendered, c)
  }
}
