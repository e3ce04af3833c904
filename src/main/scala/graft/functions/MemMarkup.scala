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
  * Pure-expression implementation: `from_json` + higher-order
  * functions; strictness (any null row/cell ⇒ parse failure, like
  * Jackson's typed mapper) via `exists`.
  */
object MemMarkup {
  val MatrixSchema: ArrayType = ArrayType(ArrayType(IntegerType))

  /** Reference trigger check (Query.java:281-282): first+last char are
    * `[`/`]` or `{`/`}`. (Empty/null strings are not triggers; the
    * reference crashed on those — defined behavior here.)
    */
  def looksBracketed(c: Column): Column =
    (startswith(c, lit("[")) && endswith(c, lit("]"))) ||
      (startswith(c, lit("{")) && endswith(c, lit("}")))

  /** Strictly-parsed matrix, or null when the value doesn't parse the
    * way Jackson's `List<Integer[]>` mapper would have.
    */
  def parsedMatrix(c: Column): Column = {
    val p = from_json(c, MatrixSchema)
    val anyBad = exists(p, a => a.isNull || exists(a, x => x.isNull))
    when(looksBracketed(c) && p.isNotNull && !anyBad, p)
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
