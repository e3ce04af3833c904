package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) export — the natural sink for an
  * LLM training-data pipeline downstream of the dedup/quality
  * operators (the reference's only sink is Sphinx xmlpipe2,
  * SURVEY.md §2b "sinks"; this is extended surface, same role as
  * [[XmlPipe.writeShardedDocsets]] but for corpus-training consumers).
  *
  * Lines are built by deterministic string concatenation, NOT
  * `to_json`: byte-stable across engines and Spark versions
  * (oracle-checkable), explicit field order, and the exact JSON escape
  * set (backslash, quote, \n, \r, \t, remaining control chars as
  * \u00XX). The whole projection is codegen'd column math — the write
  * is an embarrassingly parallel `.text` of one JSONL shard per
  * partition, nothing funnels through the driver.
  */
object JsonlExport {

  /** JSON string-body escaping as a column expression (backslash
    * first, then quote, then control characters).
    */
  def escapeJson(c: Column): Column = {
    var e = replace(c, lit("\\"), lit("\\\\"))
    e = replace(e, lit("\""), lit("\\\""))
    e = replace(e, lit("\n"), lit("\\n"))
    e = replace(e, lit("\r"), lit("\\r"))
    e = replace(e, lit("\t"), lit("\\t"))
    for (i <- 0 until 32 if i != '\n' && i != '\r' && i != '\t') {
      e = replace(e, lit(i.toChar.toString), lit(f"\\u$i%04x"))
    }
    e
  }

  /** One JSON object per row over the named columns, in the given
    * order. Strings escape per [[escapeJson]]; integers/booleans emit
    * bare; floats/decimals emit via double (shortest-repr, both
    * engines agree); timestamps emit quoted canonical UTC at SECOND
    * precision (sub-second fractions are truncated — deliberate, so
    * the line is byte-stable across micro/nano source precisions;
    * carry an explicit `unix_micros` column if fractions matter);
    * dates emit quoted `yyyy-MM-dd`; null emits JSON null.
    * Arrays/structs/maps go through `to_json` (documented:
    * engine-specific spacing — exclude them from oracle-compared
    * exports). Any other scalar (binary, interval...) fails fast at
    * plan time: `to_json` would throw an unhelpful AnalysisException
    * deep inside the sink otherwise.
    */
  def jsonLine(schema: StructType, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "at least one column required")
    val fields = cols.map { name =>
      val v: Column = schema(name).dataType match {
        case StringType =>
          concat(lit("\""), escapeJson(col(name)), lit("\""))
        case ByteType | ShortType | IntegerType | LongType | BooleanType =>
          col(name).cast(StringType)
        case FloatType | DoubleType | _: DecimalType =>
          col(name).cast(DoubleType).cast(StringType)
        case TimestampType | TimestampNTZType =>
          concat(lit("\""), date_format(col(name), "yyyy-MM-dd HH:mm:ss"),
            lit("\""))
        case DateType =>
          concat(lit("\""), date_format(col(name), "yyyy-MM-dd"), lit("\""))
        case _: ArrayType | _: StructType | _: MapType => to_json(col(name))
        case other => throw new IllegalArgumentException(
          s"jsonLine: column '$name' has unsupported scalar type " +
            s"${other.simpleString}; cast it to a string/numeric/" +
            "timestamp column upstream")
      }
      concat(lit("\"" + name + "\":"),
        when(col(name).isNull, lit("null")).otherwise(v))
    }
    concat(lit("{"), concat_ws(",", fields: _*), lit("}"))
  }

  def jsonLine(df: DataFrame, cols: Seq[String]): Column =
    jsonLine(df.schema, cols)

  /** Write one JSONL shard per partition (distributed-sink path; use
    * `df.repartition(n)` upstream to control shard count/size).
    */
  def writeShards(df: DataFrame, cols: Seq[String], dir: String): Unit =
    df.select(jsonLine(df, cols).as("value"))
      .write.mode("overwrite").text(dir)
}
