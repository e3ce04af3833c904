package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, TimestampNTZType}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  * In a deployment the Cassandra-connector source would sit behind the
  * same signature (SURVEY.md §2 F1/F2); parquet is the offline stand-in
  * mandated by the driver contract.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Needed only for the TIMESTAMP(NANOS) fixture generation; set at
    * construction via [[Sessions.builder]] — mutating it here would
    * leak a session-global conf change as a read side effect (racy
    * under concurrent loads).
    */
  private[graft] def requireNanosConf(spark: SparkSession): Unit =
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      throw new IllegalStateException(
        "events.parquet may be TIMESTAMP(NANOS): build the session with " +
          "graft.Sessions.builder (or set " +
          "spark.sql.legacy.parquet.nanosAsLong=true at construction)")

  /** Timestamp normalization for fixture columns — the generator has
    * shipped two flavors across rounds, and the engine accepts both:
    *
    *  - TIMESTAMP(NANOS): Spark has no nanosecond timestamp; with the
    *    nanosAsLong conf the column surfaces as LongType, truncated
    *    here to micros (exactly DuckDB's implicit ns→µs cast).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, which event-time watermarks and unix_micros
    *    reject. The session time zone is pinned UTC (Sessions), so
    *    casting to TIMESTAMP preserves the wall clock AND gives epoch
    *    arithmetic identical to DuckDB's naive-timestamp epoch_us.
    */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val fixes: Seq[(String, Column)] = df.schema.fields.collect {
      case StructField(n, LongType, _, _) if n == "ts" =>
        n -> expr(s"timestamp_micros($n div 1000)")
      case StructField(n, TimestampNTZType, _, _) =>
        n -> col(n).cast("timestamp")
    }.toSeq
    fixes.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    try normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    catch {
      // a TIMESTAMP(NANOS) fixture read on a session built without the
      // nanosAsLong conf fails Spark's parquet schema conversion; keep
      // the curated guidance instead of the raw "Illegal Parquet type"
      case e: Exception
          if Option(e.getMessage).exists(_.contains("Illegal Parquet type")) =>
        requireNanosConf(spark) // throws the curated message if unset
        throw e                 // conf was set; some other illegal type
    }
}
