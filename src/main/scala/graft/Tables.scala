package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  * In a deployment the Cassandra-connector source would sit behind the
  * same signature (SURVEY.md §2 F1/F2); parquet is the offline stand-in
  * mandated by the driver contract.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events fixture needs this session conf; set at construction
    * via [[Sessions.builder]] — mutating it here would leak a
    * session-global conf change as a read side effect (racy under
    * concurrent loads).
    */
  private[graft] def requireNanosConf(spark: SparkSession): Unit =
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      throw new IllegalStateException(
        "events.parquet is TIMESTAMP(NANOS): build the session with " +
          "graft.Sessions.builder (or set " +
          "spark.sql.legacy.parquet.nanosAsLong=true at construction)")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanosecond
      // timestamp type and rejects the file outright. Read nanos as
      // long and truncate to micros, which is exactly what DuckDB's
      // implicit ns→µs cast does (oracle parity).
      requireNanosConf(spark)
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType)) {
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      } else raw
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
