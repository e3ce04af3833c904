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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanosecond
      // timestamp type and rejects the file outright. Read nanos as
      // long and truncate to micros, which is exactly what DuckDB's
      // implicit ns→µs cast does (oracle parity).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
