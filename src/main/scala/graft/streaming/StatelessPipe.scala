package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run a stateless batch transform as a Structured Streaming query —
  * the zero-cost half of the batch/stream duality: any narrow
  * projection/filter operator (scrub, quality filter, rendering,
  * fingerprinting) composes with `readStream` unchanged, no watermark
  * or state store involved, and produces row-identical output to its
  * batch run. This pipe proves that property per operator through the
  * same DuckDB oracle as the batch query.
  *
  * At scale this is the shape of a continuous ingest hygiene stage:
  * files land, each micro-batch maps through the operator, output
  * appends — state stays O(1) regardless of corpus size.
  */
object StatelessPipe {

  /** Stream `<table>.parquet` under `dir` through `transform`
    * (which must be stateless: no aggregation, no dedup, no
    * watermark) and return the fully-materialized append output.
    */
  def toCompletion(spark0: SparkSession, dir: String, table: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val spark = spark0.newSession()
    val schema = spark.read.parquet(s"$dir/$table.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
    val qname = s"graft_stateless_$table"
    val q = transform(src).writeStream
      .outputMode("append").format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qname)
  }
}
