package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

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

  /** Memory-sink names are unique per invocation: the pipes run on the
    * shared stream-session clone (see EventsStream.streamSession), so
    * two different stateless twins over the same table would otherwise
    * replace each other's sink view — and the returned DataFrame is a
    * lazy reference to that view.
    */
  private val qSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Stream `<table>.parquet` under `dir` through `transform`
    * (which must be stateless: no aggregation, no dedup, no
    * watermark) and return the fully-materialized append output.
    */
  def toCompletion(spark0: SparkSession, dir: String, table: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val spark = EventsStream.streamSession(spark0)
    val schema = spark.read.parquet(s"$dir/$table.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
    val qname = s"graft_stateless_${table}_${qSeq.incrementAndGet()}"
    val q = transform(src).writeStream
      .outputMode("append").format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qname)
  }

  /** As [[toCompletion]], additionally collecting aggregate metrics
    * through `Dataset.observe` — observability piggybacked on the
    * stream itself: the metrics ride the micro-batch (CollectMetrics
    * in-plan), costing no second pass and no extra action. This is
    * how a production hygiene stage reports kept/dropped/PII counts
    * per batch without re-reading what it just processed. Returns the
    * materialized output plus the metrics row of the last data
    * micro-batch (single-file sources run one data batch, so it
    * covers the whole input; a multi-batch deployment reads each
    * progress event's observedMetrics instead).
    */
  def toCompletionObserved(spark0: SparkSession, dir: String,
      table: String, transform: DataFrame => DataFrame,
      metrics: Seq[Column]): (DataFrame, Option[Row]) = {
    require(metrics.nonEmpty, "observe needs at least one metric column")
    val spark = EventsStream.streamSession(spark0)
    val schema = spark.read.parquet(s"$dir/$table.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
    val qname = s"graft_stateless_obs_${table}_${qSeq.incrementAndGet()}"
    val q = transform(src).observe("hygiene", metrics.head, metrics.tail: _*)
      .writeStream
      .outputMode("append").format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    val row = q.recentProgress.reverseIterator
      .flatMap(p => Option(p.observedMetrics.get("hygiene")))
      .take(1).toSeq.headOption
    (spark.table(qname), row)
  }
}
