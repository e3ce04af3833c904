package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of graft.operators.Events: the same
  * tumbling-window aggregation driven through readStream → watermark →
  * windowed agg → sink. Batch and stream share one query shape, so the
  * oracle that checks the batch result checks the streaming result too.
  *
  * (The reference is a batch one-shot exporter — SURVEY.md §2b marks
  * streaming as extended surface.)
  */
object EventsStream {

  /** Streaming source over the events parquet (nanos ts handled the
    * same way as Tables.load).
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong must be set at session construction (Sessions.builder);
    // fail loudly before the schema probe gives a cryptic parquet error.
    graft.Tables.requireNanosConf(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-stream sources take a directory; select just events.parquet
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (raw.schema.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType)) {
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else raw
  }

  /** Run the tumbling aggregation as a streaming query to completion
    * (memory sink, complete mode) and return the final result — used
    * by the correctness gate so streaming goes through the same DuckDB
    * oracle as the batch twin.
    */
  def tumblingToCompletion(spark: SparkSession, dir: String,
      width: String = "1 hour"): DataFrame = {
    val agg = source(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)"))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val qname = "graft_events_stream"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qname)
  }

  /** Streaming dedup within the watermark horizon (the streaming twin
    * of Dedup.exact). `dropDuplicatesWithinWatermark` keeps bounded
    * state — plain `dropDuplicates("event_id")` would never evict it
    * (the watermark only cleans dedup state when the event-time column
    * is part of the key) — at the usual streaming trade-off: a
    * duplicate arriving after the watermark passes its first
    * occurrence counts again. Output counts unique events per type,
    * deterministic regardless of which duplicate survives.
    */
  def dedupToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val agg = source(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
    val qname = "graft_events_dedup"
    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qname)
  }

  /** Streaming sessionization via flatMapGroupsWithState. Events are
    * grouped per user; sessions split on the inactivity gap in exact
    * integer microseconds, so the result is value-identical to the
    * batch version (Events.sessionize) and shares its oracle.
    *
    * Honest scope note: the group state is NOT carried across
    * micro-batches here — correct because the file source delivers the
    * fixture in a single batch. A production continuous stream would
    * keep each user's open session in GroupState with an event-time
    * timeout and emit it on close; same API, one more state hop.
    */
  def sessionizeToCompletion(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val src = source(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, Long, Long)]
    val sessions = src.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)], _: GroupState[Long]) =>
          val evs = it.toVector.sortBy(e => (e._2, e._3))
          if (evs.isEmpty) Iterator.empty
          else {
            val out = Vector.newBuilder[(Long, Long, Long, Long)]
            var start = evs.head._2
            var last = evs.head._2
            var n = 0L
            for (e <- evs) {
              if (e._2 - last > gapUs) {
                out += ((uid, start, last, n))
                start = e._2
                n = 0L
              }
              last = e._2
              n += 1
            }
            out += ((uid, start, last, n))
            out.result().iterator
          }
      }
    val qname = "graft_events_sessions"
    val q = sessions
      .toDF("user_id", "start_us", "end_us", "n_events")
      .writeStream.outputMode("append").format("memory").queryName(qname)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qname).select(col("user_id"),
      timestamp_micros(col("start_us")).as("session_start"),
      timestamp_micros(col("end_us")).as("session_end"), col("n_events"))
  }
}
