package graft

import graft.operators.Events
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The run-sharing contract behind the streaming gate/variant groups
  * (EventsStream.fromBundle): the FIRST member invoked on a
  * (group, dir) is the sticky payer — it executes the bundled replay
  * and re-executes it on every one of its own invocations (honest
  * repeated measurement) — while every other member reads the sink
  * the payer's run wrote (no stream re-execution), with its own
  * state-metric sample landing in ITS drain window. Results must be
  * invocation-order-free and equal to the batch oracles.
  *
  * Runs on a private fixture dir so group keys cannot collide with
  * other suites sharing the JVM-wide session.
  */
class EventsStreamBundleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** 3 users x 2 sessions x 4 events (plus a type skew for the MG
    * sketch), written as events.parquet in a dedicated temp dir.
    */
  private lazy val dir: String = {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-05 08:00:00").getTime
    val rows = for {
      u <- 10L to 12L
      s <- 0 until 2 // two sessions, 3 h apart (> the 30 min gap)
      k <- 0 until 4 // 5-min strides inside a session
    } yield {
      val ts = new java.sql.Timestamp(
        base + u * 977L + s * 3L * 3600 * 1000L + k * 5L * 60 * 1000L)
      val id = u * 1000 + s * 10 + k
      val tpe = if (k == 0) "click" else if (k == 1) "purchase" else "view"
      (id, u, ts, tpe, k * 1.5)
    }
    val d = java.nio.file.Files
      .createTempDirectory("graft-bundle-fixture").toString
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def sessionSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("sessionizer trio: first member pays, siblings sink-read, " +
      "payer re-invocation re-runs, all equal the batch sessionizer") {
    EventsStream.drainStateMetrics()
    val c0 = EventsStream.bundleRunCount.get()
    // tws invoked FIRST on this dir -> tws is the payer
    val tws = EventsStream.sessionizeTwsToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0 + 1)
    val mTws = EventsStream.drainStateMetrics()
    assert(mTws.keySet == Set("graft_events_sessions_tws"),
      s"payer drain window carries only its own sample: $mTws")

    // siblings are sink reads: no new bundle execution, and each
    // consumer's state sample lands in its own drain window
    val fmgws = EventsStream.sessionizeToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0 + 1)
    assert(EventsStream.drainStateMetrics().keySet ==
      Set("graft_events_sessions"))
    val warm = EventsStream.sessionizeWarmStartToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0 + 1)
    assert(EventsStream.drainStateMetrics().keySet ==
      Set("graft_events_sessions_warm"))

    // all three twins equal the batch sessionizer
    val batch = sessionSet(Events.sessionize(
      Tables.load(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))))
    assert(batch.nonEmpty && batch.size == 6) // 3 users x 2 sessions
    assert(sessionSet(tws) == batch)
    assert(sessionSet(fmgws) == batch)
    assert(sessionSet(warm) == batch)

    // the payer re-runs the bundle on its own next invocation
    // (repeated measurement must measure, not serve a memo) ...
    EventsStream.sessionizeTwsToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0 + 2)
    // ... while consumers keep sink-reading
    EventsStream.sessionizeToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0 + 2)
  }

  test("heavy-hitters pair rides the shared ingest: both sketches " +
      "sink-read the run the session payer already paid for; values " +
      "match batch truth") {
    val truth = Tables.load(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum

    // the sessionizer test above already created this (group, dir)
    // bundle with tws as the sticky payer — the heavy-hitter members
    // of the SAME merged ingest group are pure consumers here
    val c0 = EventsStream.bundleRunCount.get()
    val exact = EventsStream.heavyHittersToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0,
      "a non-payer member must sink-read, not re-run the ingest")
    // capacity 8 > 3 distinct types: every counter exact
    val got = exact.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth)

    // the decrement-regime twin reads the same bundle's sink
    val est = EventsStream.heavyHittersToCompletion(spark, dir,
      capacity = 2)
    assert(EventsStream.bundleRunCount.get() == c0)
    val estMap = est.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Misra-Gries guarantee per type: 0 <= true - est <= N/(cap+1)
    truth.foreach { case (t, cnt) =>
      val e = estMap.getOrElse(t, 0L)
      assert(e <= cnt && cnt - e <= n / 3,
        s"type $t: est $e vs true $cnt (N=$n)")
    }
  }

  test("attribution matrix rides the shared ingest (sink reads) and " +
      "equals the batch interval join") {
    val c0 = EventsStream.bundleRunCount.get()
    val inner = EventsStream.attributionToCompletion(spark, dir)
    assert(EventsStream.bundleRunCount.get() == c0,
      "attribution members of the merged ingest group must sink-read")
    val got = inner.select(col("user_id"), col("click_id"),
        col("purchase_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val truth = clicks.join(buys,
        col("cu") === col("pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("cu"), col("click_id"), col("purchase_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(truth.nonEmpty && got == truth)
  }

  test("non-registered parameterizations run solo, not through a " +
      "shared bundle") {
    val c0 = EventsStream.bundleRunCount.get()
    val solo = EventsStream.heavyHittersToCompletion(spark, dir,
      capacity = 8, shards = 1)
    assert(solo.collect().nonEmpty)
    assert(EventsStream.bundleRunCount.get() == c0,
      "solo path must not touch the bundle machinery")
  }

  test("scale-probe partition override: setStreamShufflePartitions " +
      "retargets the stream session and is results-invariant") {
    val ss = EventsStream.streamSession(spark)
    val before = ss.conf.get("spark.sql.shuffle.partitions")
    val base = EventsStream.heavyHittersToCompletion(spark, dir,
      capacity = 8, shards = 1)
      .collect().map(_.toString).sorted.toSeq
    try {
      EventsStream.setStreamShufflePartitions(spark, 3)
      assert(ss.conf.get("spark.sql.shuffle.partitions") == "3",
        "override must land on the SHARED stream-session clone " +
          "(streaming queries read it at start)")
      val at3 = EventsStream.heavyHittersToCompletion(spark, dir,
        capacity = 8, shards = 1)
        .collect().map(_.toString).sorted.toSeq
      assert(at3 == base,
        "state partitioning is a physical knob — results must not " +
          "change under the probe's per-regime override")
    } finally EventsStream.setStreamShufflePartitions(spark,
      before.toInt)
    assert(ss.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
