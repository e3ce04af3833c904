package graft

object Bench {
  /** Fixed constant-work probe: a 50M-row range sum (CPU + scheduling)
    * plus a small fixed parquet scan (I/O path). The work never changes
    * across rounds, so its wall-clock is a pure measure of machine load
    * at the moment it runs. Timed at bench start/middle/end and emitted
    * in the JSON line — a run where the canary inflates alongside query
    * times is load-skewed, identifiable from the artifact alone (the
    * VM-load phantom faked a minhash "regression" for two rounds before
    * an A/B proved it; see Dedup.scala's postmortem).
    */
  private def canaryProbe(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    spark.range(50000000L).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "nation").selectExpr("count(*)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** In-place median; n is small (bench repeats), exactness over speed. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Repeated-measure mode: run each query up to REPEATS times and
    // report the MEDIAN (plus min) per query, so a transient load spike
    // on the host skews at most one sample instead of the published
    // number (the r4 and r7 driver artifacts were both load-skewed —
    // 17 carried queries at 6-17x — and cost a round of triage each).
    // Queries whose FIRST run exceeds REPEAT_CAP seconds are not
    // re-run — a cost bound so the heaviest harness (the outer-join
    // sentinel replay, ~8 s of micro-batch machinery floor) doesn't
    // triple; its load inflation is visible from the canary instead.
    // Everything under the cap gets median-of-k protection.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3")
      .toInt.max(1)
    val repeatCap = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT_CAP", "10.0")
      .toDouble
    val spark = Sessions.builder("graft-bench", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/session warm-up outside the timed loop —
    // including one untimed canary probe, so the three timed probes
    // below differ only by machine load, not JIT state
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "nation").count()
    canaryProbe(spark, sfDir)
    // streaming machinery warm-up: the FIRST streaming query in a JVM
    // pays ~3 s of one-time cost (state-store coordinator, RocksDB
    // JNI load, streaming codegen paths — measured cold 4.6 s vs warm
    // 1.3 s for the same twin). Absorb it here exactly like the batch
    // warm-up above, so whichever streaming twin runs first is timed
    // at steady state.
    locally {
      val ss = graft.streaming.EventsStream.streamSession(spark)
      implicit val sql: org.apache.spark.sql.SQLContext = ss.sqlContext
      import ss.implicits._
      val in =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = in.toDF().selectExpr("value % 2 AS k").groupBy("k").count()
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_bench_stream_warmup").start()
      try { in.addData(1L to 100L); q.processAllAvailable() } finally q.stop()
    }
    // per-query formatted plans, diffable round-over-round (written
    // after each timed run so plan capture never skews the timing)
    val plansDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "target/bench-plans"))
    plansDir.mkdirs()
    // operators that materialize through localCheckpoint record their
    // pre-checkpoint plans + stage breadcrumbs here; appended to the
    // query's dump below so checkpoints don't blind the plan audit
    PlanCapture.enabled = true
    // comma-separated name filter for local iteration (same shape as
    // Verify's 3rd arg); unset = full suite, which is what the driver runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val midpoint = queries.size / 2
    val canaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    canaries += canaryProbe(spark, sfDir)
    System.err.println(f"BENCH canary[start] ${canaries.last}%8.2f s")
    val results = queries.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx == midpoint) {
        canaries += canaryProbe(spark, sfDir)
        System.err.println(f"BENCH canary[middle] ${canaries.last}%8.2f s")
      }
      PlanCapture.drain() // discard anything left by a previous query
      // blocks persisted before this query (the cross-query memos and
      // anything the warm-up left) are protected; everything NEW that
      // is still persisted after the query finishes is a leak to this
      // 140-query marathon — localCheckpoint blocks normally freed by
      // GC+ContextCleaner pile up 3x faster under repeats and tax
      // later queries (measured as in-suite vs isolated inflation)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      // one timed run: build + count. A failed query must be VISIBLE
      // (name + reason), not a silent ~0s entry — the run continues so
      // one bad query can't hide the rest of the numbers.
      def timedRun(): (Double, Option[org.apache.spark.sql.DataFrame]) = {
        val t0 = System.nanoTime()
        val df = try {
          val d = fn(spark, sfDir); d.count(); Some(d)
        } catch {
          case e: Throwable =>
            System.err.println(
              s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            None
        }
        ((System.nanoTime() - t0) / 1e9, df)
      }
      val (first, df) = timedRun()
      // plan dump from the FIRST run, before any re-runs drain capture
      df.foreach { d =>
        try {
          val captured = PlanCapture.drain().map { case (label, text) =>
            s"\n==== captured: $label ====\n$text"
          }.mkString
          java.nio.file.Files.writeString(
            new java.io.File(plansDir, s"$name.txt").toPath,
            d.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")) + captured)
        } catch { case _: Throwable => () }
      }
      // only SUCCESSFUL runs contribute to the published numbers: a
      // re-run that fails (transient flake) would otherwise inject its
      // short abort time into the median/min and silently deflate the
      // artifact the repeats feature exists to protect
      val times =
        if (df.isEmpty || repeats == 1 || first >= repeatCap) Seq(first)
        else first +: (2 to repeats).flatMap { _ =>
          PlanCapture.drain()
          val (t, ok) = timedRun()
          if (ok.isDefined) Some(t) else None
        }
      val med = median(times)
      System.err.println(
        f"BENCH $name%-28s $med%8.2f s" + (if (times.size > 1)
          f"  (median of ${times.size}, min ${times.min}%.2f)" else ""))
      // sweep blocks this query leaked (untimed; memoized frames kept)
      SparkEntry.sweepLeakedBlocks(spark, persistedBefore)
      (name, med, times.min)
    }
    canaries += canaryProbe(spark, sfDir)
    System.err.println(f"BENCH canary[end] ${canaries.last}%8.2f s")
    // "queries" stays a flat name→seconds map (the median) so existing
    // consumers parse it unchanged; mins ride in a sibling map.
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, m) => s"\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val canaryJson = canaries.mkString("[", ",", "]")
    // The driver captures only the TAIL of sbt stdout, so the line must be
    // self-sufficient read back-to-front: repeat the total, query count and
    // canary AFTER plans_dir so a front-truncated capture still yields the
    // headline numbers without reconstructing them from the per-query map.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"repeats":$repeats,"repeat_cap_s":$repeatCap,"sf":"$sfDir","plans_dir":"${plansDir.getPath}","canary":$canaryJson,"n_queries":${results.size},"total_s":$total}""")
    spark.stop()
  }
}
