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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder("graft-bench", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/session warm-up outside the timed loop —
    // including one untimed canary probe, so the three timed probes
    // below differ only by machine load, not JIT state
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "nation").count()
    canaryProbe(spark, sfDir)
    // per-query formatted plans, diffable round-over-round (written
    // after each timed run so plan capture never skews the timing)
    val plansDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "target/bench-plans"))
    plansDir.mkdirs()
    // operators that materialize through localCheckpoint record their
    // pre-checkpoint plans + stage breadcrumbs here; appended to the
    // query's dump below so checkpoints don't blind the plan audit
    PlanCapture.enabled = true
    val queries = SparkEntry.queries.toSeq
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
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE (name + reason), not a silent
      // ~0s entry — the run continues so one bad query can't hide the
      // rest of the numbers
      val df = try {
        val d = fn(spark, sfDir); d.count(); Some(d)
      } catch {
        case e: Throwable =>
          System.err.println(
            s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      System.err.println(f"BENCH $name%-28s $elapsed%8.2f s")
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
      name -> elapsed
    }
    canaries += canaryProbe(spark, sfDir)
    System.err.println(f"BENCH canary[end] ${canaries.last}%8.2f s")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val canaryJson = canaries.mkString("[", ",", "]")
    // The driver captures only the TAIL of sbt stdout, so the line must be
    // self-sufficient read back-to-front: repeat the total, query count and
    // canary AFTER plans_dir so a front-truncated capture still yields the
    // headline numbers without reconstructing them from the per-query map.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","plans_dir":"${plansDir.getPath}","canary":$canaryJson,"n_queries":${results.size},"total_s":$total}""")
    spark.stop()
  }
}
