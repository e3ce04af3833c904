package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder("graft-bench", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/session warm-up outside the timed loop
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "nation").count()
    // per-query formatted plans, diffable round-over-round (written
    // after each timed run so plan capture never skews the timing)
    val plansDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "target/bench-plans"))
    plansDir.mkdirs()
    // operators that materialize through localCheckpoint record their
    // pre-checkpoint plans + stage breadcrumbs here; appended to the
    // query's dump below so checkpoints don't blind the plan audit
    PlanCapture.enabled = true
    val results = SparkEntry.queries.map { case (name, fn) =>
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
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","plans_dir":"${plansDir.getPath}"}""")
    spark.stop()
  }
}
