package graft.tools

import graft.{Scratch, Sessions, SparkEntry}

/** Post-execution plan dumper (r20): the bench's per-query dumps are
  * the STATIC `explain("formatted")` (AdaptiveSparkPlan
  * isFinalPlan=false), which textually inlines every shared subtree —
  * a query whose repeated exchange subtrees are deduped at runtime by
  * ReusedExchange still shows N copies there, so scan/Generate counts
  * in those files systematically overstate executed work (the r19
  * pin-experiment lesson). This tool executes the registered query's
  * OWN QueryExecution (collect() runs the Dataset's queryExecution,
  * unlike count()/noop which plan a derived one) and writes the FINAL
  * adaptive plan, where AQE's join rewrites, coalesced reads and
  * ReusedExchange/ReusedSubquery nodes are visible.
  *
  * Usage: runMain graft.tools.PlanFinal <query>[,query...]
  * (SPARK_GRAFT_SF_DIR selects the fixture; output under
  * target/final-plans/<name>.txt plus a one-line reuse census on
  * stderr.)
  */
object PlanFinal {
  def main(args: Array[String]): Unit = {
    Scratch.redirectTmpdir()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(
      sys.error("usage: PlanFinal <query>[,query...]"))
    val spark = Sessions.builder("graft-plan-final", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("target/final-plans")
    outDir.mkdirs()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect(): Unit // materialize THIS QueryExecution
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        new java.io.File(outDir, s"$name.txt").toPath, text)
      def c(p: String) = p.r.findAllIn(text).length
      System.err.println(s"PLANFINAL $name scans=${c("Scan parquet")}" +
        s" generate=${c("(?m)^\\(\\d+\\) Generate")}" +
        s" exchange=${c("(?m)^\\(\\d+\\) Exchange")}" +
        s" reusedExchange=${c("ReusedExchange")}" +
        s" reusedSubquery=${c("ReusedSubquery")}" +
        s" finalPlan=${text.contains("isFinalPlan=true")}")
    }
    spark.stop()
  }
}
