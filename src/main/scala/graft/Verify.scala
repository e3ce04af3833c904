package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    Scratch.redirectTmpdir() // ephemeral IO on tmpfs (see Scratch doc)
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration only — the driver always passes two args = full run)
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder("graft-verify", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // same leak hygiene as Bench: localCheckpoint blocks a query
      // leaves behind would otherwise pile up across the 200+-query run
      // (cross-query memoized frames exempt)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      SparkEntry.sweepLeakedBlocks(spark, persistedBefore)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the recall-gate oracles read the sketch outputs the queries above
    // materialized for THIS sfDir — resolve the path placeholder now so
    // the dumped SQL is directly runnable by the driver's DuckDB
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace(
        SparkEntry.RecallDirToken, SparkEntry.recallDumpDir(sfDir)))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // teardown hygiene: release the cross-query memoized frames'
    // pinned checkpoint blocks (see Bench — same rationale; the
    // logger is quieted first because each unpersisted
    // localCheckpoint RDD WARNs, and that flood drowned the r14
    // bench artifact's tail capture)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.evictMemos(spark)
    spark.stop()
  }
}
