package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide, forked test run). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("graft-test", "local[4]", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
