package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide, forked test run). */
object SparkTestSession {
  /** Recursive temp-dir cleanup shared by the I/O suites. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  lazy val spark: SparkSession = {
    val s = Sessions.builder("graft-test", "local[4]", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
