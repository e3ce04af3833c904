package graft.tools

import graft.operators.{ProgressMeter, XmlPipe}

/** CLI surface — the reference's launcher contract (F14,
  * Query.java:41-125) reshaped for the Spark engine. Where the
  * reference took `-host/-port/-cql/-keys`, this takes a fixture dir +
  * table + optional projection/filter (the CQL SELECT equivalents) and
  * streams one xmlpipe2 docset to stdout or a file.
  *
  * Usage:
  *   Export <dir> <table> <keys:comma-separated> [out=-] [cols=*] [where=]
  *
  * `SPARK_GRAFT_STRICT=1` (env, like the `-debug` twin
  * `SPARK_GRAFT_DEBUG`) switches ids and renderings to bug-for-bug
  * reference parity ([[graft.operators.XmlPipe.formatDocs]]) for
  * migrations pinned to a reference-built index.
  *
  * Divergence from the reference, by design: errors exit nonzero
  * (the reference printed a stack trace and exited 0 with truncated
  * XML — Query.java:171-176, a defect we do not reproduce).
  */
object Export {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: Export <dir> <table> <keys,comma,separated> " +
          "[out|-|sharded:<dir>] [cols,comma] [where-expr]")
      sys.exit(2)
    }
    val Array(dir, table, keysArg) = args.take(3)
    val out = args.lift(3).getOrElse("-")
    val cols = args.lift(4).getOrElse("*")
    val where = args.lift(5).getOrElse("")
    // Reference key parsing: comma-split, empties filtered (Query.java:112-119).
    val keys = keysArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (keys.isEmpty) {
      System.err.println("error: -keys requires at least one non-empty column name")
      sys.exit(2)
    }

    val spark = graft.Sessions.builder("graft-export",
        sys.env.getOrElse("SPARK_MASTER", "local[*]"),
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_DEBUG=1 — the reference's -debug progress metering
    // (F12): periodic "Read records: N processing time: M msec" lines.
    val meter =
      if (sys.env.get("SPARK_GRAFT_DEBUG").exists(_.nonEmpty))
        Some(ProgressMeter.attach(spark, every = 1000))
      else None

    try {
      val cfg = graft.operators.ExportConfig(
        source = graft.operators.ParquetSource(dir, table),
        keys = keys,
        columns =
          if (cols == "*") Nil
          else {
            val cs = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            if (cs.isEmpty) {
              // blank projection must fail loudly, not mean "all columns"
              System.err.println(
                "error: cols must be '*' or a non-empty comma-separated list")
              sys.exit(2)
            }
            cs
          },
        where = where,
        strictParity = sys.env.get("SPARK_GRAFT_STRICT").exists(_.nonEmpty))
      val docs =
        try graft.operators.Pipeline.docs(spark, cfg)
        catch {
          case e: IllegalArgumentException =>
            System.err.println(s"error: ${e.getMessage}")
            sys.exit(2)
        }
      val t0 = System.nanoTime()
      // "sharded:<dir>" → one well-formed docset per partition (the
      // distributed-indexing path); otherwise one ordered stream.
      if (out.startsWith("sharded:")) {
        XmlPipe.writeShardedDocsets(docs, out.stripPrefix("sharded:"))
      } else if (out == "-") XmlPipe.writeDocset(docs, System.out)
      else {
        val fos = new java.io.FileOutputStream(out)
        try XmlPipe.writeDocset(docs, fos) finally fos.close()
      }
      meter.foreach { m =>
        // listener bus is async: wait for the row count to settle
        var prev = -1L
        val deadline = System.currentTimeMillis() + 5000
        while (m.totalRows != prev && System.currentTimeMillis() < deadline) {
          prev = m.totalRows
          Thread.sleep(100)
        }
        System.err.println(
          s"Query export successful. Rows read: ${m.totalRows}, total " +
            s"processing time: ${(System.nanoTime() - t0) / 1000000L} msec")
      }
    } finally spark.stop()
  }
}
