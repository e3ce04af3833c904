package graft

import graft.operators.XmlPipe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 connector for the docset format: short-name
  * registration, shard-per-partition parallelism, round-trip
  * fidelity, and column pruning pushed into the scan.
  */
class DocsetSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withDocset[A](rows: Seq[(Long, String, String)])(
      f: String => A): A = {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dsv2").toFile
    try {
      val out = new java.io.File(tmp, "ds").toString
      XmlPipe.writeShardedDocsets(
        XmlPipe.formatDocs(
          rows.toDF("doc_id", "text", "note").repartition(3),
          Seq("doc_id")), out)
      f(out)
    } finally SparkTestSession.deleteRecursively(tmp)
  }

  private val rows = Seq(
    (1L, "a<b&c>d", "plain"),
    (2L, "already &lt;escaped&gt;", "x&y"),
    (3L, "line one\nline two", ""),
    (4L, "tail", "end"))

  test("format(\"xmlpipe2\") round-trips the export by short name, " +
      "one partition per shard") {
    import spark.implicits._
    withDocset(rows) { out =>
      val df = spark.read.format("xmlpipe2")
        .option("fields", "text,note").load(out)
      assert(df.rdd.getNumPartitions == 3, "one reader per shard file")
      val got = df.orderBy("id")
        .as[(Long, String, String)].collect().toSeq
      assert(got == rows)
    }
  }

  test("column pruning pushes into the scan: select(one field) reads " +
      "a pruned schema") {
    withDocset(rows) { out =>
      val df = spark.read.format("xmlpipe2")
        .option("fields", "text,note").load(out)
        .select("text")
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.readSchema().fieldNames.toSeq
      }
      assert(scans == Seq(Seq("text")), scans)
      assert(df.count() == rows.size)
    }
  }

  test("COUNT(*) pushes into the scan — per-shard delimiter counts, " +
      "no fragment parse; a filtered count stays row-based and exact") {
    withDocset(rows) { out =>
      def ds = spark.read.format("xmlpipe2")
        .option("fields", "text,note").load(out)
      val counted = ds.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      val p = counted.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)]"),
        s"count not pushed:\n$p")
      assert(counted.collect().head.getLong(0) == rows.length)
      // with a predicate the builder keeps the filter residual, so
      // Spark must NOT push the aggregate — the count stays exact
      val filtered = ds.filter(org.apache.spark.sql.functions.col("id") > 2)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val fp = filtered.queryExecution.executedPlan.toString
      assert(!fp.contains("PushedAggregation"), fp)
      assert(filtered.collect().head.getLong(0) ==
        rows.count(_._1 > 2))
    }
  }

  test("id-filter pushdown: bounds skip fragments in the reader, the " +
      "scan advertises them, and semantics stay exact") {
    import spark.implicits._
    withDocset(rows) { out =>
      def ds = spark.read.format("xmlpipe2")
        .option("fields", "text,note").load(out)
      // every representable shape, each against a plain-filter twin
      val cases = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        _ === 2L, _ >= 3L, _ > 1L, _ <= 2L, _ < 3L, _.isin(1L, 4L, 99L))
      for (mk <- cases) {
        val got = ds.filter(mk(col("id"))).orderBy("id")
          .as[(Long, String, String)].collect().toSeq
        // twin: the same predicate over the in-memory rows, so the
        // expected set comes from Spark itself rather than a re-
        // implementation of each comparison
        val twin = rows.toDF("id", "text", "note")
          .filter(mk(col("id"))).orderBy("id")
          .as[(Long, String, String)].collect().toSeq
        assert(got == twin, s"pushdown changed semantics (got $got)")
      }
      // the executed scan advertises the bound (conjunction of range
      // + IN), and a non-id predicate is NOT claimed
      val q = ds.filter(col("id") >= 2L && col("id") < 4L &&
        col("note") =!= "x&y")
      val desc = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.mkString("\n")
      // the exact bound string also proves the note predicate was NOT
      // claimed (it would have to appear inside the brackets)
      assert(desc.contains("PushedIdBound: [id >= 2 AND id <= 3]"), desc)
      assert(q.orderBy("id").as[(Long, String, String)].collect().toSeq ==
        Seq((3L, "line one\nline two", "")))
    }
  }

  test("id-bound compiler: random filter conjunctions match naive " +
      "evaluation for every accepted filter") {
    import org.apache.spark.sql.sources._
    val rnd = new scala.util.Random(7)
    def randFilter(): Filter = rnd.nextInt(6) match {
      case 0 => EqualTo("id", rnd.nextInt(20).toLong)
      case 1 => GreaterThan("id", rnd.nextInt(20).toLong)
      case 2 => GreaterThanOrEqual("id", rnd.nextInt(20))
      case 3 => LessThan("id", rnd.nextInt(20).toLong)
      case 4 => LessThanOrEqual("id", rnd.nextInt(20))
      case 5 => In("id", Array.fill(1 + rnd.nextInt(4))(
        rnd.nextInt(20).toLong: Any))
    }
    def naive(f: Filter, id: Long): Boolean = f match {
      case EqualTo(_, v: Long) => id == v
      case GreaterThan(_, v: Long) => id > v
      case GreaterThanOrEqual(_, v: Int) => id >= v
      case LessThan(_, v: Long) => id < v
      case LessThanOrEqual(_, v: Int) => id <= v
      case In(_, vs) => vs.exists(_ == id)
      case _ => true
    }
    for (_ <- 1 to 300) {
      val fs = Array.fill(1 + rnd.nextInt(3))(randFilter())
      val (bound, accepted) = graft.sources.DocsetIdBound.compile(fs)
      assert(accepted.length == fs.length, "integral id filters all accept")
      for (id <- -1L to 21L) {
        val want = fs.forall(naive(_, id))
        assert(bound.matches(id) == want,
          s"id=$id bound=$bound filters=${fs.mkString(";")}")
      }
    }
  }

  test("write side: df.write.format(\"xmlpipe2\") lands well-formed " +
      "shards, overwrite truncates, and the read side round-trips it") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dsv2w").toFile
    try {
      val out = new java.io.File(tmp, "ds").toString
      val docs = XmlPipe.formatDocs(
        rows.toDF("doc_id", "text", "note").repartition(2), Seq("doc_id"))
      docs.write.format("xmlpipe2").mode("overwrite").save(out)
      // every shard individually well-formed
      val shards = new java.io.File(out).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
      assert(shards.length == 2)
      shards.foreach { f =>
        val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(text.startsWith(XmlPipe.Header) &&
          text.stripLineEnd.endsWith("</sphinx:docset>"), f.getName)
      }
      // second overwrite replaces, never appends
      docs.write.format("xmlpipe2").mode("overwrite").save(out)
      val back = spark.read.format("xmlpipe2")
        .option("fields", "text,note").load(out)
        .orderBy("id").as[(Long, String, String)].collect().toSeq
      assert(back == rows)
      // append would collide with the prior write's shard names and
      // silently replace data — rejected loudly instead
      val eAppend = intercept[Exception](
        docs.write.format("xmlpipe2").mode("append").save(out))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(eAppend).exists(_.contains("overwrite")),
        msgs(eAppend).mkString(" | "))
      // wrong input contract fails loudly at plan time
      val bad = rows.toDF("doc_id", "text", "note")
      val e = intercept[Exception](
        bad.write.format("xmlpipe2").mode("overwrite").save(out))
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("(id, doc)")),
        messages(e).mkString(" | "))
    } finally SparkTestSession.deleteRecursively(tmp)
  }

  test("streaming read: readStream.format(\"xmlpipe2\") ingests shards " +
      "incrementally and resumes after the name watermark on restart") {
    import spark.implicits._
    val ss = spark.newSession()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-dsv2-stream").toFile
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dsv2-ckpt").toFile
    def landShard(rows: Seq[(Long, String)], name: String): Unit = {
      val docs = XmlPipe.formatDocs(rows.toDF("doc_id", "text"),
        Seq("doc_id"))
      val tmp = new java.io.File(srcDir, s".stage_$name")
      val fos = new java.io.FileOutputStream(tmp)
      try XmlPipe.writeDocset(docs, fos) finally fos.close()
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(srcDir, name).toPath)
    }
    val sink = java.nio.file.Files
      .createTempDirectory("graft-dsv2-sink").toFile
    // parquet sink: the memory sink cannot recover from a checkpoint,
    // and the restart leg is the point of this test
    def start() = ss.readStream.format("xmlpipe2")
      .option("fields", "text").load(srcDir.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", sink.toString).start()
    def sunk(): Seq[Long] = spark.read.parquet(sink.toString)
      .select("id").as[Long].collect().toSeq.sorted
    try {
      landShard(Seq((1L, "one"), (2L, "two")), "s0001.xml")
      val q = start()
      try {
        q.processAllAvailable()
        assert(sunk() == Seq(1L, 2L))
        landShard(Seq((3L, "three")), "s0002.xml")
        q.processAllAvailable()
        assert(sunk() == Seq(1L, 2L, 3L))
      } finally q.stop()
      // restart: the checkpointed name watermark skips s0001/s0002 —
      // exactly-once across the restart, delta only
      landShard(Seq((4L, "four")), "s0003.xml")
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(sunk() == Seq(1L, 2L, 3L, 4L), s"got ${sunk()}")
      } finally q2.stop()
    } finally {
      SparkTestSession.deleteRecursively(srcDir)
      SparkTestSession.deleteRecursively(ckpt)
      SparkTestSession.deleteRecursively(sink)
    }
  }

  test("a malformed fragment id reads as a data error naming the " +
      "shard file — not a bare NumberFormatException from a nameless " +
      "task") {
    withDocset(rows) { out =>
      // corrupt one shard in place: a foreign/corrupt docset whose id
      // attribute is non-numeric
      val shard = new java.io.File(out).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .sortBy(_.getName)
        .find(f => new String(java.nio.file.Files.readAllBytes(f.toPath))
          .contains("sphinx:document id=\"")).get
      val txt = new String(java.nio.file.Files.readAllBytes(shard.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val bad = txt.replaceFirst("sphinx:document id=\"\\d+\"",
        "sphinx:document id=\"oops\"")
      assert(bad != txt, "corruption did not apply")
      java.nio.file.Files.write(shard.toPath,
        bad.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val e = intercept[Exception] {
        spark.read.format("xmlpipe2")
          .option("fields", "text,note").load(out).collect()
      }
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("\n")
      assert(chain.contains("malformed sphinx:document id"), chain)
      assert(chain.contains(shard.getName), "error does not name the file")
    }
  }

  test("missing fields read as empty strings; load without a path " +
      "fails loudly") {
    withDocset(rows) { out =>
      import spark.implicits._
      val got = spark.read.format("xmlpipe2")
        .option("fields", "text,nonexistent").load(out)
        .orderBy("id").as[(Long, String, String)].collect().toSeq
      assert(got.map(_._3).forall(_ == ""))
      assert(got.map(_._2) == rows.map(_._2))
    }
    // the missing-path error surfaces when the scan is built (action
    // time), not at load() — DSv2 resolves lazily
    val pathless = spark.read.format("xmlpipe2").option("fields", "x").load()
    val e = intercept[Exception](pathless.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("requires a path")),
      messages(e).mkString(" | "))
  }

  test("streaming recovery: a crash between sink commit and checkpoint " +
      "commit-log write (commits/N deleted) replays the batch " +
      "exactly-once through the file sink's batchId dedup") {
    import spark.implicits._
    val ss = spark.newSession()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-dsv2-crash-src").toFile
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dsv2-crash-ckpt").toFile
    val sink = java.nio.file.Files
      .createTempDirectory("graft-dsv2-crash-sink").toFile
    def landShard(rows: Seq[(Long, String)], name: String): Unit = {
      val docs = XmlPipe.formatDocs(rows.toDF("doc_id", "text"),
        Seq("doc_id"))
      val tmp = new java.io.File(srcDir, s".stage_$name")
      val fos = new java.io.FileOutputStream(tmp)
      try XmlPipe.writeDocset(docs, fos) finally fos.close()
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(srcDir, name).toPath)
    }
    def start() = ss.readStream.format("xmlpipe2")
      .option("fields", "text").load(srcDir.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", sink.toString).start()
    def sunk(): Seq[Long] = spark.read.parquet(sink.toString)
      .select("id").as[Long].collect().toSeq.sorted
    try {
      landShard(Seq((1L, "one")), "s0001.xml")
      val q = start()
      try {
        q.processAllAvailable()
        landShard(Seq((2L, "two")), "s0002.xml")
        q.processAllAvailable()
        assert(sunk() == Seq(1L, 2L))
      } finally q.stop()
      // simulate the mid-batch crash: the sink committed the latest
      // batch (rows are in the parquet + its _spark_metadata log) but
      // the checkpoint's commit record never landed — delete it
      val commits = new java.io.File(ckpt, "commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      assert(commits.nonEmpty)
      // a real crash leaves neither the commit record nor its local-fs
      // checksum twin; deleting only the record would leave a stale
      // .N.crc that fails the atomic rename on replay
      assert(commits.last.delete())
      new java.io.File(commits.last.getParentFile,
        "." + commits.last.getName + ".crc").delete()
      // restart: Spark replays the uncommitted batch from offsets/N;
      // planInputPartitions re-reads the same (lo, hi] name range and
      // the parquet sink recognizes the replayed batchId — no
      // duplicates, and the stream then advances normally
      landShard(Seq((3L, "three")), "s0003.xml")
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(sunk() == Seq(1L, 2L, 3L), s"got ${sunk()}")
      } finally q2.stop()
    } finally {
      SparkTestSession.deleteRecursively(srcDir)
      SparkTestSession.deleteRecursively(ckpt)
      SparkTestSession.deleteRecursively(sink)
    }
  }

  test("streaming recovery: retiring a COMMITTED shard is safe; " +
      "deleting the shard that defined an UNCOMMITTED offset fails " +
      "loud at replay instead of silently shrinking the batch") {
    import spark.implicits._
    val ss = spark.newSession()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-dsv2-del-src").toFile
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dsv2-del-ckpt").toFile
    val sink = java.nio.file.Files
      .createTempDirectory("graft-dsv2-del-sink").toFile
    def landShard(rows: Seq[(Long, String)], name: String): Unit = {
      val docs = XmlPipe.formatDocs(rows.toDF("doc_id", "text"),
        Seq("doc_id"))
      val tmp = new java.io.File(srcDir, s".stage_$name")
      val fos = new java.io.FileOutputStream(tmp)
      try XmlPipe.writeDocset(docs, fos) finally fos.close()
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(srcDir, name).toPath)
    }
    def start() = ss.readStream.format("xmlpipe2")
      .option("fields", "text").load(srcDir.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", sink.toString).start()
    def sunk(): Seq[Long] = spark.read.parquet(sink.toString)
      .select("id").as[Long].collect().toSeq.sorted
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    try {
      landShard(Seq((1L, "one")), "s0001.xml")
      val q = start()
      try { q.processAllAvailable(); assert(sunk() == Seq(1L)) }
      finally q.stop()
      // retention on a committed shard: its name is at/below the
      // checkpointed watermark, so restarts never re-plan it
      assert(new java.io.File(srcDir, "s0001.xml").delete())
      landShard(Seq((2L, "two")), "s0002.xml")
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(sunk() == Seq(1L, 2L), s"got ${sunk()}")
      } finally q2.stop()
      // now the failure edge: s0003 lands, its batch's offset is
      // written but the commit is not (mid-batch crash), and the
      // shard is deleted before the restart — replay MUST fail loud
      landShard(Seq((3L, "three")), "s0003.xml")
      val q3 = start()
      try { q3.processAllAvailable() } finally q3.stop()
      val commits = new java.io.File(ckpt, "commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      assert(commits.last.delete())
      new java.io.File(commits.last.getParentFile,
        "." + commits.last.getName + ".crc").delete()
      assert(new java.io.File(srcDir, "s0003.xml").delete())
      val q4 = start()
      val e = intercept[Exception] {
        q4.processAllAvailable()
        q4.stop()
      }
      try q4.stop() catch { case _: Throwable => () }
      assert(messages(e).exists(_.contains("deleted before its " +
        "micro-batch committed")), messages(e).mkString(" | "))
    } finally {
      SparkTestSession.deleteRecursively(srcDir)
      SparkTestSession.deleteRecursively(ckpt)
      SparkTestSession.deleteRecursively(sink)
    }
  }
}
