package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("zorder2 interleaves bits exactly (hand-computed Morton codes)") {
    import spark.implicits._
    val got = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L),
      (65536L, 0L)) // 65536 masks to 0: only 16 bits participate
      .toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b")))
      .as[Long].collect().toSeq
    // z(3,5): a bits on even positions (0,2), b bits on odd shifted
    // (1,5) -> 0b100111 = 39
    assert(got == Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL, 0L))
  }

  test("date-partitioned lake layout: a time filter prunes whole " +
      "partitions at listing time and loses no rows") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toFile
    try {
      val out = new java.io.File(tmp, "by_day").toString
      Layout.writeDatePartitioned(ev, "ts", out)
      // one directory per day on disk
      val dayDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      assert(dayDirs.length > 1, "expected multiple day partitions")
      val read = spark.read.parquet(out)
        .filter(col("event_date") === lit("2024-01-10").cast("date"))
      val p = read.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters"), p)
      assert(p.contains("event_date"), p)
      val expect = ev
        .filter(to_date(col("ts")) === lit("2024-01-10").cast("date"))
        .count()
      assert(read.count() == expect && expect > 0)
    } finally SparkTestSession.deleteRecursively(tmp)
  }

  test("zorder2 reference check against bit-by-bit interleave") {
    import spark.implicits._
    def morton(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == pairs.map { case (a, b) => morton(a, b) })
  }

  test("clusterByZ yields sorted, non-overlapping z-ranges per file") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(150).toLong,
      rnd.nextInt(500).toLong))
    val df = rows.toDF("u", "h")
    val out = Layout.clusterByZ(df, col("u"), col("h"), numFiles = 4)
      .withColumn("z", Layout.zorder2(col("u"), col("h")))
      .withColumn("pid", spark_partition_id())
      .select("pid", "z").as[(Int, Long)].collect().toSeq
    val byPid = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byPid.size == 4)
    // within each output file the z-values are sorted (tight row-group
    // stats), and the files cover disjoint z-intervals (each file is a
    // compact rectangle set in (u, h) space)
    for ((_, zs) <- byPid) assert(zs == zs.sorted)
    val ranges = byPid.toSeq.sortBy(_._2.head).map(p =>
      (p._2.min, p._2.max))
    for (Seq((_, hi), (lo2, _)) <- ranges.sliding(2))
      assert(hi <= lo2, "z-ranges overlap across files")
  }
}
