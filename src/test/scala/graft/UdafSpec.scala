package graft

import graft.functions.Udafs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed Aggregator (UDAF) surface: exact values, empty/zero-weight
  * totality, and the property the 100 TB shape depends on — the
  * aggregation runs as PARTIAL (map-side combine) + FINAL across
  * multiple partitions, merging 16-byte buffers through the exchange
  * rather than shuffling rows.
  */
class UdafSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(String, Long, Long)], parts: Int) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("k", "cents", "qty").repartition(parts)
  }

  test("weighted mean is exact and merge-order-independent") {
    Udafs.register(spark)
    // hand-checked: k=a → (100*2 + 250*6) / 8 / 100 = 2.125
    val rows = Seq(("a", 100L, 2L), ("a", 250L, 6L), ("b", 40L, 1L))
    for (parts <- Seq(1, 3, 7)) {
      val out = df(rows, parts).groupBy("k")
        .agg(expr("weighted_mean_cents(cents, qty)").as("m"))
        .orderBy("k").collect()
      assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
        Seq(("a", 2.125), ("b", 0.4)), s"parts=$parts")
    }
  }

  test("zero total weight yields null, not NaN") {
    Udafs.register(spark)
    val out = df(Seq(("z", 100L, 0L), ("z", 7L, 0L)), 2).groupBy("k")
      .agg(expr("weighted_mean_cents(cents, qty)").as("m")).collect()
    assert(out.length === 1 && out(0).isNullAt(1))
  }

  test("plan is two-phase: partial aggregate before the exchange") {
    Udafs.register(spark)
    val q = df((1 to 100).map(i => (s"k${i % 5}", i.toLong, 1L)), 8)
      .groupBy("k").agg(expr("weighted_mean_cents(cents, qty)").as("m"))
    val p = q.queryExecution.executedPlan.toString
    // typed Aggregators run through ObjectHashAggregate; partial mode
    // renders as partial_<name> upstream of the shuffle
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_weighted_mean_cents"), p)
    assert(q.rdd.getNumPartitions >= 1 && q.count() === 5)
  }

  test("Misra-Gries sketch: no-miss guarantee for keys above n/(k+1) " +
      "under any partitioning; summary never exceeds k counters") {
    import spark.implicits._
    val mg = new graft.functions.Udafs.HeavyHitterKeys(9) // ε = 10%
    val udafCol = org.apache.spark.sql.functions.udaf(mg)
    // 1000 rows: key 1 at 15% (must ALWAYS survive), keys 100.. spread
    val rows = Seq.fill(150)(1L) ++ (0 until 850).map(i => 100L + i % 170)
    for (parts <- Seq(1, 4, 13)) {
      val ks = spark.createDataset(rows).repartition(parts).toDF("k")
        .agg(udafCol(col("k")).as("ks")).collect()(0).getSeq[Long](0)
      assert(ks.contains(1L), s"parts=$parts lost the 15% key: $ks")
      assert(ks.size <= 9, s"parts=$parts summary overflow: ${ks.size}")
    }
  }

  test("sketch-then-recount heavy hitters equal the exact " +
      "GROUP BY / HAVING result regardless of partitioning") {
    import spark.implicits._
    graft.functions.Udafs.register(spark)
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events").select(col("user_id"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("tot"))))
      .filter(col("n") * 1000 >= col("tot") * 5)
      .select(col("user_id"), col("n"))
      .as[(Long, Long)].collect().toSet
    val sketch = SparkEntry.queries("profile_heavy_sketch")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(sketch == exact)
    assert(exact.nonEmpty, "fixture has no >=0.5% keys — test is vacuous")
  }

  test("idiv truncates toward zero for every sign combination and " +
      "throws on zero divisor — the one audited division contract") {
    import spark.implicits._
    // cross of negative/positive/boundary numerators and divisors:
    // the exact region where truncation (Spark div, JVM /) and floor
    // (what DuckDB `//` means on some version/type mixes) disagree
    val as = Seq(-7L, -6L, -1L, 0L, 1L, 6L, 7L, Long.MinValue + 1,
      Long.MaxValue)
    val bs = Seq(-3L, -1L, 1L, 2L, 3L)
    val rows = for (a <- as; b <- bs) yield (a, b)
    val got = spark.createDataset(rows).toDF("a", "b")
      .repartition(4)
      .select(col("a"), col("b"),
        graft.functions.idiv(col("a"), col("b")).as("q"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (a <- as; b <- bs)
      assert(got((a, b)) == a / b, s"idiv($a, $b)") // JVM / truncates
    // ANSI session: zero divisor must FAIL LOUD, never a silent NULL
    val ex = intercept[Exception] {
      spark.createDataset(Seq((1L, 0L))).toDF("a", "b")
        .select(graft.functions.idiv(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("divide"), ex.getMessage)
  }

  test("q_udaf query runs and is ordered") {
    val out = SparkEntry.queries("q_udaf")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSeq ===
      out.map(_.getString(0)).toSeq.sorted)
    // weighted means land in a sane price band and are non-null
    assert(out.forall(r => !r.isNullAt(1) && r.getDouble(1) > 0))
  }
}
