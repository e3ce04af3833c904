package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-as-data lake pattern: the two-level HLL merge must equal the
  * single-pass sketch exactly (union max-merges registers), estimates
  * must sit inside the published error bounds of the exact counts,
  * results must be partitioning-independent, and the Theta overlap
  * must track the exact intersection.
  */
class ProfileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("two-level HLL (daily sketches unioned) equals the single-pass " +
      "sketch exactly, and estimates are within 5% of exact") {
    val ev = Tables.load(spark, dir, "events")
    val lake = Profile.hllSketchLake(ev).collect()
    assert(lake.nonEmpty)
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    lake.foreach { r =>
      val (k, est, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est === direct(k),
        s"two-level merge diverged from single-pass for $k")
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"$k: est $est vs exact $exact")
    }
  }

  test("sketch lake is partitioning-independent") {
    val ev = Tables.load(spark, dir, "events")
    val a = Profile.hllSketchLake(ev.repartition(1))
      .orderBy("event_type").collect().toSeq
    val b = Profile.hllSketchLake(ev.repartition(13))
      .orderBy("event_type").collect().toSeq
    assert(a === b)
  }

  test("theta overlap estimate tracks the exact audience intersection") {
    val ev = Tables.load(spark, dir, "events")
    val row = Profile.audienceOverlap(ev, "click", "purchase").head()
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(exact > 0, "fixture has no click∩purchase users")
    assert(math.abs(est - exact) / exact.toDouble < 0.05,
      s"est $est vs exact $exact")
  }

  test("KLL lake: merged two-level quantiles sit within the rank " +
      "error bound of the raw data, and the SQL surface resolves") {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val lake = Profile.kllQuantileLake(ev).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(lake.nonEmpty)
    for ((tpe, (p50, p95)) <- lake) {
      assert(p50 <= p95, s"$tpe: quantiles not monotone")
      val vals = ev.filter(col("event_type") === tpe)
        .select(col("value")).as[Double].collect()
      val r50 = vals.count(_ <= p50).toDouble / vals.length
      val r95 = vals.count(_ <= p95).toDouble / vals.length
      assert(math.abs(r50 - 0.50) <= 0.05, s"$tpe p50 rank $r50")
      assert(math.abs(r95 - 0.95) <= 0.05, s"$tpe p95 rank $r95")
    }
    // single-pass sketch (no daily split) obeys the same bound — the
    // lake's two-level merge loses only bounded accuracy, not
    // correctness
    val one = ev.agg(graft.functions.kll_quantile(
      graft.functions.kll_sketch_agg(col("value")), lit(0.5)))
      .as[Double].head()
    val all = ev.select(col("value")).as[Double].collect()
    assert(math.abs(all.count(_ <= one).toDouble / all.length - 0.5)
      <= 0.05)
    // config-injected SQL surface (GraftExtensions): text queries can
    // build and read sketches with no registration call
    ev.createOrReplaceTempView("ev_kll")
    val viaSql = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(value, 200), CAST(0.5 AS DOUBLE)) FROM ev_kll")
      .as[Double].head()
    assert(math.abs(all.count(_ <= viaSql).toDouble / all.length - 0.5)
      <= 0.05)
  }

  test("functionalDeps: holding and violated dependencies with exact " +
      "violation counts") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (3L, "b", 40L)).toDF("k", "g", "v")
    val got = Profile.functionalDeps(df,
        Seq(("k", "g"), ("g", "v"), ("k", "v")))
      .orderBy("fd").as[(String, Long, Long, Boolean)].collect().toSeq
    // k→g holds (each k one g); g→v: a has 2 v (1), b has 2 v (1) = 2;
    // k→v: k=3 has 2 distinct v → 1 violation
    assert(got == Seq(("g->v", 2L, 2L, false), ("k->g", 3L, 0L, true),
      ("k->v", 3L, 1L, false)))
  }

  test("keySkew: the heaviest key's exact basis-point share") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq.fill(3)("hot").zipWithIndex
      .map { case (k, i) => (i.toLong, k) }
      .++(Seq((3L, "cold"))).toDF("id", "key")
    val got = Profile.keySkew(df, Seq("key", "id"))
      .orderBy("column").as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    // key: hot 3/4 = 7500 bp; id: uniform 1/4 = 2500 bp
    assert(got == Seq(("id", 4L, 4L, 1L, 2500L),
      ("key", 4L, 2L, 3L, 7500L)))
  }
}
