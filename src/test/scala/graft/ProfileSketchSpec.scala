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
}
