package graft

import graft.operators.QuantileNorm
import org.scalatest.funsuite.AnyFunSuite

class QuantileNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("a single group maps onto itself (identity through ties)") {
    import spark.implicits._
    val in = Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 20L))
      .toDF("id", "group", "v")
    val got = QuantileNorm.quantileNormalize(in)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "g", 10L, 10L), (2L, "g", 10L, 10L),
      (3L, "g", 20L, 20L)))
  }

  test("groups of different sizes map onto the pooled distribution " +
      "by exact ceiling ranks — hand-computed targets") {
    import spark.implicits._
    // pooled sorted: [1,2,3,4,100,200], N=6
    // gA (n=4): ranks → ⌈r·6/4⌉ = 2,3,5,6 → values 2,3,100,200
    // gB (n=2): ranks → ⌈r·6/2⌉ = 3,6   → values 3,200
    val in = (Seq(1L, 2L, 3L, 4L).zipWithIndex.map { case (v, i) =>
      (i.toLong, "a", v)
    } ++ Seq((10L, "b", 100L), (11L, "b", 200L))).toDF("id", "group", "v")
    val got = QuantileNorm.quantileNormalize(in)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((0L, "a", 1L, 2L), (1L, "a", 2L, 3L),
      (2L, "a", 3L, 100L), (3L, "a", 4L, 200L),
      (10L, "b", 100L, 3L), (11L, "b", 200L, 200L)))
  }
}
