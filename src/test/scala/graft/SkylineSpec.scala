package graft

import graft.operators.Skyline
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // minimize cost, maximize gain; expected frontier: 7 (cheapest),
  // 1 (gain 5 at cost 100), 4+5 (tied duplicates — both kept), 8
  private def pts = {
    import spark.implicits._
    Seq((1L, 100L, 5L), // skyline
      (2L, 100L, 3L),   // dominated: same cost, less gain than 1
      (3L, 150L, 5L),   // dominated: pricier, same gain as 1
      (4L, 200L, 8L),   // skyline
      (5L, 200L, 8L),   // exact duplicate of 4 — kept (no strict better)
      (6L, 300L, 8L),   // dominated by 4
      (7L, 50L, 1L),    // skyline (global cheapest)
      (8L, 400L, 9L)    // skyline (global max gain)
    ).toDF("id", "cost", "gain")
  }

  test("pareto2d returns exactly the non-dominated set, keeping " +
      "tied duplicates and dropping same-cost lower-gain rows") {
    import spark.implicits._
    val got = Skyline.pareto2d(pts, bucketWidth = 100L)
      .orderBy("cost", "id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 50L, 1L), (1L, 100L, 5L),
      (4L, 200L, 8L), (5L, 200L, 8L), (8L, 400L, 9L)))
  }

  test("bucketWidth shapes only the plan, never the result") {
    import spark.implicits._
    val base = Skyline.pareto2d(pts, bucketWidth = 100L)
      .orderBy("cost", "id").as[(Long, Long, Long)].collect().toSeq
    for (w <- Seq(1L, 7L, 1000L)) {
      val alt = Skyline.pareto2d(pts, bucketWidth = w)
        .orderBy("cost", "id").as[(Long, Long, Long)].collect().toSeq
      assert(alt == base, s"bucketWidth=$w changed the skyline")
    }
  }
}
