package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every check class counts exact violations; row-level checks " +
      "share one aggregate pass") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", "en", 5L),
      (2L, null: String, "en", 0L),     // null text; n_chars out of range
      (3L, "beta", "xx", 4L),           // lang outside set
      (3L, "beta", "en", 4L),           // duplicate id AND text
      (4L, "x y", "de", 9L)             // predicate violation (len 3 != 9)
    ).toDF("id", "text", "lang", "n_chars")
    val got = Expectations.run(df, Seq(
      NotNull("text"),
      InRange("n_chars", 1, 100),
      InSet("lang", Seq("en", "de", "fr")),
      Predicate("len_ok", length(col("text")) === col("n_chars")),
      Unique(Seq("id")),
      Unique(Seq("text"))))
      .orderBy("check", "detail")
      .select("check", "detail", "violations")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("in_range", "n_chars[1.0,100.0]", 1L),
      ("in_set", "lang", 1L),
      ("not_null", "text", 1L),
      // len_ok: row2 null text -> null predicate -> violation; row5
      ("predicate", "len_ok", 2L),
      ("unique", "id", 1L),
      ("unique", "text", 1L)))
    // the row-level checks compile to ONE aggregate over one scan
    val rowLevel = Expectations.run(df,
      Seq(NotNull("text"), InRange("n_chars", 1, 100), InSet("lang",
        Seq("en")), Predicate("p", col("n_chars") > 0)))
    val scans = rowLevel.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans == 1, "row-level checks must share a single scan")
  }

  test("N uniqueness checks fuse into ONE grouping-sets shuffle, and " +
      "a null key value is data (counts as a duplicate key), not " +
      "grouping-set membership") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x"), (1L, "b", "x"),             // dup id
      (2L, null: String, "y"), (3L, null, "y"),   // dup NULL text
      (4L, "c", "z")
    ).toDF("id", "text", "bucket").repartition(3)
    val rep = Expectations.run(df, Seq(
      Unique(Seq("id")), Unique(Seq("text")), Unique(Seq("id", "bucket"))))
    val got = rep.orderBy("detail")
      .select("detail", "violations")
      .as[(String, Long)].collect().toSeq
    // id: key 1 twice -> 1; text: NULL twice -> 1 (null is a key
    // value); (id,bucket): (1,x) twice -> 1
    assert(got == Seq(("id", 1L), ("id,bucket", 1L), ("text", 1L)))
    // one DATA-SIZED shuffle total: the grouping-sets hash exchange.
    // (The SinglePartition exchange folds one partial row per task and
    // the RoundRobin one is this test's own repartition(3) input.)
    val plan = rep.queryExecution.executedPlan.toString
    val hashShuffles = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashShuffles == 1,
      s"3 uniqueness checks must share one keyed shuffle, got " +
        s"$hashShuffles:\n$plan")
    assert(plan.contains("Expand"),
      "fusion must ride the grouping-sets Expand:\n" + plan)
  }

  test("check names and details containing quotes are data, not SQL — " +
      "the unpivot is typed literals, not an interpolated stack()") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, null: String)).toDF("id", "it's")
    val got = Expectations.run(df, Seq(
      NotNull("it's"),
      Predicate("o'brien's rule", col("id") > 0)))
      .orderBy("check")
      .select("check", "detail", "violations")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("not_null", "it's", 1L),
      ("predicate", "o'brien's rule", 0L)))
  }

  test("refIntegrity counts null and unmatched keys as orphans") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.refIntegrity(child, parent, "fk", "pk")
      .select("violations", "passed").as[(Long, Boolean)].head()
    assert(r == ((2L, false))) // null + 9
  }

  test("matches check: non-matching and null both violate") {
    import spark.implicits._
    val df = Seq("src1", "SRC2", null).toDF("s")
    val r = Expectations.run(df, Seq(Matches("s", "^src[0-9]+$")))
      .select("violations").as[Long].head()
    assert(r == 2L)
  }
}
