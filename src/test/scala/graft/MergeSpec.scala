package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("applyCdc: last version wins, deletes remove, inserts appear, " +
      "untouched keys pass through") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "U", 1L),
      (2L, "b3", "U", 2L),  // later version supersedes b2
      (3L, "c", "D", 1L),   // delete existing
      (9L, "x", "D", 1L),   // delete of absent key: no-op
      (4L, "d", "U", 1L))   // insert
      .toDF("k", "v", "op", "version")
    val got = Merge.applyCdc(target, changes, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b3"), (4L, "d")))
  }

  test("applyCdc: a delete superseded by a later upsert keeps the row") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "a", "D", 1L), (1L, "a2", "U", 2L))
      .toDF("k", "v", "op", "version")
    val got = Merge.applyCdc(target, changes, Seq("k"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a2")))
  }

  test("upsert replaces and inserts by key") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "b2"), (4L, "d")).toDF("k", "v")
    val got = Merge.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("scd2 builds contiguous validity intervals with one current " +
      "row per key") {
    import spark.implicits._
    val log = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 5L, "x")).toDF("k", "version", "v")
    val got = Merge.scd2(log, Seq("k")).orderBy("k", "valid_from")
      .select("k", "valid_from", "valid_to", "is_current", "v")
      .as[(Long, Long, Option[Long], Boolean, String)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, Some(20L), false, "a"),
      (1L, 20L, Some(30L), false, "b"),
      (1L, 30L, None, true, "c"),
      (2L, 5L, None, true, "x")))
  }

  private def failsLoud(body: => Long, needle: String): Unit = {
    val e = intercept[Exception](body)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains(needle)),
      s"expected '$needle' in: ${chain(e).mkString(" | ")}")
  }

  test("applyCdc fails loud on a tied top version") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "b", "U", 2L), (1L, "c", "U", 2L))
      .toDF("k", "v", "op", "version")
    failsLoud(Merge.applyCdc(target, changes, Seq("k")).count(),
      "tied top version")
    // a tie BELOW the winner is harmless and must not trip the guard
    val ok = Seq((1L, "b", "U", 1L), (1L, "c", "U", 1L), (1L, "d", "U", 2L))
      .toDF("k", "v", "op", "version")
    assert(Merge.applyCdc(target, ok, Seq("k"))
      .as[(Long, String)].collect().toSeq == Seq((1L, "d")))
  }

  test("applyCdc fails loud on an op value outside U/D") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "b", "upsert", 1L)).toDF("k", "v", "op", "version")
    failsLoud(Merge.applyCdc(target, bad, Seq("k")).count(),
      "unexpected op value")
    val badNull = Seq((1L, "b", null: String, 1L))
      .toDF("k", "v", "op", "version")
    failsLoud(Merge.applyCdc(target, badNull, Seq("k")).count(),
      "unexpected op value")
  }

  test("scd2 fails loud on duplicate (key, version)") {
    import spark.implicits._
    val dup = Seq((1L, 10L, "a"), (1L, 10L, "b"), (2L, 5L, "x"))
      .toDF("k", "version", "v")
    // the guard rides valid_to: consume it (count() would prune the
    // column away — a reader of the intervals always evaluates it)
    failsLoud(Merge.scd2(dup, Seq("k")).select("valid_to").collect().length,
      "duplicate (key, version)")
    // same version under DIFFERENT keys is fine
    val ok = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "version", "v")
    assert(Merge.scd2(ok, Seq("k")).count() == 2)
  }

  test("scd2AsOf returns exactly the interval containing the instant, " +
      "with half-open boundary semantics") {
    import spark.implicits._
    val log = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "x"))
      .toDF("k", "version", "v")
    val hist = Merge.scd2(log, Seq("k"))
    def at(asOf: Long): Seq[(Long, String)] =
      Merge.scd2AsOf(hist, lit(asOf)).orderBy("k")
        .select("k", "v").as[(Long, String)].collect().toSeq
    assert(at(15L) == Seq((1L, "a"), (2L, "x")))
    // boundary: asOf == valid_to of "a" == valid_from of "b" -> "b"
    assert(at(20L) == Seq((1L, "b"), (2L, "x")))
    assert(at(100L) == Seq((1L, "b"), (2L, "x")))
    // before any version of key 1
    assert(at(7L) == Seq((2L, "x")))
  }

  test("merge operators are total on empty inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val emptyC = Seq.empty[(Long, String, String, Long)]
      .toDF("k", "v", "op", "version")
    assert(Merge.applyCdc(empty, emptyC, Seq("k")).count() == 0)
    val tgt = Seq((1L, "a")).toDF("k", "v")
    assert(Merge.applyCdc(tgt, emptyC, Seq("k")).count() == 1)
    assert(Merge.upsert(tgt, empty, Seq("k")).count() == 1)
  }

  test("incrementalAgg: delta-applied state equals the full recompute, " +
      "zero-count keys drop, invalid ops fail loud") {
    import spark.implicits._
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "v")
    val state = Merge.aggState(base, "k", "v")
    // delete one of k=1's rows, both of... k=3 entirely; insert k=4
    val delta = Seq((1L, 10L, "D"), (3L, 7L, "D"), (4L, 9L, "I"))
      .toDF("k", "v", "op")
    val got = Merge.incrementalAgg(state, delta, "k", "v")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    // recompute from the surviving multiset
    val want = Seq((1L, 1L, 20L), (2L, 1L, 5L), (4L, 1L, 9L))
    assert(got == want)
    // untouched keys pass through; deleted-to-zero key 3 is gone
    assert(!got.exists(_._1 == 3L))
    // invalid op: loud failure, not silent sign guessing
    val bad = Seq((1L, 1L, "X")).toDF("k", "v", "op")
    val e = intercept[Exception] {
      Merge.incrementalAgg(state, bad, "k", "v").collect()
    }
    assert(e.getMessage.contains("invalid op") ||
      Option(e.getCause).exists(_.getMessage.contains("invalid op")))
  }
}
