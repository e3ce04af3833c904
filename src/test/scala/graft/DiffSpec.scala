package graft

import graft.operators.{Dedup, Diff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("snapshot diff classifies added/removed/changed and drops " +
      "unchanged rows") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "n")
    val newSnap = Seq((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L))
      .toDF("k", "s", "n")
    val got = Diff.snapshot(oldSnap, newSnap, Seq("k"))
      .orderBy("k")
      .select("k", "op")
      .as[(Long, String)].collect().toSeq
    // 1 removed, 2 unchanged (absent), 3 changed, 4 added
    assert(got == Seq((1L, "R"), (3L, "C"), (4L, "A")))
    val c = Diff.snapshot(oldSnap, newSnap, Seq("k"))
      .filter(col("op") === "C")
      .select("old_n", "new_n").as[(Long, Long)].collect().head
    assert(c == ((30L, 31L)))
  }

  test("snapshot diff treats null vs value as a change, null vs null " +
      "as unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("k", "s")
    val got = Diff.snapshot(oldSnap, newSnap, Seq("k"))
      .select("k", "op").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "C")))
  }

  test("snapshot diff fails loud on mismatched schemas") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 2L)).toDF("k", "s", "extra")
    val e = intercept[IllegalArgumentException] {
      Diff.snapshot(a, b, Seq("k"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("keepLatest keeps the max-order row per key with deterministic " +
      "tie-break, via WindowGroupLimit") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
      (2L, 5L, 102L, "c"), (2L, 5L, 103L, "d")) // tie on order: id wins
      .toDF("key", "v", "id", "payload")
    val got = Dedup.keepLatest(df, "key", "v", "id")
      .orderBy("key").select("key", "payload")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "b"), (2L, "d")))
    val plan = Dedup.keepLatest(df, "key", "v", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bucketReconcile classifies exactly like the full snapshot " +
      "diff, and identical snapshots drill zero rows") {
    import spark.implicits._
    val oldS = Seq((1L, 10L), (2L, 20L), (3L, 30L), (1001L, 40L))
      .toDF("k", "v")
    val newS = Seq((1L, 10L), (2L, 25L), (4L, 50L), (1001L, 40L))
      .toDF("k", "v") // 2 changed, 3 removed, 4 added, 1001 untouched
    val fp = expr("(k * 7 + v) % 1000003")
    val got = Diff.bucketReconcile(oldS, newS, "k", fp,
        bucketWidth = 1000L)
      .orderBy("k").select("k", "op")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "C"), (3L, "R"), (4L, "A")))
    // equivalence with the exhaustive diff's classification
    val full = Diff.snapshot(oldS, newS, Seq("k"))
      .orderBy("k").select("k", "op")
      .as[(Long, String)].collect().toSeq
    assert(got == full)
    // bucket 1 (key 1001) has matching digests → never drilled
    assert(Diff.bucketReconcile(oldS, newS, "k", fp, 1000L)
      .filter(col("bucket") === 1L).count() == 0)
    // zero churn → zero output
    assert(Diff.bucketReconcile(oldS, oldS, "k", fp, 1000L).count() == 0)
  }
}
