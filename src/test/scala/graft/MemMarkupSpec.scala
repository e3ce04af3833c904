package graft

import graft.functions.MemMarkup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F7 (reference Query.java:279-301): JSON int-matrix → <mem> markup,
  * everything else falls back to the raw text.
  */
class MemMarkupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(values: Seq[String]): Seq[(String, Boolean)] = {
    import spark.implicits._
    values.toDF("v")
      .select(MemMarkup.memMarkup(col("v")).as("m"),
        MemMarkup.isMem(col("v")).as("f"))
      .as[(String, Boolean)].collect().toSeq
  }

  test("valid matrices render as <mem> blocks") {
    assert(run(Seq("[[1,2],[3]]")) == Seq(("<mem>1 2</mem><mem>3</mem>", true)))
    assert(run(Seq("[[10,20,30]]")) == Seq(("<mem>10 20 30</mem>", true)))
    assert(run(Seq("[]")) == Seq(("", true)))
    assert(run(Seq("[[1, 2] , [3]]")) == Seq(("<mem>1 2</mem><mem>3</mem>", true)))
  }

  test("quoted-int cells coerce like Jackson's Integer.parseInt") {
    assert(run(Seq("""[["1","2"],["3"]]""")) ==
      Seq(("<mem>1 2</mem><mem>3</mem>", true)))
    assert(run(Seq("""[["01","+5"]]""")) == Seq(("<mem>1 5</mem>", true)))
    // overflow throws in parseInt → reference fallback
    assert(run(Seq("""[[2147483648]]""")) == Seq(("[[2147483648]]", false)))
    // floats are a documented divergence: fallback here
    assert(run(Seq("[[1.5]]")) == Seq(("[[1.5]]", false)))
  }

  test("json objects fall back to raw text (List<Integer[]> can't parse them)") {
    assert(run(Seq("""{"k": 87}""")) == Seq(("""{"k": 87}""", false)))
  }

  test("malformed or mistyped json falls back to raw text") {
    assert(run(Seq("[[1,2]")) == Seq(("[[1,2]", false)))       // not bracketed-pair
    assert(run(Seq("[1,2]")) == Seq(("[1,2]", false)))         // flat ints
    assert(run(Seq("""[["a"]]""")) == Seq(("""[["a"]]""", false))) // non-int cell
    assert(run(Seq("[[1],null]")) == Seq(("[[1],null]", false)))   // null row
    assert(run(Seq("plain text")) == Seq(("plain text", false)))
  }

  test("empty and whitespace strings are not triggers") {
    assert(run(Seq("", "  ")) == Seq(("", false), ("  ", false)))
  }
}
