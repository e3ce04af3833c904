package graft

import graft.functions.Render
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F8/F9 canonical rendering (reference Query.java:231-277). */
class RenderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("scalar canonical forms") {
    import spark.implicits._
    val df = Seq((42, 9999999999L, true, 1.5, "txt"))
      .toDF("i", "l", "b", "d", "s")
    val got = df.select(
      Render.render(col("i"), IntegerType),
      Render.render(col("l"), LongType),
      Render.render(col("b"), BooleanType),
      Render.render(col("d"), DoubleType),
      Render.render(col("s"), StringType)).collect()(0)
    assert(got.toSeq == Seq("42", "9999999999", "true", "1.5", "txt"))
  }

  test("timestamp canonical UTC form") {
    import spark.implicits._
    val df = Seq("2024-03-01 12:34:56.789").toDF("t")
      .select(col("t").cast("timestamp").as("t"))
    val got = df.select(Render.render(col("t"), TimestampType)).collect()(0)
    assert(got.getString(0) == "2024-03-01 12:34:56")
  }

  test("arrays space-join; empty array and nulls render as empty string") {
    import spark.implicits._
    val df = Seq(
      (Seq(1, 2, 3), Some("x")),
      (Seq.empty[Int], None)).toDF("a", "s")
    val got = df.select(
      Render.render(col("a"), ArrayType(IntegerType)).as("ra"),
      Render.render(col("s"), StringType).as("rs"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("1 2 3", "x"), ("", "")))
  }

  test("decimal and date canonical forms") {
    import spark.implicits._
    val df = Seq("x").toDF("x").select(
      lit("123.450").cast("decimal(10,3)").as("dec"),
      lit("2024-02-29").cast("date").as("dt"))
    val got = df.select(
      Render.render(col("dec"), DecimalType(10, 3)),
      Render.render(col("dt"), DateType)).collect()(0)
    assert(got.toSeq == Seq("123.450", "2024-02-29"))
  }

  test("binary renders as hex, maps as json (flagged extensions)") {
    import spark.implicits._
    val df = Seq(Array[Byte](0x0a, 0x1b, -1)).toDF("bin")
    val got = df.select(Render.render(col("bin"), BinaryType)).collect()(0)
    assert(got.getString(0) == "0A1BFF")
    val m = Seq(Map("a" -> 1)).toDF("m")
    val gotM = m.select(Render.render(col("m"), MapType(StringType, IntegerType)))
      .collect()(0)
    assert(gotM.getString(0) == """{"a":1}""")
  }

  test("renderStrict: Date.toString timestamps, ByteBuffer descriptor " +
      "blobs, counter truncation (reference getValue defects)") {
    import spark.implicits._
    val df = Seq("2024-02-29 13:05:09").toDF("s").select(
      to_timestamp(col("s")).as("ts"),
      lit(Array[Byte](1, 2, 3, 4, 5)).as("bin"),
      lit(3000000007L).as("ctr"))
    val got = df.select(
      Render.renderStrict(col("ts"), TimestampType),
      Render.renderStrict(col("bin"), BinaryType),
      Render.renderStrict(col("ctr"), LongType, counter = true),
      Render.renderStrict(col("ctr"), LongType)).collect()(0)
    // java.util.Date("2024-02-29T13:05:09Z").toString under UTC
    assert(got.getString(0) == "Thu Feb 29 13:05:09 UTC 2024")
    assert(got.getString(1) == "java.nio.HeapByteBuffer[pos=0 lim=5 cap=5]")
    assert(got.getString(2) == (3000000007L.toInt).toString) // -1294967289
    assert(got.getString(3) == "3000000007") // non-counter bigint: getLong
  }

  test("renderStrict renders nulls as empty string (no emulated NPE)") {
    import spark.implicits._
    val df = Seq("x").toDF("x").select(
      lit(null).cast(TimestampType).as("ts"),
      lit(null).cast(BinaryType).as("bin"),
      lit(null).cast(LongType).as("ctr"))
    val got = df.select(
      Render.renderStrict(col("ts"), TimestampType),
      Render.renderStrict(col("bin"), BinaryType),
      Render.renderStrict(col("ctr"), LongType, counter = true)).collect()(0)
    assert(got.toSeq == Seq("", "", ""))
  }
}
