package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.operators.{ExportConfig, JoinSpec, ParquetSource, Pipeline, XmlPipe}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-table export: `--join` denormalizes a dimension into the
  * docset before projection/filter — row count never shrinks (left
  * join), dimension attributes render like native columns, and key
  * errors fail loudly on either side.
  */
class ExportJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("--join spec grammar: table:key, table:key=dimKey, errors") {
    assert(tools.Export.parseJoin("customer:user_id") ==
      Right(("customer", "user_id", "user_id")))
    assert(tools.Export.parseJoin("customer:user_id=c_custkey") ==
      Right(("customer", "user_id", "c_custkey")))
    assert(tools.Export.parseJoin("customer").isLeft)
    assert(tools.Export.parseJoin(":user_id").isLeft)
    assert(tools.Export.parseJoin("customer:").isLeft)
    assert(tools.Export.parseJoin("customer:=x").isLeft)
  }

  test("joined export docset carries dimension attributes, keeps every " +
      "source row, and stays a well-formed docset") {
    val cfg = ExportConfig(
      source = ParquetSource(dir, "events"),
      keys = Seq("event_id"),
      columns = Seq("event_id", "event_type", "c_name"),
      joins = Seq(JoinSpec(ParquetSource(dir, "customer"),
        "user_id", "c_custkey")))
    val docs = Pipeline.docs(spark, cfg)
    val nEvents = Tables.load(spark, dir, "events").count()
    assert(docs.count() == nEvents, "left join must not drop export rows")
    // golden spot-check: the lowest-id document's enriched dimension
    // value must match the plain batch left join (nulls render as
    // empty elements, the docset convention for absent values)
    val want = Tables.load(spark, dir, "events")
      .join(Tables.load(spark, dir, "customer"),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("c_name"))
      .orderBy(col("event_id")).limit(1).collect()(0)
    val out = new ByteArrayOutputStream()
    XmlPipe.writeDocset(docs.orderBy(col("id")).limit(1), out)
    val got = out.toString(StandardCharsets.UTF_8)
    val wantElem =
      if (want.isNullAt(1)) "<c_name></c_name>"
      else s"<c_name>${want.getString(1)}</c_name>"
    assert(got.contains(s"id=\"${want.getLong(0)}\""), got.take(500))
    assert(got.contains(wantElem), got.take(500))
    // well-formed under a non-namespace parser contract: framing tags
    assert(got.startsWith(
      "<?xml version=\"1.0\" encoding=\"utf-8\"?><sphinx:docset>"))
    assert(got.endsWith("</sphinx:docset>"))
  }

  test("same-named key shorthand keeps ONE key column — later " +
      "references (projection, formatter) stay unambiguous") {
    import spark.implicits._
    case class FrameSource(df: org.apache.spark.sql.DataFrame)
        extends graft.operators.DocSource {
      def load(s: org.apache.spark.sql.SparkSession) = df
    }
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val cfg = ExportConfig(
      source = ParquetSource(dir, "events"),
      keys = Seq("event_id"),
      columns = Seq("event_id", "user_id", "tier"),
      joins = Seq(JoinSpec(FrameSource(dim), "user_id", "user_id")))
    // must not throw AMBIGUOUS_REFERENCE; one user_id column survives
    val docs = Pipeline.docs(spark, cfg)
    assert(docs.count() ==
      Tables.load(spark, dir, "events").count())
    val out = new ByteArrayOutputStream()
    XmlPipe.writeDocset(docs.orderBy(col("id")).limit(1), out)
    val got = out.toString(StandardCharsets.UTF_8)
    // exactly one user_id element per document
    assert("<user_id>".r.findAllIn(got).size == 1, got.take(400))
  }

  test("join key errors fail loudly on either side") {
    val badLeft = ExportConfig(
      source = ParquetSource(dir, "events"), keys = Seq("event_id"),
      joins = Seq(JoinSpec(ParquetSource(dir, "customer"),
        "nope", "c_custkey")))
    val e1 = intercept[IllegalArgumentException](Pipeline.docs(spark, badLeft))
    assert(e1.getMessage.contains("nope"))
    val badRight = ExportConfig(
      source = ParquetSource(dir, "events"), keys = Seq("event_id"),
      joins = Seq(JoinSpec(ParquetSource(dir, "customer"),
        "user_id", "nope")))
    val e2 = intercept[IllegalArgumentException](Pipeline.docs(spark, badRight))
    assert(e2.getMessage.contains("nope"))
  }
}
