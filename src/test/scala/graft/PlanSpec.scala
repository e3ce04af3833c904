package graft

import graft.operators.XmlPipe
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the Spark-first properties we rely on at scale
  * must be visible in the executed plan, not assumed — filter/column
  * pushdown into the parquet scan, broadcast joins for dims, top-k as
  * TakeOrderedAndProject, whole-stage codegen over the formatting
  * pipeline, and a shuffle-free reference-parity path.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters and projection push down to the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("GreaterThan(l_quantity,30.0"), p)
    assert(p.contains("ReadSchema"), p)
    // only the 5 needed columns are read, not all 11
    assert(!p.contains("l_tax"), "projection not pruned: l_tax read")
  }

  test("dimension joins broadcast; no shuffle for small sides") {
    val p = plan("q_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregation is partial+final hash aggregate") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("xmlpipe formatting pipeline is shuffle-free whole-stage codegen") {
    val docs = Tables.load(spark, dir, "documents")
    val p = XmlPipe.formatDocs(docs, Seq("source", "doc_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle in format path:\n$p")
    assert(p.contains("*(1)"), p)
  }

  test("custom expressions stay inside whole-stage codegen") {
    // sdbm hash + minhash + dot product all implement doGenCode; the
    // projection over them must be a WholeStageCodegen stage, not an
    // interpreted fallback.
    import org.apache.spark.sql.functions._
    import graft.functions._
    val docs = Tables.load(spark, dir, "documents")
    val p = docs.select(
      sdbm_hash(col("doc_id"), col("text")),
      minhash_shingled(split(col("text"), " "), 3, 16),
      simhash64(split(col("text"), " ")))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p)
  }
}
