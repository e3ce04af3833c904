package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must evaluate at sf0.001; every oracle entry
  * must point at a registered query. Guards the driver contract.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns formatted documents") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("doc"))
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name evaluates at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
