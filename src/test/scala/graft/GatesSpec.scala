package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural pins for the `*_recall` / `*_bounds` driver gates.
  *
  * The gates' power comes from two conventions that nothing else
  * enforces: (1) the ORACLE side asserts the expected boolean outcome
  * as a literal TRUE — if both engines computed it, a floor/bound
  * violation would emit `false` twice and hash green; (2) each gate's
  * oracle reads the sketch output Spark materialized for exactly that
  * gate name, via the RecallDirToken path. A refactor that breaks
  * either quietly downgrades the whole evidence chain, so pin both.
  */
class GatesSpec extends AnyFunSuite {
  private val gateNames = SparkEntry.oracleSql.keySet
    .filter(n => n.endsWith("_recall") || n.endsWith("_bounds"))

  test("every recall/bounds gate is a registered query with an oracle") {
    assert(gateNames.nonEmpty)
    assert(gateNames.subsetOf(SparkEntry.queries.keySet),
      s"gates without queries: ${gateNames.diff(SparkEntry.queries.keySet)}")
    // the full expected roster — a dropped gate should fail loudly,
    // not shrink the set silently
    val expected = Set("dedup_minhash_recall", "dedup_simhash_recall",
      "dedup_embedding_ann_recall", "sim_ann_lsh_recall",
      "sim_ann_ivf_recall", "sim_ann_pq_recall", "dedup_semantic_recall",
      "dedup_incremental_near_recall", "profile_sketch_lake_bounds",
      "profile_sketch_overlap_bounds", "profile_kll_lake_bounds",
      "profile_approx_bounds", "text_compression_bounds",
      "sim_matryoshka_ann_recall", "events_stream_heavy_hitters_bounds")
    assert(gateNames == expected,
      s"gate roster drift: +${gateNames.diff(expected)} " +
        s"-${expected.diff(gateNames)}")
  }

  test("gate oracles assert the expected outcome as a literal TRUE") {
    gateNames.foreach { n =>
      val sql = SparkEntry.oracleSql(n)
      val asserted =
        """TRUE AS \w*(meets_floor|within|_ok|plausible)""".r
          .findFirstIn(sql).isDefined
      assert(asserted, s"$n oracle no longer asserts its outcome " +
        "boolean as a literal — a violation would hash green")
      assert(!sql.matches("(?s).*(>=|<=)[^']*AS (meets_floor|within_bound).*"),
        s"$n oracle computes its outcome boolean instead of asserting it")
    }
  }

  test("gate oracles read the dump materialized under the gate's own name") {
    gateNames.foreach { n =>
      val sql = SparkEntry.oracleSql(n)
      assert(sql.contains(s"${SparkEntry.RecallDirToken}/$n/"),
        s"$n oracle does not read read_parquet(<RecallDirToken>/$n/...) — " +
          "Spark and DuckDB would score different rows")
    }
  }

  test("the recall dump dir is keyed by the sf tag so concurrent " +
      "Verify/Bench runs cannot clobber each other") {
    val a = SparkEntry.recallDumpDir("/root/testdata/sf0.01")
    val b = SparkEntry.recallDumpDir("/root/testdata/sf0.1")
    assert(a != b && a.endsWith("sf0.01") && b.endsWith("sf0.1"))
  }
}
