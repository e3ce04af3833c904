package graft

import graft.tools.ScaleProbe
import org.scalatest.funsuite.AnyFunSuite

/** The same-scale probe-run merge (ScaleProbe.mergeRuns): a subset
  * re-run must refine a decade, never erase it — the bug class this
  * guards against is a streaming-only 100x pass clobbering the
  * ten-family batch run it was meant to extend.
  */
class ScaleProbeMergeSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private val old =
    """{"copies":100,"sf_dir":"/d","generated_utc":"t0",
       "families":{"a":{"ratio":1.1},"b":{"ratio":2.2}},
       "streaming":{"hh":{"state_rows_ratio":1.0}}}"""
  private val subset =
    """{"copies":100,"sf_dir":"/d","generated_utc":"t1",
       "families":{"b":{"ratio":9.9}}}"""

  test("re-measured families win, unmeasured families survive, and " +
      "a prior streaming block is kept when the new pass has none") {
    val m = om.readTree(ScaleProbe.mergeRuns(old, subset))
    assert(m.get("families").get("a").get("ratio").asDouble() == 1.1)
    assert(m.get("families").get("b").get("ratio").asDouble() == 9.9)
    assert(m.get("streaming").get("hh")
      .get("state_rows_ratio").asDouble() == 1.0)
    assert(m.get("generated_utc").asText() == "t1") // header is the new run's
  }

  test("a new streaming block replaces the old one") {
    val withStream =
      """{"copies":100,"families":{},
         "streaming":{"hh":{"state_rows_ratio":7.0}}}"""
    val m = om.readTree(ScaleProbe.mergeRuns(old, withStream))
    assert(m.get("streaming").get("hh")
      .get("state_rows_ratio").asDouble() == 7.0)
  }

  test("a corrupt prior run falls back to the new run verbatim") {
    assert(ScaleProbe.mergeRuns("{clipped", subset) == subset)
  }
}
