package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchGuard's artifact parsing — the piece of the host-steal protocol
  * whose silent failure would make the guard vacuous (an empty parse
  * reads as "no shared queries, pass is clean"). The protocol itself
  * (uptime gate, discard-inflated, probe-then-adjudicate) is driven by
  * Bench end-to-end and exercised operationally. */
class BenchGuardSpec extends AnyFunSuite {

  test("parseQueries reads the detail artifact's queries block only") {
    val json =
      """{"metric":"total","value":12.345,"unit":"sec","runs":3,
        |"queries":{"q01_agg_basic":1.500,"q118_pq_ann":0.971,
        |"q170_refresh_cross_store":18.693},
        |"failed":{"q99_x":"boom 2.0"},
        |"components":{"q168_stream_drain":12.300},
        |"sf":"/root/testdata/sf0.1"}""".stripMargin.replace("\n", "")
    val q = graft.tools.BenchGuard.parseQueries(json)
    assert(q == Map("q01_agg_basic" -> 1.5, "q118_pq_ann" -> 0.971,
      "q170_refresh_cross_store" -> 18.693))
    // the failed/components blocks never leak into the query map
    assert(!q.contains("q99_x") && !q.contains("q168_stream_drain"))
  }

  test("parseQueries is empty (never throws) on junk or missing block") {
    assert(graft.tools.BenchGuard.parseQueries("{}").isEmpty)
    assert(graft.tools.BenchGuard.parseQueries("not json").isEmpty)
    assert(graft.tools.BenchGuard
      .parseQueries("""{"queries":{}}""").isEmpty)
  }
}
