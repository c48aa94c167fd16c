package graft

/** Physical-plan regression guards: the properties that make these plans
  * survive a 100x scale-up are asserted, not just claimed — broadcasts on
  * dim joins, filter pushdown into scans, and shuffle-freedom of the
  * row-local operators. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q04 star join: small dims broadcast, never shuffled") {
    val p = plan("q04_star_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast joins in:\n$p")
  }

  test("q08 anti join: date filter pushed into the orders scan") {
    val p = plan("q08_anti_join")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate"), s"filter not pushed:\n$p")
  }

  test("q35 view: all three dim joins broadcast") {
    val p = plan("q35_view_agent_metrics_v1")
    assert(p.split("BroadcastHashJoin").length >= 4 ||
      p.split("BroadcastExchange").length >= 4,
      s"expected 3 broadcast joins in:\n$p")
  }

  test("row-local operators are shuffle-free (q21 text stats, q25 minhash)") {
    // narrow map pipelines: any Exchange would mean a scale regression
    assert(!plan("q21_text_stats").contains("Exchange"))
    assert(!plan("q25_minhash_signatures").contains("Exchange"))
  }

  test("q24 fingerprint dedup: exactly one shuffle (the groupBy)") {
    val p = plan("q24_fingerprint_dedup")
    // partial_count/merge_count pattern = map-side combine before exchange
    assert(p.contains("partial"), s"no partial aggregation in:\n$p")
  }
}
