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

  test("q65 range join: bucketized equi-join, never nested-loop/cartesian " +
      "between points and intervals") {
    val p = plan("q65_range_join")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the interval side is tiny here so AQE may broadcast the EQUI join —
    // fine; what must never appear is a nested-loop join carrying the
    // range predicate as its only condition (the |P| x |I| plan)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$p")
  }

  test("q63/q64 relevance: the postings subtree is scanned once per use, " +
      "not duplicated by a df self-join") {
    // document frequency via window (not groupBy+join) means the documents
    // parquet appears at most twice in each plan: the postings scan and
    // the one-row corpus-stats scan
    for (q <- Seq("q63_tfidf_terms", "q64_bm25_rank")) {
      val scans = plan(q).split("FileScan parquet").length - 1
      assert(scans <= 2, s"$q scans documents $scans times")
    }
  }

  test("q62 paragraph dedup: two shuffles (fingerprint rank + doc " +
      "reassembly), no join") {
    val p = plan("q62_paragraph_dedup")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
  }
}
