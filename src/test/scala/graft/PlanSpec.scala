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

  test("q92 decontamination: grams are distinct'd BEFORE the explode on " +
      "both sides — exactly two Generates, both under the gram join") {
    // one Generate per side (corpus grams, reference grams); a third
    // would mean the probe side re-expands grams above the join — the
    // shape that turns an 8-byte-hash join into a per-gram blowup
    val p = plan("q92_ngram_decontaminate")
    val generates = p.split("Generate").length - 1
    assert(generates == 2, s"expected 2 Generates, got $generates:\n$p")
    // the reference-gram side aggregates to DISTINCT hashes before its
    // broadcast (HashAggregate pair around an Exchange under the
    // BroadcastExchange) — broadcasting raw grams would ship duplicates
    assert(p.contains("BroadcastExchange"), s"reference not broadcast:\n$p")
  }

  test("q100 score pass (unigramLogProb): exactly the one term-key window " +
      "shuffle plus the per-doc re-aggregation") {
    // q100's own executedPlan is a checkpoint scan (the operator
    // materializes eagerly to share the score pass), so the pin sits on
    // the score operator itself: 2 hash exchanges — term window + doc_id
    // aggregation — and the corpus-size side is a broadcast, not a join
    // shuffle
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = graft.operators.Relevance
      .unigramLogProb(docs, "text", "doc_id", exactSum = true)
      .queryExecution.executedPlan.toString
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
    assert(p.contains("BroadcastExchange"), s"corpus count not broadcast:\n$p")
  }

  test("q98 pagerank: per-iteration stage cost is CONSTANT (lineage is " +
      "cut per round, not regrown)") {
    // the iterative-algorithm regression to guard against is superlinear
    // plan growth (a dropped localCheckpoint makes round k replay rounds
    // 1..k-1). Measuring submitted stages for 2/4/6 iterations: the two
    // deltas must be equal (linear total = constant per-iteration) and
    // small (the one contribution shuffle + its join/materialization
    // stages, bounded by 8 per iteration with AQE retries)
    val edges = {
      import spark.implicits._
      (0L until 60L).flatMap(i => Seq((i, (i + 1) % 60), (i, (i * 7) % 60)))
        .toDF("src", "dst")
    }
    def stagesFor(iters: Int): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        graft.operators.Analytics.pagerank(edges, "src", "dst",
          iterations = iters).count()
        // listener bus is async: wait until the count is stable
        var last = -1
        var stable = 0
        var spins = 0
        while (stable < 3 && spins < 100) {
          val c = counter.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
          Thread.sleep(50)
          spins += 1
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val s2 = stagesFor(2); val s4 = stagesFor(4); val s6 = stagesFor(6)
    val d1 = s4 - s2; val d2 = s6 - s4
    assert(d1 == d2, s"per-iteration stage cost drifted: $s2/$s4/$s6")
    assert(d1 <= 16, s"iterations too expensive: +${d1 / 2.0} stages/iter")
  }

  test("q117/q129 quantized encodes are shuffle-free; q119 decontamination " +
      "is a broadcast nested-loop anti with no corpus exchange") {
    // the encode passes are pure scan->project chains: any Exchange in
    // the FINAL encode plan is a scale regression (the trains' compact
    // aggregations run as separate jobs and are not part of this plan)
    assert(!plan("q117_pq_encode").contains("Exchange"))
    assert(!plan("q129_scalar_quantize").split("HashAggregate").head
      .contains("Exchange hashpartitioning"))
    val p = plan("q119_semantic_decontaminate")
    assert(p.contains("BroadcastNestedLoopJoin"), s"not a BNLJ:\n$p")
    // the final two-phase aggregation's exchange sits ABOVE the join
    // (prints first); nothing BELOW the join may hash-shuffle — the
    // corpus reaches the anti join straight off the scan
    assert(!p.substring(p.indexOf("BroadcastNestedLoopJoin"))
      .contains("Exchange hashpartitioning"), s"corpus shuffled:\n$p")
  }

  test("q140 byte-level BPE count: one row-local native expression — " +
      "no Exchange, no Generate, the whole 1k-merge chain in the scan") {
    val p = plan("q140_bpe1k_tokens")
    assert(!p.contains("Exchange"), s"shuffle in a row-local encode:\n$p")
    assert(p.contains("bpe_byte_count"), s"native expression missing:\n$p")
  }

  test("q139 corpus-scale decontamination: candidates meet through a band " +
      "equi join — NEVER a nested loop or cartesian, whatever the " +
      "reference size") {
    val p = plan("q139_decontaminate_scaled")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q147 token shards: exactly one hash exchange (the doc-level " +
      "window shuffle) — the exploded token stream grouped in place") {
    // the (shard, seq) groupBy must reuse the window's
    // hashpartitioning(shard): shard is a prefix of the grouping key, so
    // a second exchange would mean the token stream itself reshuffles —
    // the scale regression this operator's layout exists to avoid
    val p = plan("q147_token_shards")
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    assert(p.contains("bpe_byte_ids"), s"native ids expression missing:\n$p")
  }

  test("q127 ivf-pq probe: code table reached through ONE broadcast equi " +
      "join on __list, ranking exchange only after the heap prune") {
    val p = plan("q127_ivfpq_ann")
    assert(p.contains("BroadcastHashJoin"), s"list join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi candidate join:\n$p")
    // the heap pruner (MapPartitions) must sit BELOW the single ranking
    // exchange: candidates are cut to k-per-probe before any shuffle
    // tree text prints parents first: the Exchange (parent) must appear
    // BEFORE the MapPartitions pruner (child) it consumes
    val prune = p.indexOf("MapPartitions")
    val exch = p.indexOf("Exchange hashpartitioning")
    assert(prune >= 0 && exch >= 0 && exch < prune,
      s"heap prune not below the ranking exchange:\n$p")
  }

  test("q81 key skew: denominator reuses the grouped-counts exchange — " +
      "the input is scanned once, not re-counted") {
    // the reuse materializes at AQE runtime, so execute first
    val df = SparkEntry.queries("q81_key_skew")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"total should reuse the grouped-counts stage, not rescan:\n$p")
  }
}
