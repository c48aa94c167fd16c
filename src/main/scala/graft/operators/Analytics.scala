package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-analytics operators over (key, timestamp) streams:
  * gap-based sessionization, ordered-step funnels, and rolling
  * time-range aggregates. All three share one discipline — a single
  * shuffle on the entity key, sort-within-partition by event time, and
  * window/aggregate work that never leaves the key's partition — so each
  * holds at 100 TB exactly as well as the key cardinality distributes.
  * Time arithmetic is integer MICROSECONDS end-to-end (`unix_micros`):
  * exact, engine-portable, and immune to double rounding. */
object Analytics {

  /** Gap-based sessionization: a new session starts at the first event of
    * a key and at every event more than `gapSeconds` after its
    * predecessor. Output: input rows (null-timestamp rows excluded — they
    * have no temporal position) plus `session_id`, 1-based per key in
    * time order. `tiebreakCols` pins the order of equal-timestamp events;
    * session ASSIGNMENT is tie-stable either way (a boundary can only sit
    * at the first row of a tie group), the tiebreak just fixes row order
    * for downstream sequence features.
    *
    * ONE shuffle on the key; both windows (lag, running sum) share the
    * same sort, so Catalyst plans a single Window over one exchange. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long,
                 tiebreakCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1: $gapSeconds")
    val us = unix_micros(col(tsCol))
    val order = us.asc +: tiebreakCols.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val gapUs = gapSeconds * 1000000L
    df.filter(col(tsCol).isNotNull)
      .withColumn("__brk",
        when(lag(us, 1).over(w).isNull ||
          us - lag(us, 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__brk")
  }

  /** Ordered-step funnel: for every key that performs `steps.head`, the
    * earliest completion time of each subsequent step, where step i+1
    * must land in `[t_i, t_i + withinSeconds]`. Output: (keyCol,
    * t_1 .. t_n as nullable microsecond epochs, steps_completed).
    * Greedy-earliest semantics — the standard funnel definition: taking
    * the earliest qualifying event at each step never decreases the
    * number of completable steps (an earlier t_i only widens step i+1's
    * window start).
    *
    * Scale shape: step 1 is one key-shuffled min; each later step is one
    * semi-shaped join of the (already key-partitioned) events against the
    * per-key frontier plus a min — n-1 more key shuffles of FILTERED
    * events, never a cross product, never a per-key array collect (bot
    * keys with millions of events cost counts, not memory). */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             withinSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"steps repeat: $steps")
    require(withinSeconds >= 1, s"withinSeconds must be >= 1: $withinSeconds")
    val winUs = withinSeconds * 1000000L
    val e = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("__ty"),
        unix_micros(col(tsCol)).as("__us"))
    val first = e.filter(col("__ty") === steps.head)
      .groupBy(col(keyCol)).agg(min(col("__us")).as("t_1"))
    val full = steps.zipWithIndex.tail.foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t_$i"; val cur = s"t_${i + 1}"
        val hit = e.filter(col("__ty") === step)
          .join(acc.select(col(keyCol), col(prev)), Seq(keyCol))
          .filter(col("__us") >= col(prev) && col("__us") <= col(prev) + winUs)
          .groupBy(col(keyCol)).agg(min(col("__us")).as(cur))
        acc.join(hit, Seq(keyCol), "left")
    }
    full.withColumn("steps_completed",
      steps.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1)
        .otherwise(0)).reduce(_ + _).cast("long"))
  }

  /** Rolling time-range aggregate: per key, the count and exact decimal
    * sum of `valueCol` over the trailing `windowSeconds` (inclusive of
    * the current row's instant) — rate limiting, trailing-volume
    * features, anomaly baselines. RANGE frames are value-defined, so
    * equal-timestamp peers see identical frames regardless of row order:
    * deterministic without any tiebreak. Decimal summation makes the sum
    * order-independent (then one cast back to double).
    * Output: input rows (null timestamps excluded) + `roll_n`,
    * `roll_sum`. One key shuffle, one sort, one window. */
  def rollingAgg(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1: $windowSeconds")
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(us)
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    df.filter(col(tsCol).isNotNull)
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum",
        sum(col(valueCol).cast("decimal(27,12)")).over(w).cast("double"))
  }
  /** Cohort retention: users grouped by their FIRST active day (the
    * cohort), counted as active again at each day offset — the retention
    * triangle every growth dashboard draws. Exact integer counts (ratios
    * are the reader's division): (cohort_date, offset_days, n_active),
    * offset 0 being the cohort's own size by construction.
    *
    * Scale shape: one key shuffle computes first-seen per key riding the
    * same aggregation as the distinct (key, day) activity set, one more
    * groups (cohort, offset) with map-side combine; the key join is
    * key-partitioned on both sides. Null timestamps are excluded. */
  def retention(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val activity = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), to_date(col(tsCol)).as("__day"))
      .distinct()
    val cohorts = activity.groupBy(col("__k"))
      .agg(min(col("__day")).as("__cohort"))
    activity.join(cohorts, Seq("__k"))
      .groupBy(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_date"),
        datediff(col("__day"), col("__cohort")).cast("long")
          .as("offset_days"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** EXACT fixed-point PageRank over an edge list — the link-authority
    * signal crawl curation weights page quality by (domain/page authority
    * as a curation feature). Fixed iteration count, damping 0.85, ranks
    * held in integer `unitScale`-ths (default 1e-12 resolution) with
    * TRUNCATING division everywhere:
    *
    *   rank_0(v)   = unitScale                      (mean rank 1.0)
    *   rank_t+1(v) = 15*unitScale/100
    *               + (85 * sum over u->v of rank_t(u) div out(u)) div 100
    *
    * Why fixed-point: double PageRank is not even run-to-run deterministic
    * under Spark's unordered partial sums; integer units with `div` make
    * every iteration bit-identical across engines, partitionings, and row
    * orders (each truncation loses < 1 unit — at 1e-12 resolution, far
    * below any ranking-relevant difference). Dangling nodes (no
    * out-edges) keep receiving rank but leak their own mass — the
    * standard simplification; renormalize downstream if absolute values
    * matter. Worst-case node rank is bounded by the total mass
    * `unitScale * |V|`, which must fit a signed long — lower `unitScale`
    * for graphs beyond ~10^6 nodes.
    *
    * Scale shape: out-degrees computed once; each iteration is ONE
    * map-side-combined shuffle of (dst, contribution) plus a left join
    * back onto the node frame; lineage is cut per round with an eager
    * localCheckpoint and superseded checkpoints are released (the
    * [[Dedup.clusters]] iterative discipline). Output: (id, rank_units,
    * rank) with rank = rank_units / unitScale as double. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5,
               unitScale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(unitScale >= 1000L, s"unitScale too coarse: $unitScale")
    import org.apache.spark.sql.graftglue.GraftGlue
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().localCheckpoint(true)
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__d"))
      .localCheckpoint(true)
    val nodes = e.select(col("__src").as("id"))
      .unionByName(e.select(col("__dst").as("id")))
      .distinct().localCheckpoint(true)
    val base = 15L * unitScale / 100L
    var r = nodes.withColumn("rank_units", lit(unitScale))
      .localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val inflow = r.join(e, col("id") === col("__src"))
        .join(outdeg, "__src")
        .select(col("__dst"),
          expr("rank_units div __d").as("__c"))
        .groupBy(col("__dst"))
        // decimal inflow sum: a hub can receive up to the whole graph's
        // mass, which overflows long partials before the final div
        .agg(sum(col("__c").cast("decimal(38,0)")).as("__in"))
      // fail-loud overflow guard: under ansi=false a decimal->long cast
      // past long range silently NULLs every downstream rank; the
      // documented unitScale * |V| bound is ENFORCED, not just advised
      // (same discipline as embeddingCentroids' quantization guard)
      val nextUnits = lit(base) + expr(
        "coalesce(__in, cast(0 as decimal(38,0))) * 85 div 100")
      val next = nodes.join(inflow, col("id") === col("__dst"), "left")
        .select(col("id"),
          when(nextUnits > lit(Long.MaxValue), raise_error(concat(
              lit("pagerank rank_units overflow (unitScale * |V| exceeds "),
              lit("long range) — lower unitScale: "),
              nextUnits.cast("string"))))
            .otherwise(nextUnits.cast("long")).as("rank_units"))
        .localCheckpoint(true)
      GraftGlue.releaseCheckpoint(r)
      r = next
    }
    GraftGlue.releaseCheckpoint(e)
    GraftGlue.releaseCheckpoint(outdeg)
    GraftGlue.releaseCheckpoint(nodes)
    r.withColumn("rank",
      col("rank_units").cast("double") / unitScale.toDouble)
  }
}
