package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Batch event analytics: gap sessionization, ordered funnels, rolling
  * time-range aggregates. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, String, String, Double)*) =
    rows.toDF("user", "ts", "ty", "v")
      .withColumn("ts", to_timestamp(col("ts")))

  test("sessionize: boundaries strictly beyond the gap, 1-based ids, " +
      "null ts excluded, single window over one exchange") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "a", 1),
      ("u1", "2024-01-01 10:29:59", "b", 1),  // 1799s: same session
      ("u1", "2024-01-01 10:59:59", "c", 1),  // exactly 1800s: SAME session
      ("u1", "2024-01-01 11:30:00", "d", 1),  // 1801s: new session
      ("u2", "2024-01-01 00:00:00", "e", 1))
      .unionByName(Seq(("u3", null.asInstanceOf[String], "z", 1.0))
        .toDF("user", "ts", "ty", "v")
        .withColumn("ts", to_timestamp(col("ts"))))
    val out = Analytics.sessionize(df, "user", "ts", gapSeconds = 1800,
      tiebreakCols = Seq("ty"))
    val m = out.collect()
      .map(r => r.getAs[String]("ty") -> r.getAs[Long]("session_id")).toMap
    assert(m == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 1L))
    assert(!out.columns.contains("__brk"))
    // lag + running sum share one key partitioning: exactly one shuffle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val staticPlan = Analytics.sessionize(df, "user", "ts", 1800,
        Seq("ty")).queryExecution.executedPlan
      val shuffles = staticPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          => e }
      assert(shuffles.size == 1, staticPlan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("funnel: greedy earliest, out-of-order steps ignored, window expiry") {
    val df = ev(
      // u1 completes all three
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 09:00:00", "click", 1),   // BEFORE view: ignored
      ("u1", "2024-01-01 11:00:00", "click", 1),
      ("u1", "2024-01-01 12:00:00", "purchase", 1),
      // u2 stalls after view (click outside the window)
      ("u2", "2024-01-01 10:00:00", "view", 1),
      ("u2", "2024-01-03 10:00:01", "click", 1),
      // u3 never views
      ("u3", "2024-01-01 10:00:00", "purchase", 1))
    val out = Analytics.funnel(df, "user", "ts", "ty",
      Seq("view", "click", "purchase"), withinSeconds = 2L * 24 * 3600)
    val rows = out.collect().map(r => r.getAs[String]("user") ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getAs[Long]("steps_completed"))).toMap
    assert(rows.keySet == Set("u1", "u2"))  // u3 has no step-1 event
    assert(rows("u1")._4 == 3L)
    assert(rows("u2") == ((rows("u2")._1, None, None, 1L)))
    // greedy-earliest: u1's t_2 is the 11:00 click, not anything later
    val t1 = rows("u1")._1.get.asInstanceOf[Long]
    val t2 = rows("u1")._2.get.asInstanceOf[Long]
    assert(t2 - t1 == 3600L * 1000000L)
  }

  test("rollingAgg: value-defined frames include equal-ts peers; " +
      "boundary inclusive; decimal-exact sums") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "e1", 1.5),
      ("u1", "2024-01-01 10:30:00", "e2", 2.25),
      ("u1", "2024-01-01 11:00:00", "e3", 4.0),   // 3600s back: includes e1
      ("u1", "2024-01-01 11:00:00", "e4", 8.0),   // tied with e3: same frame
      ("u1", "2024-01-01 13:00:00", "e5", 16.0))  // alone
    val out = Analytics.rollingAgg(df, "user", "ts", "v", 3600)
      .select("ty", "roll_n", "roll_sum").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("e1") == ((1L, 1.5)))
    assert(out("e2") == ((2L, 3.75)))
    // equal-ts peers e3/e4 share the identical frame (all four rows)
    assert(out("e3") == ((4L, 15.75)))
    assert(out("e4") == ((4L, 15.75)))
    assert(out("e5") == ((1L, 16.0)))
  }
  test("sessionize: randomized parity with a driver-side reference") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 800).map { i =>
      (s"u${rnd.nextInt(10)}", 1700000000L + rnd.nextInt(200000), i.toLong)
    }
    val df = rows.toDF("user", "sec", "eid")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Analytics.sessionize(df, "user", "ts", gapSeconds = 600,
        tiebreakCols = Seq("eid"))
      .select("user", "eid", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = rows.groupBy(_._1).flatMap { case (u, es) =>
      var sid = 0L
      var prev = Long.MinValue
      es.sortBy(e => (e._2, e._3)).map { case (_, sec, eid) =>
        if (prev == Long.MinValue || sec - prev > 600) sid += 1
        prev = sec
        (u, eid) -> sid
      }
    }.toMap
    assert(got == ref)
  }
  test("retention: cohort by first day, offset counts, day-0 = cohort size") {
    val df = Seq(
      ("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-01 22:00:00"), // 1 day
      ("u1", "2024-01-03 09:00:00"),
      ("u2", "2024-01-01 11:00:00"), ("u2", "2024-01-02 11:00:00"),
      ("u3", "2024-01-02 08:00:00"))
      .toDF("user", "ts").withColumn("ts", to_timestamp(col("ts")))
    val out = Analytics.retention(df, "user", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L,  // u1, u2
      ("2024-01-01", 1L) -> 1L,  // u2 returns next day
      ("2024-01-01", 2L) -> 1L,  // u1 returns on day 3
      ("2024-01-02", 0L) -> 1L)) // u3's cohort
  }
}
