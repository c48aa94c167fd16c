package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.AgentMetrics

/** view_agent_metrics parity over FIXTURES.md §A8 boundary fixtures:
  * durations at 0/120/300/330/360/5400/5401 (incl. the deliberate 300-360
  * gap), hour buckets, init_method pivot, COUNT DISTINCT phones, null
  * agent_conn filtering, agents missing from dims. */
class AgentMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private def fCalls: DataFrame = {
    val durations = Seq(0, 120, 300, 330, 360, 5400, 5401)
    val methods = Seq("INBOUND", "INBOUND", "INBOUND", "OUTBOUND",
      "OUTBOUND", "TRANSFER", "CALLBACK")
    val phones = Seq("p1", "p2", "p3", "p4", "p5", "p6", "p1") // p1 dup
    val rows = durations.indices.map { i =>
      ("c" + i, "2024-01-10 10:00:00", durations(i), methods(i), phones(i),
        "a-9", "jdoe", "q-1", 10, 5, 1, 7)
    } :+ // null agent_conn -> must be filtered by the view
      ("c-null", null.asInstanceOf[String], 999, "INBOUND", "p9",
        "a-9", "jdoe", "q-1", 0, 0, 0, 0) :+
      // agent missing from all dims -> left-join null group
      ("c-x", "2024-01-10 10:00:00", 100, "INBOUND", "px",
        "a-unknown", "nobody", "q-1", 1, 1, 1, 1)
    rows.toDF("contact_id", "agent_conn_s", "agent_interact_duration",
        "init_method", "customer_phone", "agent_id", "agent_username",
        "queue_id", "agent_afw_duration", "agent_longest_hold",
        "agent_conn_att", "customer_hold_duration")
      .withColumn("agent_conn", to_timestamp(col("agent_conn_s")))
      .withColumn("init_time", // v2 keys off init_time; always present
        coalesce(col("agent_conn"), to_timestamp(lit("2024-01-10 10:00:00"))))
      .withColumn("disconn_time",
        col("agent_conn") + expr("make_interval(0,0,0,0,0,0,agent_interact_duration)"))
      .drop("agent_conn_s")
  }

  private val dimUsers = Seq(("a-9", "Jane", "Doe", "jane@x.com"))
    .toDF("user_id", "user_name", "user_lastname", "user_email")
  private val dimQueues = Seq(("q-1", "Intake")).toDF("queue_id", "queue_name")
  private val dimLitify = Seq(("jdoe", "Paralegal", "PL", "Legal", "M1"))
    .toDF("username", "title", "cm_job_title__c", "department__c",
      "cm_job_title_multi__c")

  lazy val view = AgentMetrics.viewAgentMetrics(fCalls, dimUsers, dimQueues,
    dimLitify).cache()

  test("null agent_conn filtered; known + unknown agents -> 2 groups") {
    assert(view.count() == 2)
  }

  test("duration histogram buckets incl. boundary overlap and 300-360 gap") {
    val r = view.filter(col("user_name") === "Jane").collect()(0)
    assert(r.getAs[Long]("duration_less_2_minutes") == 2)   // 0, 120
    assert(r.getAs[Long]("duration_2_to_5_minutes") == 2)   // 120, 300 (120 in both!)
    assert(r.getAs[Long]("duration_6_to_20_minutes") == 1)  // 360; 330 in the GAP
    assert(r.getAs[Long]("duration_21_to_45_minutes") == 0)
    assert(r.getAs[Long]("duration_46_to_90_minutes") == 1) // 5400
    assert(r.getAs[Long]("duration_more_than_90_minutes") == 1) // 5401
  }

  test("pivot counts, distinct customers, totals, hour buckets") {
    val r = view.filter(col("user_name") === "Jane").collect()(0)
    assert(r.getAs[Long]("inbound_calls") == 3)
    assert(r.getAs[Long]("outbound_calls") == 2)
    assert(r.getAs[Long]("transfer_calls") == 1)
    assert(r.getAs[Long]("callback_calls") == 1)
    assert(r.getAs[Long]("unique_customers") == 6)          // p1 duplicated
    assert(r.getAs[Long]("total_calls") == 7)
    assert(r.getAs[Long]("calls_9_13") == 7)                // all at hour 10
    assert(r.getAs[Long]("calls_13_17") == 0)
    assert(r.getAs[Long]("total_agent_interaction") == 0 + 120 + 300 + 330 + 360 + 5400 + 5401)
    assert(r.getAs[Long]("total_contact_duration") ==
      r.getAs[Long]("total_agent_interaction")) // disconn = conn + duration
  }

  test("missing-dim agent lands in null-name group (left join)") {
    val r = view.filter(col("user_name").isNull).collect()(0)
    assert(r.getAs[Long]("total_calls") == 1)
    assert(r.getAs[String]("queue_name") == "Intake")
  }

  test("v1: hidden cm_job_title_multi__c key keeps groups split") {
    // two usernames, identical VISIBLE litify attrs, different multi key,
    // same connect agent -> reference emits 2 (identical-looking) rows
    val litify2 = Seq(
      ("jdoe", "Paralegal", "PL", "Legal", "M1"),
      ("jdoe2", "Paralegal", "PL", "Legal", "M2"))
      .toDF("username", "title", "cm_job_title__c", "department__c",
        "cm_job_title_multi__c")
    val calls = fCalls.withColumn("agent_username",
      when(col("contact_id").isin("c0", "c1"), "jdoe2")
        .otherwise(col("agent_username")))
    val v = AgentMetrics.viewAgentMetrics(calls, dimUsers, dimQueues, litify2)
    assert(v.filter(col("user_name") === "Jane").count() == 2)
    assert(!v.columns.contains("__cm_job_title_multi"))
  }

  test("v1: user_complete_name is NULL when a name part is NULL (|| parity)") {
    val usersNull = Seq(("a-9", "Jane", null.asInstanceOf[String], "jane@x.com"))
      .toDF("user_id", "user_name", "user_lastname", "user_email")
    val v = AgentMetrics.viewAgentMetrics(fCalls, usersNull, dimQueues, dimLitify)
    val r = v.filter(col("user_name") === "Jane").collect()(0)
    assert(r.getAs[String]("user_complete_name") == null)
  }

  test("v2: answered/total split, init_time keys, epoch-diff buckets") {
    val v2 = AgentMetrics.viewAgentMetrics2(fCalls, dimUsers, dimQueues,
      dimLitify)
    val r = v2.filter(col("user_name") === "Jane").collect()(0)
    assert(r.getAs[Long]("total_calls") == 8)          // incl. unanswered
    assert(r.getAs[Long]("total_answered_calls") == 7) // COUNT(agent_conn)
    // epoch-diff buckets == interact-duration buckets here (disconn-conn=dur)
    assert(r.getAs[Long]("duration_less_2_minutes") == 2)
    assert(r.getAs[Long]("duration_6_to_20_minutes") == 1)
    assert(r.getAs[Long]("calls_8_13") == 8)           // init-hour only
    assert(r.getAs[Long]("calls_13_17") == 0)
  }

  test("metrics pivot: missing metrics -> NULL, values rounded (A11)") {
    val long = Seq(
      ("a1", "t0", "t1", "occupancy", 0.126),
      ("a1", "t0", "t1", "handle_time", 12.0),
      ("a2", "t0", "t1", "occupancy", 0.4))
      .toDF("agent_id", "start_time", "end_time", "metric", "value")
    val wide = AgentMetrics.metricsPivot(long, Seq("occupancy", "handle_time",
      "never_reported"))
    val rows = wide.orderBy("agent_id").collect()
    assert(rows(0).getAs[Double]("occupancy") == 0.13)
    assert(rows(0).getAs[Double]("handle_time") == 12.0)
    assert(rows(0).getAs[Any]("never_reported") == null)
    assert(rows(1).getAs[Any]("handle_time") == null)
  }

  test("approxDistinct tier: same schema, HLL estimate near exact") {
    val exact = AgentMetrics.viewAgentMetrics(fCalls, dimUsers, dimQueues,
      dimLitify)
    val approx = AgentMetrics.viewAgentMetrics(fCalls, dimUsers, dimQueues,
      dimLitify, approxDistinct = true)
    assert(approx.columns.toSeq == exact.columns.toSeq)
    val e = exact.agg(sum("unique_customers")).head.getLong(0)
    val a = approx.agg(sum("unique_customers")).head.getLong(0)
    // small-cardinality fixture: HLL++ is exact-ish; allow 5% slack
    assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong), s"$a vs $e")
  }
}
