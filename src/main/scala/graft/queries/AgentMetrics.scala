package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytics query surface: `connect.view_agent_metrics`
  * (`Amazon Connect/Views/view_agent_metrics.sql:1-136`) and
  * `connect.view_agent_metrics_2` (`…/Views/connect.view_agent_metrics_2:1-79`)
  * re-expressed as DataFrame functions. Semantics replicated exactly,
  * including the deliberate histogram gaps (300–360 s, 1200–1260 s,
  * 2700–2760 s — SURVEY.md §2.6 A7), Redshift's `/ 60::INT`
  * integer-division floors (P18), `||`'s NULL propagation in
  * user_complete_name, and v1's hidden `cm_job_title_multi__c` GROUP BY key
  * (`view_agent_metrics.sql:129` — grouped on but not selected, so rows
  * that differ only in it stay separate).
  *
  * Plan shape at scale: three broadcast joins (dims are small by
  * construction), one hash-aggregate with partial map-side combine on the
  * group keys, then a presentational sort. The fact scan prunes to the
  * referenced columns and pushes the agent_conn IS NOT NULL filter (v1).
  */
object AgentMetrics {

  private def cntIf(c: Column): Column = count(when(c, 1))

  /** Redshift `a || ' ' || b` — NULL-propagating, unlike concat_ws. */
  private def sqlConcatName: Column =
    concat(col("u.user_name"), lit(" "), col("u.user_lastname"))

  private def joined3(fCalls: DataFrame, dimUsersConnect: DataFrame,
                      dimQueues: DataFrame,
                      dimUsersLitify: DataFrame): DataFrame =
    fCalls.as("c")
      .join(broadcast(dimUsersConnect.as("u")),
        col("c.agent_id") === col("u.user_id"), "left")
      .join(broadcast(dimQueues.as("q")),
        col("c.queue_id") === col("q.queue_id"), "left")
      .join(broadcast(dimUsersLitify.as("l")),
        col("c.agent_username") === col("l.username"), "left")

  /** COUNT(DISTINCT customer_phone) — the one aggregate whose exact form
    * needs a per-group distinct expansion before the final reduce. The
    * exact form is the reference (and oracle) contract; `approx` swaps in
    * HyperLogLog++ (default 5% rsd), which keeps map-side partial
    * aggregation to a constant-size sketch per group — at 100 TB the
    * difference between shuffling every distinct phone number and
    * shuffling a few KB per group. */
  private def uniqueCustomers(approx: Boolean) =
    (if (approx) approx_count_distinct(col("c.customer_phone"))
     else countDistinct(col("c.customer_phone"))).as("unique_customers")

  /** `view_agent_metrics` over a flattened f_calls + the three dims
    * (`view_agent_metrics.sql:1-136`). */
  def viewAgentMetrics(fCalls: DataFrame, dimUsersConnect: DataFrame,
                       dimQueues: DataFrame,
                       dimUsersLitify: DataFrame,
                       approxDistinct: Boolean = false): DataFrame = {
    val joined = joined3(fCalls, dimUsersConnect, dimQueues, dimUsersLitify)
      .filter(col("c.agent_conn").cast("date").isNotNull)

    val dur = col("c.agent_interact_duration")
    val epochDiff =
      unix_timestamp(col("c.disconn_time")) - unix_timestamp(col("c.agent_conn"))
    val connHour = hour(col("c.agent_conn"))
    val discHour = hour(col("c.disconn_time"))

    joined.groupBy(
        col("c.agent_conn").cast("date").as("call_date"),
        month(col("c.agent_conn")).cast("long").as("call_month"),
        dayofmonth(col("c.agent_conn")).cast("long").as("call_day"),
        hour(col("c.agent_conn")).cast("long").as("call_hour"),
        col("u.user_name"), col("u.user_lastname"),
        sqlConcatName.as("user_complete_name"),
        col("u.user_email"), col("l.title"),
        col("l.cm_job_title__c").as("cm_job_title"),
        col("l.department__c").as("department"),
        col("q.queue_name"),
        // hidden group key: grouped on, never selected
        // (view_agent_metrics.sql:129)
        col("l.cm_job_title_multi__c").as("__cm_job_title_multi"))
      .agg(
        sum(dur).as("total_agent_interaction"),
        round(sum(dur) / 3600.0, 2).as("total_agent_interaction_hours"),
        floor(sum(dur) / 60).as("total_agent_interaction_minutes"),
        avg(dur).as("avg_agent_interaction"),
        sum(epochDiff).as("total_contact_duration"),
        round(sum(epochDiff) / 3600.0, 2).as("total_contact_duration_hours"),
        // ROUND(x/60::INT) — round of an already-floored int is a no-op;
        // kept for parity with the reference expression
        round(floor(sum(epochDiff) / 60)).as("total_contact_duration_minutes"),
        avg(epochDiff).as("avg_contact_duration"),
        sum(col("c.agent_afw_duration")).as("total_agent_afw_duration"),
        round(sum(col("c.agent_afw_duration")) / 3600.0, 2)
          .as("total_agent_afw_duration_hours"),
        floor(sum(col("c.agent_afw_duration")) / 60)
          .as("total_agent_afw_duration_minutes"),
        avg(col("c.agent_afw_duration")).as("avg_agent_afw_duration"),
        min(col("c.agent_longest_hold")).as("min_agent_longest_hold"),
        max(col("c.agent_longest_hold")).as("max_agent_longest_hold"),
        sum(col("c.agent_conn_att")).as("total_agent_conn_attempts"),
        sum(col("c.customer_hold_duration")).as("total_customer_hold_duration"),
        round(sum(col("c.customer_hold_duration")) / 3600.0, 2)
          .as("total_customer_hold_duration_hours"),
        floor(sum(col("c.customer_hold_duration")) / 60)
          .as("total_customer_hold_duration_minutes"),
        avg(col("c.customer_hold_duration")).as("avg_customer_hold_duration"),
        uniqueCustomers(approxDistinct),
        count(col("c.agent_conn")).as("total_calls"),
        cntIf(dur.between(0, 120)).as("duration_less_2_minutes"),
        cntIf(dur.between(120, 300)).as("duration_2_to_5_minutes"),
        cntIf(dur.between(360, 1200)).as("duration_6_to_20_minutes"),
        cntIf(dur.between(1260, 2700)).as("duration_21_to_45_minutes"),
        cntIf(dur.between(2760, 5400)).as("duration_46_to_90_minutes"),
        cntIf(dur > 5400).as("duration_more_than_90_minutes"),
        cntIf(connHour.between(9, 13) && discHour <= 13).as("calls_9_13"),
        cntIf(connHour.between(13, 17) && discHour <= 17).as("calls_13_17"),
        cntIf(connHour >= 17 && discHour >= 17).as("calls_17_00"),
        cntIf(col("c.init_method") === "INBOUND").as("inbound_calls"),
        cntIf(col("c.init_method") === "OUTBOUND").as("outbound_calls"),
        cntIf(col("c.init_method") === "TRANSFER").as("transfer_calls"),
        cntIf(col("c.init_method") === "CALLBACK").as("callback_calls"))
      .drop("__cm_job_title_multi")
      .orderBy(col("call_date"), col("call_month"), col("call_day"),
        col("call_hour").desc)
  }

  /** `view_agent_metrics_2` (`connect.view_agent_metrics_2:1-79`):
    * init_time-based date keys (so unanswered calls are kept — no WHERE),
    * `user_id` in the group keys, COUNT(init_time)/COUNT(agent_conn)
    * total/answered split, epoch-diff duration buckets, init-hour-only
    * 8–13/13–17/≥17 buckets, and no hours/minutes derived columns. */
  def viewAgentMetrics2(fCalls: DataFrame, dimUsersConnect: DataFrame,
                        dimQueues: DataFrame,
                        dimUsersLitify: DataFrame,
                        approxDistinct: Boolean = false): DataFrame = {
    val joined = joined3(fCalls, dimUsersConnect, dimQueues, dimUsersLitify)

    val dur = col("c.agent_interact_duration")
    val epochDiff =
      unix_timestamp(col("c.disconn_time")) - unix_timestamp(col("c.agent_conn"))
    val initHour = hour(col("c.init_time"))

    joined.groupBy(
        col("c.init_time").cast("date").as("call_date"),
        month(col("c.init_time")).cast("long").as("call_month"),
        dayofmonth(col("c.init_time")).cast("long").as("call_day"),
        hour(col("c.init_time")).cast("long").as("call_hour"),
        col("u.user_name"), col("u.user_lastname"),
        sqlConcatName.as("user_complete_name"),
        col("u.user_email"), col("u.user_id"),
        col("l.title"),
        col("l.cm_job_title__c").as("cm_job_title"),
        col("l.department__c").as("department"),
        col("q.queue_name"))
      .agg(
        sum(dur).as("total_agent_interaction"),
        avg(dur).as("avg_agent_interaction"),
        sum(epochDiff).as("total_contact_duration"),
        avg(epochDiff).as("avg_contact_duration"),
        sum(col("c.agent_afw_duration")).as("total_agent_afw_duration"),
        avg(col("c.agent_afw_duration")).as("avg_agent_afw_duration"),
        min(col("c.agent_longest_hold")).as("min_agent_longest_hold"),
        max(col("c.agent_longest_hold")).as("max_agent_longest_hold"),
        sum(col("c.agent_conn_att")).as("total_agent_conn_attempts"),
        sum(col("c.customer_hold_duration")).as("total_customer_hold_duration"),
        avg(col("c.customer_hold_duration")).as("avg_customer_hold_duration"),
        uniqueCustomers(approxDistinct),
        count(col("c.init_time")).as("total_calls"),
        count(col("c.agent_conn")).as("total_answered_calls"),
        cntIf(epochDiff.between(0, 120)).as("duration_less_2_minutes"),
        cntIf(epochDiff.between(120, 300)).as("duration_2_to_5_minutes"),
        cntIf(epochDiff.between(360, 1200)).as("duration_6_to_20_minutes"),
        cntIf(epochDiff.between(1260, 2700)).as("duration_21_to_45_minutes"),
        cntIf(epochDiff.between(2760, 5400)).as("duration_46_to_90_minutes"),
        cntIf(epochDiff > 5400).as("duration_more_than_90_minutes"),
        cntIf(initHour.between(8, 13)).as("calls_8_13"),
        cntIf(initHour.between(13, 17)).as("calls_13_17"),
        cntIf(initHour >= 17).as("calls_17_00"),
        cntIf(col("c.init_method") === "INBOUND").as("inbound_calls"),
        cntIf(col("c.init_method") === "OUTBOUND").as("outbound_calls"),
        cntIf(col("c.init_method") === "TRANSFER").as("transfer_calls"),
        cntIf(col("c.init_method") === "CALLBACK").as("callback_calls"))
      .orderBy(col("call_date"), col("call_month"), col("call_day"),
        col("call_hour").desc)
  }

  /** A11 — metrics long->wide pivot (`connect_agent_metrics.py:68-106`):
    * one row per (agent, interval), one column per expected metric, missing
    * metrics NULL, values rounded to 2. The explicit `expectedMetrics` list
    * keeps the pivot single-pass (no distinct-values job). */
  def metricsPivot(longDf: DataFrame, expectedMetrics: Seq[String]): DataFrame =
    longDf.groupBy("agent_id", "start_time", "end_time")
      .pivot("metric", expectedMetrics)
      .agg(round(first("value"), 2))
}
