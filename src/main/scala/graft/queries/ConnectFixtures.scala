package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic `connect.f_calls` + dimension frames derived from the
  * driver's `events.parquet` and `range()`, so the REAL analytics view
  * functions ([[AgentMetrics.viewAgentMetrics]] / [[AgentMetrics.viewAgentMetrics2]])
  * can be oracle-checked: the identical derivation is inlined as CTEs in the
  * DuckDB oracle SQL (SparkEntry.fixtureCtes), making the whole pipeline
  * — fixture, joins, hidden group key, null-name concat — bit-comparable.
  *
  * Shapes mirror the reference (`Amazon Connect/Amazon Connect CTR with
  * boto3/SP_boto3_connect_redshift.sql:5`, `…/lambda_connect_user_upsert.py:116`,
  * `…/lambda_connect_queue_upsert.py:85`, `Salesforce/User/SP_litify_user.sql:14`).
  * Constants are tuned so every semantic edge is exercised at sf0.01:
  *  - 'error' events have NULL agent_conn/disconn_time (v2's answered/total
  *    split; v1's WHERE filter);
  *  - agent_id covers 30 values but the connect dim only 25 → LEFT-join
  *    misses → NULL user_name paths (the `||` null-propagation semantics);
  *  - usernames cover 60 values, the litify dim 54, and its visible
  *    attributes depend on n % 30 while cm_job_title_multi__c depends on
  *    n / 30 → groups that differ ONLY in the hidden GROUP BY key exist.
  */
object ConnectFixtures {

  /** f_calls derived from events: second-precision timestamps (so epoch
    * diffs are exact integers on both engines) and integer durations. */
  def fCalls(events: DataFrame): DataFrame = {
    val vi = floor(col("value")).cast("long")
    val init = date_trunc("second", col("ts"))
    val answered = col("event_type") =!= "error"
    events.select(
      col("event_id").as("contact_id"),
      (col("user_id") % 30).as("agent_id"),
      (col("user_id") % 5).as("queue_id"),
      concat(lit("agent"), (col("user_id") % 60).cast("string"))
        .as("agent_username"),
      init.as("init_time"),
      when(answered, timestamp_seconds(unix_timestamp(init) + vi))
        .as("agent_conn"),
      when(answered, timestamp_seconds(
        unix_timestamp(init) + vi + (vi * 7) % 9000 + 30)).as("disconn_time"),
      ((vi * 3) % 6000).as("agent_interact_duration"),
      (vi % 600).as("agent_afw_duration"),
      ((vi * 13) % 300).as("agent_longest_hold"),
      (col("event_id") % 3).as("agent_conn_att"),
      ((vi * 2) % 400).as("customer_hold_duration"),
      concat(lit("+1"), (col("user_id") % 97).cast("string"))
        .as("customer_phone"),
      when(col("event_type") === "click", "INBOUND")
        .when(col("event_type") === "view", "OUTBOUND")
        .when(col("event_type") === "purchase", "TRANSFER")
        .when(col("event_type") === "signup", "CALLBACK")
        .otherwise("DISCONNECT").as("init_method"))
  }

  /** connect.dim_users: 25 agents (agent_id space is 30 → 5 miss). */
  def dimUsersConnect(s: SparkSession): DataFrame = {
    val n = col("id")
    s.range(0, 25).select(
      n.as("user_id"),
      when(n % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("First"), (n % 3).cast("string")))
        .as("user_name"),
      when(n % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("Last"), (n % 4).cast("string")))
        .as("user_lastname"),
      concat(lit("u"), n.cast("string"), lit("@example.com")).as("user_email"))
  }

  /** connect.dim_queues: 4 queues (queue_id space is 5 → 1 misses). */
  def dimQueues(s: SparkSession): DataFrame =
    s.range(0, 4).select(col("id").as("queue_id"),
      concat(lit("Queue_"), col("id").cast("string")).as("queue_name"))

  /** litify.dim_users: 54 usernames (space is 60 → 6 miss); visible
    * attributes are functions of n % 30, the hidden group key of n / 30. */
  def dimUsersLitify(s: SparkSession): DataFrame = {
    val n = col("id")
    s.range(0, 54).select(
      concat(lit("agent"), n.cast("string")).as("username"),
      when(n % 13 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("Title"), ((n % 30) % 2).cast("string")))
        .as("title"),
      concat(lit("Job"), ((n % 30) % 3).cast("string")).as("cm_job_title__c"),
      concat(lit("Multi"), floor(n / lit(30)).cast("long").cast("string"))
        .as("cm_job_title_multi__c"),
      concat(lit("Dept"), ((n % 30) % 5).cast("string")).as("department__c"))
  }
}
