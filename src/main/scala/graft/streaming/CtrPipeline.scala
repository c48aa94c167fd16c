package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.core.Coercions
import graft.operators.Merge

/** Structured-streaming re-expression of the Firehose CTR pipeline
  * (SURVEY.md §2.7 / EP2; reference `Amazon Connect/Amazon Connect CTR with
  * Firehose/lambda_connect_firehose_redshift.py:41-136`).
  *
  * Reference flow: base64 record batch -> JSON parse (malformed -> Dropped)
  * -> DynamoDB first-writer-wins dedup on ContactId -> flatten nested CTR to
  * 31 columns (NY-local timestamp strings, ARN suffix splits, `.get(_, 0)`
  * defaults) -> buffered COPY into `connect.f_calls`.
  *
  * Spark flow: `readStream` -> [[parse]] (quarantine split replaces Dropped)
  * -> [[flatten]] -> watermarked `dropDuplicatesWithinWatermark` (bounded
  * state replaces the unbounded DynamoDB set; anything past the watermark is
  * still caught by the warehouse-side append-if-absent guard, M2) ->
  * `foreachBatch` append-if-absent sink.
  */
object CtrPipeline {

  /** Nested CTR payload schema (FIXTURES.md §A4). */
  val ctrSchema: StructType = StructType(Seq(
    StructField("ContactId", StringType),
    StructField("InitialContactId", StringType),
    StructField("PreviousContactId", StringType),
    StructField("NextContactId", StringType),
    StructField("Channel", StringType),
    StructField("InitiationMethod", StringType),
    StructField("InitiationTimestamp", StringType),
    StructField("DisconnectTimestamp", StringType),
    StructField("DisconnectReason", StringType),
    StructField("LastUpdateTimestamp", StringType),
    StructField("AgentConnectionAttempts", IntegerType),
    StructField("ConnectedToSystemTimestamp", StringType),
    StructField("Agent", StructType(Seq(
      StructField("ARN", StringType),
      StructField("Username", StringType),
      StructField("ConnectedToAgentTimestamp", StringType),
      StructField("AfterContactWorkStartTimestamp", StringType),
      StructField("AfterContactWorkEndTimestamp", StringType),
      StructField("AfterContactWorkDuration", IntegerType),
      StructField("AgentInteractionDuration", IntegerType),
      StructField("NumberOfHolds", IntegerType),
      StructField("LongestHoldDuration", IntegerType),
      StructField("CustomerHoldDuration", IntegerType)))),
    StructField("Queue", StructType(Seq(
      StructField("ARN", StringType),
      StructField("Name", StringType),
      StructField("EnqueueTimestamp", StringType),
      StructField("DequeueTimestamp", StringType),
      StructField("Duration", IntegerType)))),
    StructField("CustomerEndpoint", StructType(Seq(
      StructField("Address", StringType),
      StructField("Voice", StringType)))),
    StructField("SystemEndpoint", StructType(Seq(
      StructField("Address", StringType))))))

  /** Parse raw (possibly base64) payload strings; returns (good, quarantine).
    * Malformed JSON / empty payload / missing ContactId -> quarantine, the
    * analogue of the reference's `Dropped` status (`:48-79`). */
  def parse(raw: DataFrame, payloadCol: String = "payload",
            base64Encoded: Boolean = false): (DataFrame, DataFrame) = {
    val decoded =
      if (base64Encoded) unbase64(col(payloadCol)).cast("string")
      else col(payloadCol).cast("string")
    val parsed = raw.withColumn("__json", decoded)
      .withColumn("ctr", from_json(col("__json"), ctrSchema))
    val bad = parsed.filter(col("ctr").isNull ||
      col("ctr.ContactId").isNull || col("ctr.ContactId") === "")
    val good = parsed.filter(col("ctr").isNotNull &&
      col("ctr.ContactId").isNotNull && col("ctr.ContactId") =!= "")
    (good, bad.select(col("__json").as("payload")))
  }

  private def ny(c: Column): Column = Coercions.utcToNyString(try_to_timestamp(c))

  /** Flatten the nested CTR struct to the 31-column `connect.f_calls` shape
    * (`lambda_connect_firehose_redshift.py:94-126`): NY-local timestamp
    * strings, ARN suffix extraction, integer duration defaults 0, plus an
    * event-time column retained for watermarking. */
  def flatten(parsed: DataFrame): DataFrame = {
    // nested access must be chained getField, not a dotted literal name
    val c: String => Column =
      path => path.split('.').foldLeft(col("ctr"))((acc, p) => acc(p))
    parsed.select(
      c("ContactId").as("contact_id"),
      c("InitialContactId").as("init_contact_id"),
      c("PreviousContactId").as("prev_contact_id"),
      c("NextContactId").as("next_contact_id"),
      c("Channel").as("channel"),
      c("InitiationMethod").as("init_method"),
      ny(c("InitiationTimestamp")).as("init_time"),
      ny(c("DisconnectTimestamp")).as("disconn_time"),
      c("DisconnectReason").as("disconn_reason"),
      ny(c("LastUpdateTimestamp")).as("last_update_time"),
      ny(c("Agent.ConnectedToAgentTimestamp")).as("agent_conn"),
      substring_index(c("Agent.ARN"), "/agent/", -1).as("agent_id"),
      c("Agent.Username").as("agent_username"),
      coalesce(c("AgentConnectionAttempts"), lit(0)).as("agent_conn_att"),
      ny(c("Agent.AfterContactWorkStartTimestamp")).as("agent_afw_start"),
      ny(c("Agent.AfterContactWorkEndTimestamp")).as("agent_afw_end"),
      coalesce(c("Agent.AfterContactWorkDuration"), lit(0))
        .as("agent_afw_duration"),
      coalesce(c("Agent.AgentInteractionDuration"), lit(0))
        .as("agent_interact_duration"),
      coalesce(c("Agent.NumberOfHolds"), lit(0)).as("agent_holds"),
      coalesce(c("Agent.LongestHoldDuration"), lit(0))
        .as("agent_longest_hold"),
      substring_index(c("Queue.ARN"), "/queue/", -1).as("queue_id"),
      c("Queue.Name").as("queue_name"),
      ny(c("Queue.EnqueueTimestamp")).as("in_queue_time"),
      ny(c("Queue.DequeueTimestamp")).as("out_queue_time"),
      coalesce(c("Queue.Duration"), lit(0)).as("queue_duration"),
      c("CustomerEndpoint.Voice").as("customer_voice"),
      coalesce(c("Agent.CustomerHoldDuration"), lit(0))
        .as("customer_hold_duration"),
      (unix_timestamp(try_to_timestamp(c("DisconnectTimestamp"))) -
        unix_timestamp(try_to_timestamp(c("Agent.ConnectedToAgentTimestamp"))))
        .as("contact_duration"),
      c("SystemEndpoint.Address").as("sys_phone"),
      ny(c("ConnectedToSystemTimestamp")).as("conn_to_sys"),
      c("CustomerEndpoint.Address").as("customer_phone"),
      try_to_timestamp(c("InitiationTimestamp")).as("__event_time"))
  }

  /** Streaming dedup: first record per contact_id wins within the watermark
    * horizon (bounded-state replacement for D1). */
  def dedup(flat: DataFrame, watermark: String = "2 hours"): DataFrame =
    flat.withWatermark("__event_time", watermark)
      .dropDuplicatesWithinWatermark("contact_id")

  /** End-to-end: parse -> flatten -> dedup; quarantine goes to
    * `quarantineSink` via the caller's foreachBatch split. */
  def transform(raw: DataFrame, base64Encoded: Boolean = false,
                watermark: String = "2 hours"): (DataFrame, DataFrame) = {
    val (good, bad) = parse(raw, base64Encoded = base64Encoded)
    (dedup(flatten(good), watermark), bad)
  }

  /** Micro-batch append-if-absent into a parquet fact table — the
    * warehouse-side M2 guard behind the streaming dedup (late records past
    * the watermark horizon still cannot double-insert). Reads only the
    * target's key column (pruned scan) for the anti-join. */
  def appendIfAbsentBatch(batch: DataFrame, targetPath: String,
                          keys: Seq[String] = Seq("contact_id"),
                          ordering: String = "last_update_time"): Unit = {
    val spark = batch.sparkSession
    val first = Merge.keepFirst(batch, keys, ordering)
    // explicit existence check: a transient target-read failure must FAIL
    // the batch (checkpoint retries it), not silently skip the dedup guard
    // and double-insert immutable facts
    val p = new org.apache.hadoop.fs.Path(targetPath)
    val targetExists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    val fresh =
      if (!targetExists) first
      else first.join(spark.read.parquet(targetPath)
        .select(keys.map(col): _*), keys, "left_anti")
    fresh.write.mode("append").parquet(targetPath)
  }

  /** Full sink wiring (§2.7 micro-batch trigger): good records ->
    * foreachBatch append-if-absent into `targetPath`; quarantine ->
    * parquet at `quarantinePath`. The default trigger processes whatever
    * is available then stops (the Firehose 900 s buffer analogue is
    * `Trigger.ProcessingTime("900 seconds")` in production). Returns both
    * queries; the caller awaits/stops them. */
  def start(raw: DataFrame, targetPath: String, quarantinePath: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            base64Encoded: Boolean = false,
            watermark: String = "2 hours"): (StreamingQuery, StreamingQuery) = {
    val (good, bad) = transform(raw, base64Encoded, watermark)
    val goodQ = good.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/good")
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, _: Long) =>
        appendIfAbsentBatch(batch, targetPath))
      .start()
    val badQ = bad.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/bad")
      .trigger(trigger)
      .format("parquet")
      .option("path", quarantinePath)
      .start()
    (goodQ, badQ)
  }
}
