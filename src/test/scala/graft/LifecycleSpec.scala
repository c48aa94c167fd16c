package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.TableSpecs
import graft.queries.AgentMetrics
import graft.streaming.CtrPipeline

/** EP2 -> EP3 end-to-end (SURVEY §3): Firehose-shaped CTR stream ->
  * parse/flatten/dedup -> micro-batch append-if-absent fact ->
  * TableSpec-typed f_calls -> the REAL view_agent_metrics_2. The whole
  * reference lifecycle on one wire. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def ctr(id: String, agent: String, dur: Int): String =
    s"""{"ContactId":"$id",
       |"InitiationMethod":"INBOUND",
       |"InitiationTimestamp":"2024-03-05T14:00:00Z",
       |"DisconnectTimestamp":"2024-03-05T14:10:00Z",
       |"LastUpdateTimestamp":"2024-03-05T14:11:00Z",
       |"AgentConnectionAttempts":1,
       |"Agent":{"ARN":"arn:aws:connect:x:0:instance/i/agent/$agent",
       |  "Username":"u-$agent",
       |  "ConnectedToAgentTimestamp":"2024-03-05T14:00:30Z",
       |  "AgentInteractionDuration":$dur,"NumberOfHolds":1,
       |  "LongestHoldDuration":20,"CustomerHoldDuration":30,
       |  "AfterContactWorkDuration":15},
       |"Queue":{"ARN":"arn:aws:connect:x:0:instance/i/queue/q1",
       |  "Name":"Intake","Duration":5},
       |"CustomerEndpoint":{"Address":"+15550$agent","Voice":"v"},
       |"SystemEndpoint":{"Address":"+15551111"}}""".stripMargin
      .replaceAll("\n", "")

  test("stream -> fact -> typed spec -> view_agent_metrics_2") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("lifecycle").toString
    val mem = MemoryStream[String]
    mem.addData(
      ctr("c1", "a9", 100), ctr("c1", "a9", 100), // stream dup
      ctr("c2", "a9", 7000),                       // >90min bucket
      ctr("c3", "a7", 50),
      "garbage")                                   // quarantine

    val (goodQ, badQ) = CtrPipeline.start(mem.toDF().toDF("payload"),
      s"$dir/f_calls", s"$dir/quarantine", s"$dir/ckpt")
    goodQ.awaitTermination(); badQ.awaitTermination()

    // warehouse side: type the landed fact through the declared spec
    val fCalls = TableSpecs.fCalls(spark.read.parquet(s"$dir/f_calls"))
    assert(fCalls.count() == 3) // dedup held through the sink
    assert(fCalls.schema("agent_conn").dataType.typeName == "timestamp")

    val dimUsers = Seq(("a9", "Ann", "Ops", "ann@x.com"),
        ("a7", "Bo", "Ops", "bo@x.com"))
      .toDF("user_id", "user_name", "user_lastname", "user_email")
    val dimQueues = Seq(("q1", "Intake")).toDF("queue_id", "queue_name")
    val dimLitify = Seq(("u-a9", "T", "J", "D", "M"))
      .toDF("username", "title", "cm_job_title__c", "department__c",
        "cm_job_title_multi__c")

    val view = AgentMetrics.viewAgentMetrics2(fCalls, dimUsers, dimQueues,
      dimLitify)
    val ann = view.filter(col("user_name") === "Ann").collect()(0)
    assert(ann.getAs[Long]("total_calls") == 2)
    assert(ann.getAs[Long]("total_answered_calls") == 2)
    assert(ann.getAs[Long]("inbound_calls") == 2)
    assert(ann.getAs[Long]("total_agent_interaction") == 7100)
    // epoch-diff buckets: both calls disconn-conn = 570 s -> 6-20 min
    assert(ann.getAs[Long]("duration_6_to_20_minutes") == 2)
    assert(ann.getAs[String]("user_complete_name") == "Ann Ops")
    val bo = view.filter(col("user_name") === "Bo").collect()(0)
    assert(bo.getAs[Any]("title") == null) // litify dim miss -> NULL attrs
  }
}
