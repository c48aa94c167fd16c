package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CtrPipeline

/** EP2 streaming path (SURVEY.md §2.7): parse/quarantine split, nested
  * flatten with NY-local strings + ARN suffixes, watermarked dedup. */
class CtrPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goodCtr =
    """{"ContactId":"c-1","Channel":"VOICE","InitiationMethod":"INBOUND",
      |"InitiationTimestamp":"2025-05-01T14:03:22Z",
      |"DisconnectTimestamp":"2025-05-01T14:10:02Z",
      |"AgentConnectionAttempts":1,
      |"Agent":{"ARN":"arn:aws:connect:r1:123:instance/i/agent/a-9",
      |  "Username":"jdoe","ConnectedToAgentTimestamp":"2025-05-01T14:03:40Z",
      |  "AfterContactWorkDuration":58,"AgentInteractionDuration":382,
      |  "NumberOfHolds":1,"LongestHoldDuration":20,"CustomerHoldDuration":20},
      |"Queue":{"ARN":"arn:aws:connect:r1:123:instance/i/queue/q-1",
      |  "Name":"Intake","Duration":15},
      |"CustomerEndpoint":{"Address":"+15550001","Voice":""},
      |"SystemEndpoint":{"Address":"+15559999"}}""".stripMargin.replace("\n", "")

  test("batch flatten: NY time, ARN suffixes, defaults, contact_duration") {
    val raw = Seq(goodCtr).toDF("payload")
    val (good, bad) = CtrPipeline.parse(raw)
    assert(bad.count() == 0)
    val r = CtrPipeline.flatten(good).collect()(0)
    assert(r.getAs[String]("contact_id") == "c-1")
    // 2025-05-01 is EDT (UTC-4): 14:03:22Z -> 10:03:22 local
    assert(r.getAs[String]("init_time") == "2025-05-01 10:03:22")
    assert(r.getAs[String]("agent_id") == "a-9")
    assert(r.getAs[String]("queue_id") == "q-1")
    assert(r.getAs[Int]("agent_interact_duration") == 382)
    assert(r.getAs[Int]("queue_duration") == 15)
    assert(r.getAs[Long]("contact_duration") == 382L) // 14:03:40 -> 14:10:02
    assert(r.getAs[String]("customer_phone") == "+15550001")
  }

  test("parse quarantines malformed JSON, empty payload, missing ContactId") {
    val raw = Seq(goodCtr, "{not json", "", """{"Channel":"VOICE"}""")
      .toDF("payload")
    val (good, bad) = CtrPipeline.parse(raw)
    assert(good.count() == 1)
    assert(bad.count() == 3)
  }

  test("base64 input path decodes before parsing") {
    val b64 = java.util.Base64.getEncoder.encodeToString(goodCtr.getBytes("UTF-8"))
    val (good, bad) = CtrPipeline.parse(Seq(b64).toDF("payload"),
      base64Encoded = true)
    assert(good.count() == 1 && bad.count() == 0)
  }

  test("streaming dedup: duplicate ContactId dropped within watermark (D1)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val raw = mem.toDF().withColumnRenamed("value", "payload")
    val (flat, _) = CtrPipeline.transform(raw)
    val q = flat.writeStream.format("memory").queryName("ctr_dedup")
      .outputMode("append").start()
    try {
      val dup = goodCtr // same ContactId twice + one other id
      val other = goodCtr.replace("c-1", "c-2")
      mem.addData(dup, dup, other)
      q.processAllAvailable()
      val out = spark.table("ctr_dedup").select("contact_id")
        .as[String].collect().sorted
      assert(out.toSeq == Seq("c-1", "c-2"))
    } finally q.stop()
  }
}
