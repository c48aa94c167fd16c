package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize

/** flatMapGroupsWithState sessionization: gap splits, per-key isolation,
  * event-time timeout via watermark. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("gap-based sessions close in-batch and via watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    // u1: two sessions split by a >5min gap; u2: one session
    mem.addData(("u1", ts(0)), ("u1", ts(2)), ("u1", ts(20)),
      ("u2", ts(1)))
    // late advance: push watermark far ahead so open sessions time out
    mem.addData(("u3", Timestamp.valueOf("2024-01-01 14:00:00")))

    val out = Sessionize.sessions(
      mem.toDF().toDF("key", "ts"), gap = "5 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("sessions")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(3)))
    val byKey = rows.groupBy(_._1)
    // u1's first session (10:00-10:02, 2 events) closed by the in-batch gap
    assert(byKey("u1").exists(s => s._2 == ts(0) && s._3 == 2))
    // u1's second session and u2's session closed by event-time timeout
    assert(byKey("u1").exists(s => s._2 == ts(20) && s._3 == 1))
    assert(byKey("u2").head._3 == 1)
  }
}
