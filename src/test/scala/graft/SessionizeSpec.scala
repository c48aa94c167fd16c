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

  test("late in-gap event extends the session start backward") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    mem.addData(("u1", ts(5)))
    mem.addData(("u1", ts(2)))  // late, within gap: start must become 10:02
    mem.addData(("u9", Timestamp.valueOf("2024-01-01 18:00:00"))) // advance wm
    val out = Sessionize.sessions(
      mem.toDF().toDF("key", "ts"), gap = "5 minutes", watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val u1 = spark.table("late_sessions")
      .collect().filter(_.getString(0) == "u1")
    assert(u1.exists(r => r.getTimestamp(1) == ts(2) && r.getLong(3) == 2),
      u1.mkString(";"))
  }

  test("adjacent late orphans merge into one session (gap-split, not per-event)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    mem.addData(("u1", ts(30)))              // open session at 10:30
    // two late events, both > gap older than the open session but within
    // gap of EACH OTHER: one 2-event session, not two 1-event ones
    mem.addData(("u1", ts(0)), ("u1", ts(2)))
    mem.addData(("u9", Timestamp.valueOf("2024-01-01 18:00:00"))) // advance wm
    val out = Sessionize.sessions(
      mem.toDF().toDF("key", "ts"), gap = "5 minutes", watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("orphan_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val u1 = spark.table("orphan_sessions").collect()
      .filter(_.getString(0) == "u1")
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(u1.contains((ts(0), ts(2), 2L)), u1.mkString(";"))
    assert(!u1.exists(_._3 == 1L) || u1.count(_._3 == 1L) == 1) // only 10:30's
    assert(u1.count(s => s._1 == ts(0) || s._1 == ts(2)) == 1)
  }

  test("cross-batch orphans and bridging events form exact sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val out = Sessionize.sessions(
      mem.toDF().toDF("key", "ts"), gap = "5 minutes", watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("xbatch_sessions")
      .outputMode("append").start()
    mem.addData(("u1", ts(30))); q.processAllAvailable()
    mem.addData(("u1", ts(0)));  q.processAllAvailable() // late orphan
    mem.addData(("u1", ts(2)));  q.processAllAvailable() // extends orphan CROSS-batch
    mem.addData(("u1", ts(25))); q.processAllAvailable() // bridges to the 10:30 fragment
    mem.addData(("u9", Timestamp.valueOf("2024-01-01 18:00:00")))
    q.processAllAvailable()
    mem.addData(("u9", Timestamp.valueOf("2024-01-01 19:00:00")))
    q.processAllAvailable() // second advance: sealed fragments time out
    q.stop()
    val u1 = spark.table("xbatch_sessions").collect()
      .filter(_.getString(0) == "u1")
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(u1 == Set((ts(0), ts(2), 2L), (ts(25), ts(30), 2L)), u1.toString)
  }

  test("day-granular gap is honored (CalendarInterval days field)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    mem.addData(("u1", Timestamp.valueOf("2024-01-01 10:00:00")),
      ("u1", Timestamp.valueOf("2024-01-01 20:00:00"))) // 10h apart
    mem.addData(("u9", Timestamp.valueOf("2024-03-01 00:00:00")))
    val out = Sessionize.sessions(
      mem.toDF().toDF("key", "ts"), gap = "1 day", watermark = "30 days")
    val q = out.writeStream.format("memory").queryName("day_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val u1 = spark.table("day_sessions").collect()
      .filter(_.getString(0) == "u1")
    assert(u1.length == 1 && u1(0).getLong(3) == 2) // one session, not two
  }
}
