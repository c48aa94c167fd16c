package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingFunnel

/** Streaming funnel: greedy-earliest parity with the batch operator,
  * watermark sealing, late-event chain lowering, stray-candidate aging. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val steps = Seq("view", "click", "purchase")
  private val hourMs = 3600000L

  test("sealed results match the batch funnel, one row per sealed key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val data = Seq(
      // u1 completes: view 10:00 -> click 10:30 -> purchase 11:00
      ("u1", ts(10, 0), "view"), ("u1", ts(10, 30), "click"),
      ("u1", ts(11, 0), "purchase"),
      // u2 stalls: click arrives 2h after view (outside 1h window)
      ("u2", ts(10, 0), "view"), ("u2", ts(12, 30), "click"),
      // u3 never views: its purchase must emit nothing
      ("u3", ts(10, 0), "purchase"))
    mem.addData(data: _*)
    mem.addData(("wm", ts(23), "view")) // advance watermark far: seal all
    val out = StreamingFunnel.funnel(
      mem.toDF().toDF("key", "ts", "event_type"), steps,
      withinMs = hourMs, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sfunnel").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Timestamp](2).toSeq))).toMap
    assert(got.keySet == Set("u1", "u2")) // u3 emits nothing; wm unsealed
    assert(got("u1") == ((3L, Seq(ts(10, 0), ts(10, 30), ts(11, 0)))))
    assert(got("u2") == ((1L, Seq(ts(10, 0)))))
    // parity with the batch operator on the same (sealed) keys
    val batch = graft.operators.Analytics.funnel(
      data.toDF("key", "ts", "event_type"), "key", "ts", "event_type",
      steps, withinSeconds = 3600)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(batch == Map("u1" -> 3L, "u2" -> 1L))
  }

  test("a late in-watermark step-1 event lowers the chain before sealing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    // click first, then a LATE view 30 min earlier: the funnel must use
    // the late view as t1 and accept the click in its window
    mem.addData(("u1", ts(10, 30), "click"))
    mem.addData(("u1", ts(10, 0), "view"))
    mem.addData(("wm", ts(23), "view"))
    val out = StreamingFunnel.funnel(
      mem.toDF().toDF("key", "ts", "event_type"), steps,
      withinMs = hourMs, watermark = "6 hours")
    val q = out.writeStream.format("memory").queryName("sfunnel_late")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val u1 = spark.table("sfunnel_late").collect()
      .filter(_.getString(0) == "u1")
    assert(u1.length == 1)
    assert(u1.head.getLong(1) == 2L)
    assert(u1.head.getSeq[Timestamp](2).toSeq == Seq(ts(10, 0), ts(10, 30)))
  }

  test("stray later-step candidates age out without emitting") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    mem.addData(("lost", ts(10), "purchase"), ("lost", ts(10, 5), "click"))
    mem.addData(("wm", ts(23), "view"))
    val out = StreamingFunnel.funnel(
      mem.toDF().toDF("key", "ts", "event_type"), steps,
      withinMs = hourMs, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sfunnel_stray")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("sfunnel_stray").collect()
      .forall(_.getString(0) != "lost"))
  }
}
