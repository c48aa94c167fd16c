package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingRollingAgg

/** Streaming rolling aggregate: sealed-event parity with the batch
  * operator, late-event frame correctness, watermark truncation, and
  * state drain via timeout. */
class StreamingRollingAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def run(name: String, data: Seq[(String, Long, Timestamp, Double)],
                  late: Seq[(String, Long, Timestamp, Double)] = Nil,
                  watermark: String = "30 minutes") = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp, Double)]
    mem.addData(data: _*)
    if (late.nonEmpty) mem.addData(late: _*)
    mem.addData(("wm", 9999L, ts(23), 0.0)) // advance watermark: seal all
    val out = StreamingRollingAgg.rolling(
      mem.toDF().toDF("key", "event_id", "ts", "value"),
      windowSeconds = 3600, watermark = watermark)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
  }

  test("sealed rows match the batch rollingAgg exactly (frames, decimal " +
      "sums, equal-timestamp peers)") {
    val data = Seq(
      ("u1", 1L, ts(10, 0), 1.25), ("u1", 2L, ts(10, 30), 2.5),
      ("u1", 3L, ts(11, 0), 4.0),  // frame: all three (range inclusive)
      ("u1", 4L, ts(12, 30), 8.0), // frame: itself only
      ("u2", 5L, ts(10, 0), 0.1), ("u2", 6L, ts(10, 0), 0.2)) // ts tie
    val got = run("sroll_parity", data)
    val batch = graft.operators.Analytics.rollingAgg(
        data.toDF("key", "event_id", "ts", "value"),
        "key", "ts", "value", windowSeconds = 3600)
      .select(col("event_id"), col("roll_n"), col("roll_sum"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == batch.keySet) // everything sealed by the wm row
    got.foreach { case (id, (n, s)) =>
      assert(batch(id) == ((n, s)), s"event $id: got ($n,$s) batch ${batch(id)}")
    }
    // equal-timestamp peers see identical RANGE frames on both sides
    assert(got(5L) == got(6L))
  }

  test("a late in-watermark event lands in later frames before they seal") {
    // event at 10:40 arrives AFTER the 11:00 event (out of order); the
    // 11:00 frame must still count it — frames are computed at seal
    // time, not at arrival time
    val got = run("sroll_late",
      Seq(("u1", 1L, ts(10, 0), 1.0), ("u1", 3L, ts(11, 0), 4.0)),
      late = Seq(("u1", 2L, ts(10, 40), 2.0)))
    assert(got(3L) == ((3L, 7.0)), s"late event missed: ${got(3L)}")
    assert(got(2L) == ((2L, 3.0))) // its own frame: 10:00 + 10:40
  }

  test("seal is STRICT at ts < watermark: an equal-timestamp peer " +
      "arriving while ts == watermark still lands in the frame") {
    // Spark's late-data filter KEEPS rows with ts >= watermark, so while
    // the watermark sits exactly ON an event's timestamp an equal-ts
    // RANGE-frame peer can still legally arrive. A `<=` seal emits the
    // event one batch early and under-counts that peer (the ADVICE
    // scenario); the strict seal waits until wm passes the ts.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp, Double)]
    // batch 1: event 1 at 10:00 + a 10:30 row -> wm becomes exactly 10:00
    mem.addData(("u1", 1L, ts(10, 0), 1.0), ("u1", 2L, ts(10, 30), 2.0))
    // batch 2 (wm == 10:00): invokes the group WITHOUT advancing the
    // watermark — a <= seal would emit event 1 here, peerless
    mem.addData(("u1", 9L, ts(10, 20), 0.0))
    // batch 3 (wm still 10:00): the equal-ts peer, legally admitted
    mem.addData(("u1", 3L, ts(10, 0), 5.0))
    mem.addData(("wm", 99L, ts(23), 0.0)) // seal everything
    val out = StreamingRollingAgg.rolling(
      mem.toDF().toDF("key", "event_id", "ts", "value"),
      windowSeconds = 3600, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sroll_strict")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sroll_strict").collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((2L, 6.0)), // counts the late equal-ts peer
      s"event 1 under-counted its equal-ts peer: ${got(1L)}")
    assert(got(3L) == ((2L, 6.0)))
    assert(got(9L) == ((3L, 6.0))) // [9:20,10:20]: events 1, 3, 9
    assert(got(2L) == ((4L, 8.0))) // [9:30,10:30]: all four
    // and the result equals the batch operator on the full data
    val batch = graft.operators.Analytics.rollingAgg(
        Seq(("u1", 1L, ts(10, 0), 1.0), ("u1", 2L, ts(10, 30), 2.0),
          ("u1", 9L, ts(10, 20), 0.0), ("u1", 3L, ts(10, 0), 5.0))
          .toDF("key", "event_id", "ts", "value"),
        "key", "ts", "value", windowSeconds = 3600)
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("roll_n"), r.getAs[Double]("roll_sum")))).toMap
    Seq(1L, 2L, 3L, 9L).foreach(id => assert(got(id) == batch(id),
      s"event $id diverges from batch: ${got(id)} vs ${batch(id)}"))
  }

  test("unsealed tail rows do not emit (watermark truncation)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp, Double)]
    mem.addData(("u1", 1L, ts(10), 1.0), ("u1", 2L, ts(22, 45), 2.0))
    val out = StreamingRollingAgg.rolling(
      mem.toDF().toDF("key", "event_id", "ts", "value"),
      windowSeconds = 3600, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sroll_tail")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("sroll_tail").collect().map(_.getLong(1)).toSet
    // wm ends at 22:45 - 30min = 22:15: event 1 sealed, event 2 not
    assert(ids == Set(1L), s"expected only the sealed event: $ids")
  }
}
