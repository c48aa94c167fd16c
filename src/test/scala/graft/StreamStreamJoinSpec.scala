package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The q172 surface: Spark's own stream-stream LEFT-OUTER interval join
  * under AvailableNow. Contract pinned here (and replayed by the q172
  * oracle): inner matches are complete and watermark-independent;
  * null-extension for an unmatched left row is emitted exactly when the
  * GLOBAL watermark — the min over both sides' watermarks — proves no
  * admissible right row can still match (v_ts + window < wm); an
  * unmatched left row the final watermark never seals stays in state
  * and is absent from the output. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  /** Run the q172 join shape (1 h interval, 500 ms watermarks) over one
    * batch per side; returns (vid, cid-or(-1)) pairs. */
  private def run(name: String,
                  views: Seq[(Long, Long, Timestamp)],
                  clicks: Seq[(Long, Long, Timestamp)]): Set[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val vm = MemoryStream[(Long, Long, Timestamp)]
    val cm = MemoryStream[(Long, Long, Timestamp)]
    vm.addData(views: _*)
    cm.addData(clicks: _*)
    val v = vm.toDF().toDF("v_uid", "vid", "v_ts")
      .withWatermark("v_ts", "500 milliseconds")
    val c = cm.toDF().toDF("c_uid", "cid", "c_ts")
      .withWatermark("c_ts", "500 milliseconds")
    val joined = v.join(c,
      col("v_uid") === col("c_uid") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toSet
  }

  test("matched pairs are complete; a sealed orphan null-extends; an " +
      "unsealed tail orphan stays in state") {
    // wm = min(20:00, 22:00) - 500 ms. v1@10:00 matches c10@10:20;
    // v2@10:30 has no click in [10:30, 11:30] and 11:30 < wm -> emits
    // null-extended; v3@20:00 is unmatched but 21:00 > wm -> absent.
    val got = run("ssj_seal",
      views = Seq((1L, 1L, ts(10, 0)), (1L, 2L, ts(10, 30)),
        (2L, 3L, ts(20, 0))),
      clicks = Seq((1L, 10L, ts(10, 20)), (2L, 11L, ts(22, 0))))
    assert(got == Set((1L, 10L), (2L, -1L)), s"got $got")
  }

  test("the global watermark is the MIN over sides: a lagging click " +
      "side holds every orphan open") {
    // view side reaches 20:00 but clicks stop at 10:40, so wm =
    // 10:39:59.5 and NO orphan window end (earliest 11:00) is behind
    // it — only the inner matches land; u3's orphan view and the tail
    // view are both absent.
    val got = run("ssj_minwm",
      views = Seq((1L, 1L, ts(10, 0)), (3L, 2L, ts(10, 30)),
        (9L, 9L, ts(20, 0))),
      clicks = Seq((1L, 10L, ts(10, 20)), (1L, 11L, ts(10, 40))))
    assert(got == Set((1L, 10L), (1L, 11L)), s"got $got")
  }

  test("join state is watermark-bounded under a long advancing feed " +
      "(the StreamJoinScale contract at spec scale)") {
    // 20 triggers x (100 views + 90 clicks), event time advancing 2 h
    // per trigger against the 6 h interval: inner pairs and sealed
    // orphans land at their closed forms, state plateaus at the
    // watermark horizon (<= 10 steps of rows, vs 20 steps of input),
    // and eviction really ran — the same check() the 400-trigger
    // STREAMJOIN_SCALE.json artifact run enforces.
    val r = graft.tools.StreamJoinScale.run(spark, steps = 20,
      stepRows = 100)
    graft.tools.StreamJoinScale.check(r, steps = 20, stepRows = 100)
    assert(r.innerPairs == 20L * 90 + 2, s"inner ${r.innerPairs}")
    assert(r.sealedOrphans == 16L * 10, s"orphans ${r.sealedOrphans}")
  }

  test("interval bounds are inclusive on both ends and reject " +
      "out-of-window clicks") {
    // c at exactly v_ts and exactly v_ts + 1 h both match; 1 s outside
    // either end does not. Clicks run past 13:00 so the orphanhood of
    // nothing interferes (every view matched).
    val got = run("ssj_bounds",
      views = Seq((1L, 1L, ts(10, 0))),
      clicks = Seq((1L, 10L, ts(10, 0)), (1L, 11L, ts(11, 0)),
        (1L, 12L, Timestamp.valueOf("2024-01-01 09:59:59")),
        (1L, 13L, Timestamp.valueOf("2024-01-01 11:00:01"))))
    assert(got == Set((1L, 10L), (1L, 11L)), s"got $got")
  }
}
