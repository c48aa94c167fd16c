package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingHeavyHitters

/** Windowed streaming heavy hitters: per-window exact counts in the
  * exact regime, cross-micro-batch sketch state merge, window isolation. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("per-window top tokens, state merged across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingHeavyHitters.topTokens(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts",
      windowDur = "10 minutes", capacity = 16, k = 3)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      // window A (10:00): a x3, b x1 so far
      mem.addData((1L, "a a b", ts(0)), (2L, "a", ts(5)))
      q.processAllAvailable()
      // second micro-batch adds to the SAME window (state merge) plus a
      // separate window B (10:10)
      mem.addData((3L, "b a", ts(9)), (4L, "c c c", ts(12)))
      q.processAllAvailable()
      val rows = spark.table("hh_stream")
        .as[(Timestamp, Long, String, Long)].collect().toSet
      val wA = Timestamp.valueOf("2024-01-01 10:00:00")
      val wB = Timestamp.valueOf("2024-01-01 10:10:00")
      assert(rows == Set(
        (wA, 1L, "a", 4L), (wA, 2L, "b", 2L),
        (wB, 1L, "c", 3L)), rows.toString)
    } finally q.stop()
  }
}
