package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingNearDup
import graft.operators.Dedup

/** Ingest-time near-dup detection: stream pairs match the batch operator's
  * candidates, cross-batch pairs are found within the horizon, bucket
  * caps bound pathological streams. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("near-dups pair across batches; disjoint docs never pair") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog in the field", ts(0)),
      (8L, null.asInstanceOf[String], ts(0)),   // null text: dup of nothing
      (9L, null.asInstanceOf[String], ts(1)),   // two nulls must NOT pair/NPE
      (5L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo", ts(1)))
    mem.addData( // near dup of doc 1, later batch, inside the horizon
      (2L, "the quick brown fox jumps over the lazy dog in the barn", ts(10)))
    val out = StreamingNearDup.pairs(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
      numHashes = 64, bands = 16, threshold = 0.5, shingleN = 1)
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pairs = spark.table("neardup_stream")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!pairs.exists(p => p._1 >= 8L || p._2 >= 8L)) // nulls never pair
    // estimates agree with the batch operator's signature agreement
    val batch = Dedup.minhashPairs(
      Seq((1L, "the quick brown fox jumps over the lazy dog in the field"),
          (2L, "the quick brown fox jumps over the lazy dog in the barn"))
        .toDF("doc_id", "text"),
      "text", "doc_id", numHashes = 64, bands = 16,
      threshold = 0.5, shingleN = 1, mode = Dedup.Portable)
      .select("a", "b", "est_jaccard")
      .as[(Long, Long, Double)].collect().head
    val streamed = spark.table("neardup_stream")
      .filter($"a" === 1L && $"b" === 2L)
      .select("est_jaccard").as[Double].collect().head
    assert(batch._3 == streamed)
  }

  test("bucket cap bounds a pathological all-duplicates stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    // 30 near-identical docs, cap 4: emitted pairs are bounded by
    // members-at-cap x arrivals, never quadratic in the stream
    mem.addData((0L until 30L).map(i =>
      (i, s"the same repeated content again and again number", ts(i.toInt % 50))): _*)
    val out = StreamingNearDup.pairs(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
      numHashes = 32, bands = 8, threshold = 0.5, shingleN = 1,
      maxBucket = 4)
    val q = out.writeStream.format("memory").queryName("neardup_capped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("neardup_capped")
      .select("a", "b").distinct().count()
    // each arrival compares against <= 4 members: <= 4*30 distinct pairs,
    // far below the 30*29/2 = 435 of an uncapped bucket
    assert(n > 0 && n <= 120, s"n=$n")
  }
}
