package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Ingest-time NEAR-dup detection: the streaming counterpart of
  * [[Dedup.minhashPairs]]. Each document is signed row-locally (the same
  * MinHash signature the batch operator computes), exploded to its LSH
  * band keys, and each (band, key) bucket keeps a watermark-bounded
  * member list in the state store; a new arrival is scored against the
  * bucket's existing members and (earlier_id, new_id, est_jaccard) pairs
  * at or above `threshold` are emitted.
  *
  * Scale shape mirrors the batch operator exactly: no all-pairs stage —
  * state and comparisons are per bucket, the per-bucket member cap
  * bounds both memory and comparison fan-out on pathological
  * duplicate-heavy streams, and event-time timeout evicts idle buckets
  * so state never outlives the watermark. A pair sharing several bands
  * may be emitted once per band (buckets are independent, like the
  * batch candidate join before its dropDuplicates); de-duplicate
  * downstream if exactly-once pairs are required. */
object StreamingNearDup {

  // carries the WATERMARKED timestamp column itself — Spark requires the
  // event-time column to flow into the stateful operator's input
  case class Banded(id: Long, bandKey: String, minhash: Seq[Long],
                    ts: Timestamp)
  case class Member(id: Long, minhash: Seq[Long])
  case class NearDupPair(a: Long, b: Long, est_jaccard: Double)

  private def est(x: Seq[Long], y: Seq[Long]): Double = {
    var same = 0
    var i = 0
    while (i < x.length) { if (x(i) == y(i)) same += 1; i += 1 }
    same.toDouble / x.length
  }

  private def update(key: String, rows: Iterator[Banded],
                     state: GroupState[Seq[Member]], threshold: Double,
                     maxBucket: Int, delayMs: Long): Iterator[NearDupPair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var members = state.getOption.getOrElse(Seq.empty)
    val out = Seq.newBuilder[NearDupPair]
    var maxTs = Long.MinValue
    // arrival order inside a batch is not defined -> (ts, id) order makes
    // the emitted pair direction deterministic
    rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
      if (!members.exists(_.id == r.id)) {
        members.foreach { m =>
          val e = est(m.minhash, r.minhash)
          if (e >= threshold) out += NearDupPair(m.id, r.id, e)
        }
        if (members.size < maxBucket) members :+= Member(r.id, r.minhash)
      }
      maxTs = math.max(maxTs, r.ts.getTime)
    }
    state.update(members)
    state.setTimeoutTimestamp(
      math.max(maxTs + delayMs, state.getCurrentWatermarkMs() + 1))
    out.result().iterator
  }

  /** Near-dup pairs over a stream with (idCol: long, textCol: string,
    * tsCol: timestamp). `delay` is both the allowed lateness and the
    * dedup horizon: two near-dups arriving further apart than `delay`
    * are not paired (the batch operator over the landed corpus is the
    * full-history authority — same layering as the reference's stream
    * dedup + warehouse merge guard). */
  def pairs(docs: DataFrame, textCol: String, idCol: String, tsCol: String,
            numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.7,
            shingleN: Int = 3, maxBucket: Int = 64,
            delay: String = "1 hour",
            mode: Dedup.HashMode = Dedup.Portable): Dataset[NearDupPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text is a duplicate of nothing (same guard as the batch pair
    // family) — and a null signature would otherwise band to md5("") and
    // collide every null-text doc into one bucket
    val signed = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).as("__ts"),
        Dedup.minhashSignatureCol(col(textCol), numHashes, shingleN, mode)
          .as("minhash"))
      .withWatermark("__ts", delay)
    val banded = signed.select(col("id"), col("minhash"), col("__ts"),
        posexplode(Dedup.bandKeysCol(col("minhash"), numHashes, bands, mode)))
      .select(col("id"),
        concat(col("pos").cast("string"), lit(":"),
          col("col").cast("string")).as("bandKey"),
        col("minhash"), col("__ts").as("ts"))
      .as[Banded]
    val delayMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(delay))
    require(delayMs.months == 0,
      s"calendar-month delays are ambiguous: $delay")
    val dms = delayMs.days * 86400000L + delayMs.microseconds / 1000L
    banded.groupByKey(_.bandKey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (k: String, it: Iterator[Banded], st: GroupState[Seq[Member]]) =>
          update(k, it, st, threshold, maxBucket, dms))
  }
}
