package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Curate

/** Streaming training-shard production — q154's batch append as a REAL
  * micro-batch sink: each arriving batch of tokenized documents is
  * appended to a persistent shard store via
  * [[graft.operators.Curate.packTokenIdsIncremental]] inside
  * `foreachBatch`, so the store grows by O(batch + shards) per trigger
  * and shipped full sequences are never rewritten — the weekly-crawl
  * append loop, driven by the streaming engine instead of a scheduler.
  *
  * Store layout: versioned parquet snapshots `storeDir/v0, v1, ...` —
  * each batch reads the latest version, computes the delta, and writes
  * the next version as (previous minus replaced sequences) union delta.
  * Writing a NEW directory per batch keeps the append atomic (a reader
  * never observes a half-written store) and read-vs-overwrite safe; a
  * production deployment would vacuum old versions, which a correctness
  * fixture deliberately keeps.
  *
  * Equivalence contract (what q157 pins corpus-wide): when batches
  * arrive in `idCol` order, the final store equals the one-shot
  * [[graft.operators.Curate.packTokenIds]] of the full corpus — the
  * same delta == full-repack equivalence BpeSpec pins for one append,
  * here composed across every micro-batch of a stream. */
object ShardSink {

  /** Latest committed store version under `storeDir`, if any. */
  private def latestVersion(storeDir: String): Option[(Int, String)] = {
    val root = new java.io.File(storeDir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(f => f.getName.drop(1).toInt -> f.getAbsolutePath)
      .sortBy(_._1).lastOption
  }

  /** Append one batch of documents (with a pre-tokenized `idsCol`) to
    * the store: read latest version, delta via packTokenIdsIncremental,
    * write next version. Also the non-streaming entry point — a
    * scheduler-driven pipeline calls exactly this per crawl drop. */
  def append(spark: SparkSession, batch: DataFrame, idsCol: String,
             idCol: String, budget: Int, shardCol: String,
             storeDir: String): Unit = {
    new java.io.File(storeDir).mkdirs()
    val latest = latestVersion(storeDir)
    val existing = latest match {
      case Some((_, path)) => spark.read.parquet(path)
      // first batch: an empty frame with the exact store schema
      case None =>
        Curate.packTokenIds(batch.limit(0), idsCol, idCol, budget, shardCol)
    }
    val delta = Curate.packTokenIdsIncremental(existing, batch, idsCol,
      idCol, budget, shardCol)
    val merged = existing
      .join(delta.select(col(shardCol), col("seq_id")),
        Seq(shardCol, "seq_id"), "left_anti")
      .unionByName(delta)
    val next = latest.map(_._1 + 1).getOrElse(0)
    merged.write.mode("overwrite").parquet(s"$storeDir/v$next")
  }

  /** Drive a document stream (columns: shardCol, idCol, idsCol at
    * minimum) into the store, one [[append]] per micro-batch. Blocks
    * until the AvailableNow drain completes. */
  def run(docs: DataFrame, idsCol: String, idCol: String, budget: Int,
          shardCol: String, storeDir: String,
          checkpointDir: String): Unit = {
    val q = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch.sparkSession, batch, idsCol, idCol, budget,
          shardCol, storeDir)
      }
      .start()
    q.awaitTermination()
  }

  /** The final store state (latest version), empty-schema-safe. */
  def read(spark: SparkSession, storeDir: String): DataFrame =
    latestVersion(storeDir) match {
      case Some((_, path)) => spark.read.parquet(path)
      case None => throw new IllegalStateException(
        s"no shard store versions under $storeDir")
    }
}
