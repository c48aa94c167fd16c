package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Similarity

/** Streaming vector ingest into a SAVED IVF-PQ index — q158/q159's
  * frozen-codebook append driven by the real micro-batch engine: each
  * arriving batch of embeddings is assigned + encoded under the shipped
  * codebooks (no Lloyd's, O(batch) work) and landed as an immutable
  * per-batch delta directory next to the base `encoded` table. The
  * FAISS-plus-message-bus production pattern (new vectors trickle into
  * a serving index between scheduled retrains), with the delivery
  * semantics ShardSink's versioned store established:
  *
  *  - **atomic**: a delta is staged to a hidden directory and published
  *    with a single filesystem rename, so a concurrent [[read]] never
  *    observes a half-written batch;
  *  - **effectively exactly-once**: deltas are keyed by the streaming
  *    batchId — `foreachBatch` is at-least-once, and a re-delivered
  *    batch finds its published directory and skips, so a post-commit
  *    crash never double-appends;
  *  - **O(batch) per trigger**: the base table and prior deltas are
  *    never read on the append path (codebook load is the bounded
  *    driver collect of ivfPqLoad).
  *
  * Each delta keeps the `__list` partitioning, so a probe over [[read]]
  * still prunes to its nProbe lists within every delta. Deltas
  * accumulate one directory per batch; [[compact]] folds them into a
  * fresh single-table index on a schedule (the FileSink.compact
  * discipline — serve from the compacted copy, never rewrite in
  * place). */
object VectorIndexSink {

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
  }

  /** Published delta directories under `indexDir/appends`, batch order.
    * An empty micro-batch publishes a delta with no `__list=` children
    * (nothing but the parquet _SUCCESS marker) — skip those, they carry
    * no rows and would defeat schema inference. */
  private def deltaDirs(indexDir: String): Seq[java.io.File] =
    Option(new java.io.File(s"$indexDir/appends").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("b\\d+")
        && Option(f.listFiles()).getOrElse(Array.empty)
          .exists(_.getName.startsWith("__list=")))
      .sortBy(_.getName.drop(1).toLong).toSeq

  /** Append one batch under the frozen codebooks as delta `b<batchId>`.
    * Returns false (no work) if that delta is already published — the
    * at-least-once re-delivery path. Also the non-streaming entry
    * point: a scheduler-driven pipeline calls exactly this per drop. */
  def appendBatch(spark: SparkSession, indexDir: String, batchId: Long,
                  batch: DataFrame, vecCol: String = "embedding",
                  idCol: String = "vec_id"): Boolean = {
    val dst = new java.io.File(s"$indexDir/appends/b$batchId")
    if (dst.exists()) return false
    val idx = Similarity.ivfPqLoad(spark, indexDir) // codebooks only:
    // `encoded` stays an unexecuted lazy plan on this path
    val staging = new java.io.File(s"$indexDir/.staging-b$batchId")
    deleteRec(staging) // stale leftover from a crashed attempt
    Similarity.ivfPqEncodeFrozen(idx, batch, vecCol, idCol)
      .write.mode("overwrite").partitionBy("__list")
      .parquet(staging.getAbsolutePath)
    dst.getParentFile.mkdirs()
    // single-directory rename = the publish point; ATOMIC_MOVE holds on
    // a local/posix fs, and on stores without atomic rename the
    // batchId-keyed existence check above still bounds the damage to
    // one retried batch
    java.nio.file.Files.move(staging.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    true
  }

  /** Drive an embedding stream (idCol, vecCol at minimum) into the
    * index, one [[appendBatch]] per micro-batch. Blocks until the
    * AvailableNow drain completes. */
  def run(vecs: DataFrame, indexDir: String, checkpointDir: String,
          vecCol: String = "embedding", idCol: String = "vec_id"): Unit = {
    val q = vecs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch.sparkSession, indexDir, batchId, batch,
          vecCol, idCol)
        () // foreachBatch wants Unit; appendBatch's Boolean is advisory
      }
      .start()
    q.awaitTermination()
  }

  /** Published tombstone directories under `indexDir/tombstones`. */
  private def tombstoneDirs(indexDir: String): Seq[java.io.File] =
    Option(new java.io.File(s"$indexDir/tombstones").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("d\\d+")
        && Option(f.listFiles()).getOrElse(Array.empty)
          .exists(_.getName.endsWith(".parquet")))
      .sortBy(_.getName.drop(1).toLong).toSeq

  /** Remove vectors from the served view WITHOUT rewriting anything —
    * the FAISS `remove_ids` path as an O(batch) tombstone delta: the id
    * set is staged and atomically published under `tombstones/d<id>`,
    * with the same batchId-keyed exactly-once skip as [[appendBatch]].
    * A tombstone masks the id everywhere (base and every append delta,
    * earlier or later) until [[compact]], which serves the surviving
    * rows into a fresh index and thereby makes the removal PHYSICAL —
    * the takedown/right-to-erasure flow: mask now at O(batch) cost,
    * erase bytes at the next scheduled compaction. A re-added id only
    * serves again after a compaction clears the mask (documented
    * terminal-until-compact semantics — id reuse across deletes is a
    * retrain-cycle decision, not a hot-path one). */
  def deleteBatch(spark: SparkSession, indexDir: String, batchId: Long,
                  ids: DataFrame, idCol: String = "vec_id"): Boolean = {
    val dst = new java.io.File(s"$indexDir/tombstones/d$batchId")
    if (dst.exists()) return false
    val staging = new java.io.File(s"$indexDir/.staging-d$batchId")
    deleteRec(staging)
    ids.select(idCol).distinct()
      .write.mode("overwrite").parquet(staging.getAbsolutePath)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.move(staging.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    true
  }

  /** The serving view: base `encoded` plus every published append
    * delta, minus tombstoned ids, under the saved codebooks. Delta and
    * tombstone counts are bounded by [[compact]]'s schedule; each
    * union arm keeps its own `__list` pruning, and the tombstone mask
    * is a broadcast anti join (delete batches are small by nature; a
    * backlog large enough to strain a broadcast is overdue for
    * compaction). */
  def read(spark: SparkSession, indexDir: String,
           idCol: String = "vec_id"): Similarity.IvfPqIndex = {
    val base = Similarity.ivfPqLoad(spark, indexDir)
    val enc = deltaDirs(indexDir).foldLeft(base.encoded) { (d, f) =>
      d.unionByName(spark.read.parquet(f.getAbsolutePath))
    }
    val ts = tombstoneDirs(indexDir)
    val masked =
      if (ts.isEmpty) enc
      else enc.join(
        broadcast(ts.map(f => spark.read.parquet(f.getAbsolutePath))
          .reduce(_ unionByName _)),
        Seq(idCol), "left_anti")
    base.copy(encoded = masked)
  }

  /** Fold base + deltas minus tombstones into a fresh single-table
    * index at `outDir` — run on a schedule (or when delta/tombstone
    * count passes a threshold), then swap serving to the compacted
    * copy. Never rewrites `indexDir` in place, so readers of the old
    * layout are undisturbed; tombstoned rows are ABSENT from the new
    * layout (physical erasure), and the new layout starts with no
    * tombstones. */
  def compact(spark: SparkSession, indexDir: String,
              outDir: String): Unit =
    Similarity.ivfPqSave(read(spark, indexDir), outDir)
}
