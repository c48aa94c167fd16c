package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.functions.{Bpe, BpeByteVocab}

/** The weekly crawl refresh END-TO-END on the streaming engine — the
  * composition q155 pins in batch form, here driven trigger-by-trigger:
  * each arriving crawl drop is exact-incrementally deduped, near-deduped,
  * decontaminated, byte-BPE tokenized, and appended to the persistent
  * shard store, all inside one `foreachBatch`.
  *
  * Reference semantics per tier (chosen to make the streamed run
  * EQUIVALENT to the one-shot batch chain, which is what its oracle
  * replays):
  *  - EXACT dedup references prior ∪ previously-ACCEPTED stream docs
  *    (an accepted-docs ledger this pipeline maintains): with id-ordered
  *    drops this is global first-writer-wins — exactly the in-batch
  *    `row_number = 1` rule of the single-batch run.
  *  - NEAR dedup and n-gram decontamination reference the FIXED prior
  *    corpus / benchmark slice only (the q88/q92 incremental contract:
  *    near-dup decisions are made against the kept CORPUS, not against
  *    in-flight peers — two near-dup docs inside one refresh both land,
  *    same as the batch chain).
  *  - The shard append is O(batch) ([[ShardSink.append]]), versions
  *    keyed `batchId + 1` above the caller-seeded `v0` prior pack, so
  *    re-delivered triggers are no-ops on the store.
  *
  * The accepted-docs ledger is written with plain append: a re-delivered
  * trigger may duplicate ledger rows, which is HARMLESS by construction —
  * the ledger only ever feeds the exact-tier anti-join reference, where
  * duplicates cannot change any keep/drop decision (and the store append
  * itself is batchId-keyed exactly-once). */
object RefreshPipeline {

  /** Drive a document stream (idCol, shardCol, textCol at minimum)
    * through the refresh chain into `storeDir`. The caller seeds the
    * store's `v0` with the prior corpus pack (so appends extend it) and
    * passes the same `prior`/`benchmark` frames the batch chain would
    * use. Blocks until the AvailableNow drain completes. */
  def run(docs: DataFrame, prior: DataFrame, benchmark: DataFrame,
          storeDir: String, ledgerDir: String, checkpointDir: String,
          budget: Int = 2048, shardCol: String = "source",
          idCol: String = "doc_id", textCol: String = "text",
          numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.8,
          decontamN: Int = 5, minMatches: Int = 2): Unit = {
    val q = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val ledger = new java.io.File(ledgerDir)
        val accepted =
          if (ledger.exists()) sp.read.parquet(ledgerDir)
            .select(col(idCol), col(shardCol), col(textCol))
          else prior.select(col(idCol), col(shardCol), col(textCol))
            .limit(0)
        val ref = prior.select(col(idCol), col(shardCol), col(textCol))
          .unionByName(accepted)
        val exactKept = Dedup.exactIncremental(batch, ref, textCol, idCol)
        val nearKept = Dedup.nearIncremental(exactKept, prior, textCol,
          idCol, numHashes = numHashes, bands = bands,
          threshold = threshold, mode = Dedup.Portable)
        val cleaned = Dedup.ngramDecontaminate(nearKept, benchmark,
            textCol, idCol, n = decontamN, minMatches = minMatches)
          .filter(!col("contaminated"))
          .drop("n_matched", "contaminated")
          .localCheckpoint(true) // used twice: ledger + pack
        try {
          cleaned.select(col(idCol), col(shardCol), col(textCol))
            .write.mode("append").parquet(ledgerDir)
          ShardSink.append(sp,
            cleaned.withColumn("__ids",
              Bpe.byteTokenIds(col(textCol), BpeByteVocab.merges)),
            "__ids", idCol, budget, shardCol, storeDir,
            version = Some(batchId + 1))
        } finally
          org.apache.spark.sql.graftglue.GraftGlue
            .releaseCheckpoint(cleaned)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
