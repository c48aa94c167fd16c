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
  *    (a fingerprint ledger this pipeline maintains): with id-ordered
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
  * Per-trigger cost discipline: every prior-side derivation — exact
  * fingerprints, minhash band postings, reference grams — is
  * trigger-invariant, so each is computed ONCE per run and cached
  * (localCheckpoint, released on exit); a trigger pays only its own
  * batch's row-local passes, the bounded joins against those caches,
  * and the O(batch) append. The ledger stores accepted docs'
  * FINGERPRINTS (not text) and is written with plain append: a
  * re-delivered trigger may duplicate ledger rows, which is HARMLESS
  * by construction — the ledger only ever feeds the exact-tier
  * anti-join reference, where duplicates cannot change any keep/drop
  * decision (and the store append itself is batchId-keyed
  * exactly-once). */
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
    // every prior-side derivation is trigger-invariant (the
    // incremental contract references the kept corpus only), so all
    // three are computed ONCE here and cached across every trigger —
    // without this, re-deriving the prior's fingerprints / minhash
    // postings / reference grams dominates each micro-batch at corpus
    // scale: the exact-tier fingerprints, the near-tier band postings,
    // and the decontamination reference grams
    val priorFps = Dedup.exactFingerprints(prior, textCol)
      .localCheckpoint(true)
    val postings = Dedup.nearPostings(prior, textCol,
        numHashes = numHashes, bands = bands, mode = Dedup.Portable)
      .localCheckpoint(true)
    val refGrams = Dedup.ngramRefGrams(benchmark, textCol, n = decontamN)
      .localCheckpoint(true)
    try {
      val q = docs.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val sp = batch.sparkSession
          val ledger = new java.io.File(ledgerDir)
          // the ledger stores accepted docs' FINGERPRINTS, not text —
          // per trigger the exact-tier reference is the cached prior
          // fingerprints plus this tiny union
          val refFps =
            if (ledger.exists()) priorFps.unionByName(
              sp.read.parquet(ledgerDir).select(col("__pfp")))
            else priorFps
          val exactKept = Dedup.exactIncremental(batch, prior, textCol,
            idCol, refFps = Some(refFps))
          val nearKept = Dedup.nearIncremental(exactKept, prior, textCol,
            idCol, numHashes = numHashes, bands = bands,
            threshold = threshold, mode = Dedup.Portable,
            postings = Some(postings))
          val cleaned = Dedup.ngramDecontaminate(nearKept, benchmark,
              textCol, idCol, n = decontamN, minMatches = minMatches,
              refGramsCached = Some(refGrams))
            .filter(!col("contaminated"))
            .drop("n_matched", "contaminated")
            .localCheckpoint(true) // used twice: ledger + pack
          try {
            cleaned.select(
                graft.functions.TextFunctions.fingerprint(col(textCol))
                  .as("__pfp"))
              .filter(col("__pfp").isNotNull)
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
    } finally {
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(priorFps)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(postings)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(refGrams)
    }
  }
}
