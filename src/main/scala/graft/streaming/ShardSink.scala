package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Curate

/** Streaming training-shard production — q154's batch append as a REAL
  * micro-batch sink: each arriving batch of tokenized documents is
  * appended to a persistent shard store via
  * [[graft.operators.Curate.packTokenIdsIncremental]] inside
  * `foreachBatch`. Per-trigger cost: the WRITE is O(batch) — a delta-
  * only version — and the compute touches token payloads only for the
  * batch; the existing store contributes a narrow-column scan
  * (shard, seq_id, n_tokens, version — the same metadata the append
  * audit always read), never its payloads.
  *
  * Store layout: versioned parquet DELTAS `storeDir/v0, v1, ...` — each
  * batch computes just its new sequences plus the one topped-up tail
  * row per touched shard, stages them, and PUBLISHES with a single
  * atomic rename ([[StoreFiles.publishOnce]]): a crash mid-write leaves
  * only an unpublished staging dir (swept on retry), never a
  * half-committed version. Versions are keyed by the streaming batchId,
  * so `foreachBatch`'s at-least-once re-delivery finds its committed
  * version and skips — no double-append. (Like every batchId-keyed
  * foreachBatch recipe, the store is therefore coupled to ONE
  * checkpoint lineage: recreating the checkpoint restarts batchIds at
  * 0, so it requires a fresh store — or explicit version keys via the
  * non-streaming [[append]].) Unlike a full-snapshot-per-version
  * layout, a 1% crawl drop writes 1%, not 100%; a production
  * deployment compacts old versions on a schedule, which the
  * correctness fixture deliberately keeps.
  *
  * [[read]] resolves latest-wins per (shard, seq_id): only topped-up
  * TAIL rows are ever superseded (full sequences are immutable by the
  * packTokenIdsIncremental contract), so the loser set is tiny —
  * bounded by touched shards x versions — and is computed from narrow
  * columns then applied as a BROADCAST anti join, so token payloads
  * are never shuffled at all, for any row. Shard keys may be NULL
  * (packTokenIds groups null keys like any other shard); every merge
  * step uses null-safe equality so a null-shard store neither loses
  * rows nor duplicates sequence ids.
  *
  * Equivalence contract (what q157 pins corpus-wide): when batches
  * arrive in `idCol` order, the merged view equals the one-shot
  * [[graft.operators.Curate.packTokenIds]] of the full corpus — the
  * same delta == full-repack equivalence BpeSpec pins for one append,
  * here composed across every micro-batch of a stream. */
object ShardSink {

  /** Committed version directories under `storeDir`, version order. */
  private def versions(storeDir: String): Seq[(Long, java.io.File)] =
    StoreFiles.publishedDirs(storeDir, "v", StoreFiles.hasParquet)

  /** Committed version count — [[StoreRoot]]'s anything-to-fold check
    * (a store holding at most its base has no compaction debt). */
  private[graft] def versionCount(storeDir: String): Int =
    versions(storeDir).size

  /** Append one batch of documents (with a pre-tokenized `idsCol`) to
    * the store: read the merged view, compute the delta via
    * packTokenIdsIncremental, stage it, publish atomically. `version`
    * keys the commit — the streaming path passes its batchId so
    * re-delivery is a no-op (returns false); the non-streaming path
    * (a scheduler-driven pipeline calling this per crawl drop) may
    * omit it to take the next free number. */
  def append(spark: SparkSession, batch: DataFrame, idsCol: String,
             idCol: String, budget: Int, shardCol: String,
             storeDir: String, version: Option[Long] = None,
             skewRobust: Boolean = false): Boolean = {
    StoreFiles.requireNotRetired(storeDir, "shard store")
    new java.io.File(storeDir).mkdirs()
    val vs = versions(storeDir)
    // an explicit version BELOW the latest committed one (the scaladoc's
    // warned-against mix of a restarted streaming checkpoint with the
    // scheduler path) would compute its delta against a merged view
    // that already includes LATER versions, then publish it at the
    // earlier key — read's latest-wins over that interleaving serves an
    // inconsistent store. Equal-to-committed is the harmless
    // re-delivery skip (publishOnce returns false below); anything
    // else out of order fails loudly instead of publishing.
    for (v <- version; (latest, _) <- vs.lastOption)
      require(v > latest || vs.exists(_._1 == v),
        s"out-of-order append: explicit version v$v is below the " +
          s"store's latest committed v$latest at $storeDir - a " +
          "restarted checkpoint lineage needs a fresh store, not an " +
          "interleaved publish into this one")
    val v = version.getOrElse(vs.lastOption.map(_._1 + 1).getOrElse(0L))
    StoreFiles.publishOnce(s"$storeDir/.staging-v$v",
      new java.io.File(s"$storeDir/v$v"), { staging =>
        val existing =
          if (vs.nonEmpty) read(spark, storeDir, shardCol)
          // first batch: an empty frame with the exact store schema
          else Curate.packTokenIds(batch.limit(0), idsCol, idCol,
            budget, shardCol)
        val raw = Curate.packTokenIdsIncremental(existing, batch,
          idsCol, idCol, budget, shardCol, skewRobust = skewRobust)
        // enforce the additive-schema invariant [[read]]'s latest-
        // schema merged scan rests on, where it is free (both schemas
        // are in hand): a delta that DROPPED or renamed a column would
        // silently mask that column on every later read (the explicit
        // latest schema would stop selecting it from older files) —
        // fail the publish loudly instead. New columns are fine: the
        // older files NULL-pad under the wider latest schema.
        val narrowed =
          existing.schema.fieldNames.toSet -- raw.schema.fieldNames
        require(narrowed.isEmpty,
          s"shard store schema narrowed: delta v$v is missing " +
            s"column(s) ${narrowed.mkString(", ")} present in the " +
            s"store at $storeDir - deltas may only ADD columns (the " +
            "merged read takes the latest version's schema)")
        // the cache exists only to make the sizing count below free
        // and the write single-pass. Storage level MEASURED, not
        // guessed: DISK_ONLY (to keep a backfill's payload copy out of
        // execution memory) costs the round-trip of every micro-batch
        // delta through disk serialization — +30% on a 12-trigger
        // refresh drain (132.4 s vs 101.8 s, ~2.5 s/trigger).
        // MEMORY_AND_DISK keeps the common micro-batch delta in RAM
        // and already degrades to disk under memory pressure, which IS
        // the wanted backfill behavior — the unified memory manager
        // arbitrates instead of a hardcoded worst-case level.
        val delta = raw
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // size the version's FILE COUNT to the delta, not to the
          // session's shuffle parallelism: a micro-batch delta written
          // at 32-way parallelism is 32 tiny files, and after t
          // triggers the NEXT append's merged read opens O(32t) files
          // — measured as the dominant per-trigger slope of a
          // 48-trigger drain (shard stage 3.1 -> 7.2 s, 1566 files;
          // REFRESH_SLOPE48.json). One file per ~64k sequence rows,
          // re-widening toward the session parallelism only for
          // genuine backfill-sized deltas. The pack itself still
          // computes at full parallelism (persisted above); only the
          // write narrows.
          val files = math.max(1L,
            math.min(32L, delta.count() / 65536L + 1L)).toInt
          delta.coalesce(files).write.mode("overwrite").parquet(staging)
        } finally { delta.unpersist(); () }
      })
  }

  /** Drive a document stream (columns: shardCol, idCol, idsCol at
    * minimum) into the store, one [[append]] per micro-batch — the
    * batchId keys the committed version, making re-delivered batches
    * no-ops. Blocks until the AvailableNow drain completes. */
  def run(docs: DataFrame, idsCol: String, idCol: String, budget: Int,
          shardCol: String, storeDir: String,
          checkpointDir: String): Unit = {
    val q = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch.sparkSession, batch, idsCol, idCol, budget,
          shardCol, storeDir, version = Some(batchId))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The merged store view: latest-wins per (shardCol, seq_id) across
    * every committed delta version. Superseded (shard, seq_id, version)
    * keys — only ever topped-up tails, so a set bounded by touched
    * shards x versions — are computed from narrow columns and removed
    * with a broadcast anti join: token payloads are never shuffled.
    * Null-safe on the shard key throughout.
    *
    * `asOf` reads the store AS OF a committed version (inclusive) —
    * the delta layout gives snapshot reads for free, and a training
    * run pinned to `asOf = v` is byte-reproducible no matter how many
    * crawl drops land afterwards (versions are immutable once
    * published; only [[compact]] retires them, into a NEW store). */
  def read(spark: SparkSession, storeDir: String,
           shardCol: String = "source",
           asOf: Option[Long] = None): DataFrame = {
    val all = versioned(spark, storeDir, asOf)
    all.join(broadcast(losers(all, shardCol)),
        col(shardCol) <=> col("__lS") && col("seq_id") === col("__lQ")
          && col("__v") === col("__lV"),
        "left_anti")
      .drop("__v")
  }

  /** All committed versions as ONE multi-path scan, tagged `__v` from
    * each file's parent directory name (`vN`). A V-way union of
    * per-version reads would grow the PLAN linearly in committed
    * version count, and with it every append's planning + job overhead
    * — measured as the dominant per-trigger slope of a long refresh
    * drain (shard append 3.5 s → 8.8 s across 16 un-compacted
    * triggers; the single-scan form holds the plan constant and leaves
    * only the inherent file-count growth, which is compaction's job).
    * asOf filtering stays at the PATH level, so snapshot reads scan
    * only their versions. */
  private def versioned(spark: SparkSession, storeDir: String,
                        asOf: Option[Long]): DataFrame = {
    StoreFiles.requireNotRetired(storeDir, "shard store")
    val vs = asOf.fold(versions(storeDir))(v =>
      versions(storeDir).filter(_._1 <= v))
    if (vs.isEmpty) throw new IllegalStateException(
      s"no shard store versions under $storeDir" +
        asOf.fold("")(v => s" at or before v$v"))
    // Schema drift: a column added in a later delta version must be
    // visible (NULL-padded) across the whole scan, not silently
    // dropped because the sampled footer predates it — the per-version
    // unionByName this scan replaced failed loudly on drift. The
    // LATEST version's schema provides that visibility (deltas only
    // ever ADD columns; an explicit schema NULL-pads the older files
    // that predate the addition) without mergeSchema's distributed
    // footer-merge job, which re-reads EVERY file's footer on EVERY
    // read construction — O(versions) per append, measured as the
    // per-trigger slope of a long un-compacted drain
    // (SHARD_APPEND_SLOPE.json). The parsed __v is guarded per row: an
    // unparseable parent directory would cast to NULL and silently
    // corrupt latest-wins resolution, so it raises instead (codegen'd
    // branch, no measurable scan cost).
    val latestSchema =
      spark.read.parquet(vs.last._2.getAbsolutePath).schema
    val raw = spark.read.schema(latestSchema)
      .parquet(vs.map(_._2.getAbsolutePath): _*)
      .withColumn("__v", substring(element_at(
        split(input_file_name(), "/"), -2), 2, 18).cast("long"))
    raw.withColumn("__v",
      when(col("__v").isNull, raise_error(concat(
        lit("shard store layout violation: unparseable version dir for "),
        input_file_name()))).otherwise(col("__v")))
  }

  /** Superseded (shard, seq_id, version) keys of the latest-wins merge
    * — shared by [[read]] (anti join) and [[describe]] (debt count).
    * Renamed narrow-column projections keep the self-join lineage
    * unambiguous (DetectAmbiguousSelfJoin) AND null-safe on the
    * shard. */
  private def losers(all: DataFrame, shardCol: String): DataFrame = {
    val keys = all.select(col(shardCol).as("__kS"),
      col("seq_id").as("__kQ"), col("__v").as("__kV"))
    val maxes = keys.groupBy(col("__kS"), col("__kQ"))
      .agg(max(col("__kV")).as("__vmax"), count(lit(1)).as("__c"))
      .filter(col("__c") > 1) // sole-version keys can't have losers
      .select(col("__kS").as("__mS"), col("__kQ").as("__mQ"),
        col("__vmax"))
    keys.join(maxes,
        col("__kS") <=> col("__mS") && col("__kQ") === col("__mQ"))
      .filter(col("__kV") < col("__vmax"))
      .select(col("__kS").as("__lS"), col("__kQ").as("__lQ"),
        col("__kV").as("__lV"))
  }

  /** Operational description of the store — one row per committed
    * version: its delta size (rows / shards touched / token mass) and
    * how many of its rows the current latest-wins view supersedes
    * (`n_superseded` — the compaction debt a [[compact]] would drop
    * physically). The scheduling signal the ShardSink scaladoc's
    * "compacts old versions on a schedule" needs: compact when
    * version count or total debt passes a threshold. Narrow columns
    * only — token payloads are never read. */
  def describe(spark: SparkSession, storeDir: String,
               shardCol: String = "source"): DataFrame = {
    val all = versioned(spark, storeDir, None)
    val narrow = all.select(col(shardCol), col("seq_id"),
      col("n_tokens"), col("__v"))
    val superseded = narrow.join(broadcast(losers(all, shardCol)),
        col(shardCol) <=> col("__lS") && col("seq_id") === col("__lQ")
          && col("__v") === col("__lV"), "left_semi")
      .groupBy(col("__v")).agg(count(lit(1)).as("n_superseded"))
    narrow.groupBy(col("__v"))
      .agg(count(lit(1)).as("n_rows"),
        // struct-wrapped so the NULL shard counts as a shard
        countDistinct(struct(col(shardCol))).as("n_shards"),
        sum(col("n_tokens").cast("long")).as("n_tokens"))
      .join(superseded, Seq("__v"), "left")
      .select(col("__v").as("version"), col("n_rows"), col("n_shards"),
        col("n_tokens"),
        coalesce(col("n_superseded"), lit(0L)).as("n_superseded"))
      .orderBy(col("version"))
  }

  /** Fold committed delta versions into a fresh base version (`v0` of
    * a NEW store at `outDir`) — the scheduled compaction the delta
    * layout assumes: latest-wins is resolved PHYSICALLY, so superseded
    * topped-up tail rows are absent from the new layout and every
    * later [[read]] merge over it is cheap. Never rewrites `storeDir`
    * in place — readers of the old layout are undisturbed until the
    * caller swaps them over.
    *
    * `keepVersions` > 0 is WINDOWED retention: the newest K delta dirs
    * are carried into the new store verbatim (same version keys) and
    * only versions at or below the cutoff fold into `v0`, so a
    * trailing window of asOf snapshots survives the compaction — the
    * Delta-Lake retention-window analogue. The lineage marker records
    * `max` = highest version COVERED (folded or copied — what
    * [[retire]] checks) and `floor` = the fold cutoff (what a managed
    * root's asOf guard checks). With the default `keepVersions = 0`
    * everything folds and the two coincide.
    *
    * Like the checkpoint coupling documented on [[append]], compaction
    * is a lineage cut for the version sequence BELOW the floor only;
    * appends keyed above `max` continue the global timeline.
    *
    * COST MODEL: the fold rewrites the whole merged view — O(current
    * store), NOT O(deltas folded) — so per-fold cost grows with store
    * lifetime while the debt it clears grows only with `compact_every`.
    * The schedule trades a larger amortized rewrite bill (frequent
    * folds re-pack the same base repeatedly) against per-trigger
    * merged-read debt (version/file count between folds). What keeps a
    * long-lived deployment's TRIGGERS flat despite the O(store) term
    * is running the fold OFF the drain's critical path —
    * [[StoreRoot.beginCompactShard]] folds in the background over the
    * immutable committed versions while appends keep landing, and only
    * the O(late-deltas) [[topUp]] + swap + retire runs inline. */
  def compact(spark: SparkSession, storeDir: String, outDir: String,
              shardCol: String = "source",
              keepVersions: Int = 0): Unit = {
    require(keepVersions >= 0,
      s"keepVersions must be >= 0: $keepVersions")
    StoreFiles.requireNotRetired(storeDir, "shard store")
    StoreFiles.requireNotRetired(outDir, "shard store")
    // a used target would otherwise be SILENT corruption: publishOnce
    // would no-op on an existing v0 and readers would keep serving the
    // old contents as if freshly compacted (the alternating-two-dirs
    // compaction pattern hits exactly this) — fail loudly instead
    require(versions(outDir).isEmpty,
      s"compaction target $outDir already holds store versions - " +
        "compact into a fresh directory")
    val vs = versions(storeDir)
    val maxCovered = vs.lastOption.map(_._1).getOrElse(
      throw new IllegalStateException(
        s"no shard store versions under $storeDir"))
    // windowed retention: fold versions at or below the cutoff into
    // the fresh base, carry the newest `keepVersions` delta dirs over
    // VERBATIM (same version keys - the global timeline continues and
    // a re-delivered append still finds its committed dir), so a
    // trailing asOf window survives the compaction; the fold always
    // absorbs at least the oldest version (deltas need their base)
    val cutoff = vs(math.max(0, vs.length - 1 - keepVersions))._1
    new java.io.File(outDir).mkdirs()
    StoreFiles.publishOnce(s"$outDir/.staging-v0",
      new java.io.File(s"$outDir/v0"), { staging =>
        read(spark, storeDir, shardCol, asOf = Some(cutoff))
          .write.mode("overwrite").parquet(staging)
      })
    vs.filter(_._1 > cutoff).foreach { case (n, f) =>
      StoreFiles.publishOnce(s"$outDir/.staging-v$n",
        new java.io.File(s"$outDir/v$n"),
        staging => StoreFiles.copyRec(f, new java.io.File(staging)))
    }
    // lineage marker AFTER the fold commits — [[retire]]'s precondition
    StoreFiles.writeCompactedFrom(outDir, storeDir, maxCovered,
      floor = Some(cutoff))
  }

  /** TOP-UP a committed compaction target with the delta versions its
    * source grew AFTER the fold was cut — the O(late-deltas) completion
    * step that lets the fold itself run out-of-band while appends keep
    * landing in the source ([[StoreRoot]]'s begin/finish split), and
    * equally the RESUME step for a fold that committed but crashed
    * before its swap. Late version dirs are copied VERBATIM (same
    * keys, staged + published, so re-delivered appends still find
    * their commits and a re-run top-up skips already-copied versions),
    * then the lineage marker's `max` advances atomically while `floor`
    * stays at the original fold cutoff — the copied versions remain
    * individually addressable by asOf, exactly like windowed
    * retention's carried deltas. No-op when the target already covers
    * the source. */
  private[graft] def topUp(storeDir: String, outDir: String): Unit = {
    val m = StoreFiles.readMarker(
        new java.io.File(outDir, StoreFiles.CompactedFromMarker))
      .getOrElse(throw new IllegalStateException(
        s"top-up target $outDir carries no committed fold marker - " +
          "nothing to top up (a partial fold is swept and redone, " +
          "never topped up)"))
    val max = m("max").toLong
    val late = versions(storeDir).filter(_._1 > max)
    if (late.isEmpty) return
    late.foreach { case (n, f) =>
      StoreFiles.publishOnce(s"$outDir/.staging-v$n",
        new java.io.File(s"$outDir/v$n"),
        staging => StoreFiles.copyRec(f, new java.io.File(staging)))
    }
    StoreFiles.writeCompactedFrom(outDir, storeDir, late.last._1,
      floor = Some(m.getOrElse("floor", m("max")).toLong))
  }

  /** Retention: delete a PRE-COMPACTION store after its readers have
    * drained — the vacuum verb the delta layout needs (per-version
    * deletion is impossible here: versions are DELTAS, so dropping v0
    * would corrupt every later merge; what retires is the whole
    * superseded layout, the Delta-Lake-VACUUM analogue where the unit
    * of reclamation is the pre-compaction file set). Refuses loudly
    * unless `compactedTo` carries a [[compact]] lineage marker naming
    * this store AND covering its latest committed version (appends
    * landed after the compaction would otherwise be destroyed). The
    * `_graft_retired` tombstone is written BEFORE the payload sweep and
    * outlives it, so a late reader — including any `asOf`, which is now
    * below the retention floor — fails loudly naming the successor,
    * never sees a partial or empty store. */
  def retire(storeDir: String, compactedTo: String): Unit = {
    StoreFiles.beginRetire(storeDir, compactedTo,
      versions(storeDir).lastOption.map(_._1))
    StoreFiles.deletePayload(storeDir)
  }
}
