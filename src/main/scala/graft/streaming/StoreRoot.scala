package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Generation-managed root over a delta store — the operational layer
  * that turns the stores' manual alternating-two-dirs compaction
  * pattern into a verb. Both [[ShardSink.compact]] and
  * [[VectorIndexSink.compact]] refuse a used target and never rewrite
  * in place, which forces every deployment into the same dance: fold
  * into a fresh sibling, swap the readers over, retire the old layout.
  * A StoreRoot makes that dance atomic and addressable: the root
  * directory holds generation dirs `gen0, gen1, ...` and one
  * `_graft_manifest` naming the CURRENT generation; readers and
  * appenders address the root, and [[compactShard]]/[[compactVectors]]
  * fold the current generation into the next, swap the manifest (ONE
  * atomic rename — the commit point), and retire the predecessor.
  *
  * The version timeline is GLOBAL across generations. A fold carries
  * a `_graft_compacted_from` marker whose `max` is the retention
  * floor: the fresh generation's base IS the store's state as of that
  * version/batch, so
  *  - an append keyed at or below the floor is already folded in —
  *    the at-least-once re-delivery path ACROSS a compaction boundary
  *    ([[appendShard]]/[[appendVectors]] return false, exactly as
  *    [[StoreFiles.publishOnce]] skips re-delivery WITHIN a
  *    generation);
  *  - an `asOf` at the floor is served by the base alone, an `asOf`
  *    ABOVE it by base + retained deltas, and an `asOf` BELOW it
  *    fails loudly ([[readShard]]/[[readVectors]]) — pre-floor
  *    history exists nowhere, and serving the base as if it were an
  *    older version would be a silently wrong snapshot. The
  *    Delta-Lake-VACUUM contract, enforced rather than documented.
  *
  * Crash windows (each verb single-writer, as the stores require):
  * the fold commits BEFORE the swap (a crash between leaves a
  * committed-but-unreferenced next generation that the next
  * [[compactShard]] RESUMES if it still covers the source, or deletes
  * and redoes if appends landed after); the swap commits BEFORE the
  * retire (a crash between leaves an unretired predecessor the next
  * compaction sweeps). Readers never observe a partial state: the
  * manifest either names the old generation (fold invisible) or the
  * new one (fold complete, marker in place). */
object StoreRoot {

  /** Atomic pointer to the current generation: `gen=<n>`. */
  val ManifestName = "_graft_manifest"

  private def genDir(root: String, g: Long): java.io.File =
    new java.io.File(root, s"gen$g")

  /** Initialize a fresh root at generation 0 and return gen0's path —
    * the caller seeds it (the prior pack at v0 for a shard store, an
    * ivfPqSave for a vector index) exactly as it would seed an
    * unmanaged store dir. Refuses a root that already has a
    * manifest. */
  def init(root: String): String = {
    require(!new java.io.File(root, ManifestName).isFile,
      s"store root $root is already initialized")
    val g0 = genDir(root, 0L)
    g0.mkdirs()
    writeManifest(root, 0L)
    g0.getAbsolutePath
  }

  def currentGen(root: String): Long =
    StoreFiles.readMarker(new java.io.File(root, ManifestName))
      .getOrElse(throw new IllegalStateException(
        s"no $ManifestName under $root - not a managed store root"))
      .apply("gen").toLong

  /** The current generation's directory — what readers that want to
    * hold a pinned pre-swap view may capture explicitly (they keep
    * working until the NEXT compaction retires it). */
  def currentDir(root: String): String =
    genDir(root, currentGen(root)).getAbsolutePath

  /** The retention floor: the highest version/batch folded into the
    * current generation's base (None for a generation with no
    * compaction lineage — gen0). State at the floor is servable (it IS
    * the base); anything below is gone. Under windowed retention the
    * marker's `floor` sits below its `max` — the copied deltas between
    * them stay individually addressable by asOf. */
  def floor(root: String): Option[Long] = {
    val m = StoreFiles.readMarker(new java.io.File(currentDir(root),
      StoreFiles.CompactedFromMarker))
    m.map(mk => mk.getOrElse("floor", mk("max")).toLong)
  }

  /** The manifest swap — a temp-file write plus ONE atomic same-dir
    * rename, so a reader sees the old pointer or the new, never a
    * torn file. `private[graft]` so the crash-window specs can
    * reproduce a swap-without-retire state. */
  private[graft] def writeManifest(root: String, gen: Long): Unit = {
    new java.io.File(root).mkdirs()
    val tmp = new java.io.File(root, s".$ManifestName.tmp")
    StoreFiles.writeMarker(tmp, Seq(s"gen=$gen"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, ManifestName).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def requireAboveFloor(root: String, asOf: Option[Long],
                                what: String): Unit =
    for (v <- asOf; m <- floor(root))
      if (v < m) throw new IllegalStateException(
        s"$what at $root: asOf=$v is below the retention floor $m - " +
          "versions before the floor were folded away by compaction " +
          s"(the current generation's base serves the state AS OF $m); " +
          "history below the floor is beyond retention")

  // ---- shard store verbs through the root ----

  /** [[ShardSink.append]] against the current generation, with the
    * cross-generation re-delivery skip: a version at or below the
    * retention floor is already part of the base (the fold covered
    * it), so the append returns false instead of re-packing rows the
    * store already holds — without this, a trigger re-delivered
    * across a compaction boundary would double-append everything the
    * fold absorbed. */
  def appendShard(spark: SparkSession, root: String, batch: DataFrame,
                  idsCol: String, idCol: String, budget: Int,
                  shardCol: String, version: Long,
                  skewRobust: Boolean = false): Boolean =
    if (floor(root).exists(version <= _)) false
    else ShardSink.append(spark, batch, idsCol, idCol, budget, shardCol,
      currentDir(root), version = Some(version), skewRobust = skewRobust)

  /** [[ShardSink.read]] against the current generation; `asOf` below
    * the retention floor fails loudly (see the class doc). */
  def readShard(spark: SparkSession, root: String,
                shardCol: String = "source",
                asOf: Option[Long] = None): DataFrame = {
    requireAboveFloor(root, asOf, "shard store")
    ShardSink.read(spark, currentDir(root), shardCol, asOf)
  }

  /** Fold the current shard generation into the next, swap, retire the
    * predecessor. No-op (false) when the generation holds nothing
    * beyond its base and the retention window — nothing to fold, which
    * also makes a re-delivered compaction trigger idempotent. `keep` >
    * 0 is windowed retention (see [[ShardSink.compact]]): the newest K
    * delta versions ride into the new generation verbatim, so a
    * trailing asOf window survives every cycle. */
  def compactShard(spark: SparkSession, root: String,
                   shardCol: String = "source",
                   keep: Int = 0): Boolean =
    compactAndSwap(root,
      latest = d => ShardSink.latestVersion(d),
      hasDebt = d => ShardSink.versionCount(d) > keep + 1,
      fold = (c, n) => ShardSink.compact(spark, c, n, shardCol, keep),
      retireVerb = (c, n) => ShardSink.retire(c, n))

  // ---- vector index verbs through the root ----

  /** [[VectorIndexSink.appendBatch]] against the current generation,
    * with the same cross-generation re-delivery skip as
    * [[appendShard]]. */
  def appendVectors(spark: SparkSession, root: String, batchId: Long,
                    batch: DataFrame, vecCol: String = "embedding",
                    idCol: String = "vec_id"): Boolean =
    if (floor(root).exists(batchId <= _)) false
    else VectorIndexSink.appendBatch(spark, currentDir(root), batchId,
      batch, vecCol, idCol)

  /** [[VectorIndexSink.deleteBatch]] through the root: a tombstone at
    * or below the floor was already made physical by the fold. */
  def deleteVectors(spark: SparkSession, root: String, batchId: Long,
                    ids: DataFrame, idCol: String = "vec_id"): Boolean =
    if (floor(root).exists(batchId <= _)) false
    else VectorIndexSink.deleteBatch(spark, currentDir(root), batchId,
      ids, idCol)

  /** [[VectorIndexSink.read]] against the current generation; `asOf`
    * below the retention floor fails loudly. */
  def readVectors(spark: SparkSession, root: String,
                  idCol: String = "vec_id",
                  asOf: Option[Long] = None): Similarity.IvfPqIndex = {
    requireAboveFloor(root, asOf, "vector index")
    VectorIndexSink.read(spark, currentDir(root), idCol, asOf)
  }

  /** Fold the current index generation (base + deltas − tombstones)
    * into the next, swap, retire the predecessor. No-op (false) when
    * nothing has landed beyond the base and the retention window.
    * `keep` > 0 is windowed retention (see [[VectorIndexSink.compact]]):
    * the newest K batch arms ride into the new generation verbatim. */
  def compactVectors(spark: SparkSession, root: String,
                     keep: Int = 0,
                     idCol: String = "vec_id"): Boolean =
    compactAndSwap(root,
      latest = d => VectorIndexSink.latestBatch(d),
      hasDebt = d => VectorIndexSink.batchCount(d) > keep,
      fold = (c, n) => VectorIndexSink.compact(spark, c, n, keep, idCol),
      retireVerb = (c, n) => VectorIndexSink.retire(c, n))

  // ---- the shared compact-swap-retire state machine ----

  private def compactAndSwap(root: String,
                             latest: String => Option[Long],
                             hasDebt: String => Boolean,
                             fold: (String, String) => Unit,
                             retireVerb: (String, String) => Unit)
      : Boolean = {
    val g = currentGen(root)
    val cur = genDir(root, g)
    // heal a crash between a previous swap and its retire: the
    // predecessor is still on disk unretired — retire it now (its
    // successor is exactly `cur`, whose lineage marker beginRetire
    // validates before anything is deleted)
    val prev = genDir(root, g - 1)
    if (g > 0 && prev.isDirectory
        && StoreFiles.retiredTo(prev.getAbsolutePath).isEmpty)
      retireVerb(prev.getAbsolutePath, cur.getAbsolutePath)
    if (!hasDebt(cur.getAbsolutePath)) return false
    val next = genDir(root, g + 1)
    StoreFiles.readMarker(
        new java.io.File(next, StoreFiles.CompactedFromMarker)) match {
      case Some(m) =>
        // a committed fold from a crashed earlier attempt (the marker
        // is written last, so its presence means the fold is whole):
        // resume it if it still covers everything in the source,
        // otherwise appends landed after the crash - redo the fold
        val covers = m.get("src").contains(cur.getCanonicalPath) &&
          latest(cur.getAbsolutePath).forall(_ <= m("max").toLong)
        if (!covers) {
          StoreFiles.deleteRec(next)
          fold(cur.getAbsolutePath, next.getAbsolutePath)
        }
      case None =>
        // no marker: either nothing there, or a fold that crashed
        // mid-write - sweep and redo (the fold verbs refuse a used
        // target, so a partial next MUST be cleared first)
        if (next.exists()) StoreFiles.deleteRec(next)
        fold(cur.getAbsolutePath, next.getAbsolutePath)
    }
    writeManifest(root, g + 1) // the commit point - readers swap here
    retireVerb(cur.getAbsolutePath, next.getAbsolutePath)
    true
  }
}
