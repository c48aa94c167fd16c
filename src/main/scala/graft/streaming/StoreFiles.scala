package graft.streaming

/** Shared filesystem plumbing for the delta stores (ShardSink,
  * VectorIndexSink): recursive delete, published-directory listing, and
  * the stage-then-atomic-rename publish that both sinks' atomicity
  * contracts rest on. One implementation so a fix to commit semantics
  * lands everywhere at once. */
private[streaming] object StoreFiles {

  def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
  }

  /** Committed directories under `parent` named `<prefix><digits>`,
    * ascending by number, keeping only those satisfying `nonEmpty` on
    * their children (a crash can never leave a half-committed dir —
    * publish is a rename — but an EMPTY commit, e.g. an empty
    * micro-batch's delta, carries no parquet schema and must not reach
    * a reader). */
  def publishedDirs(parent: String, prefix: String,
                    nonEmpty: java.io.File => Boolean): Seq[(Long, java.io.File)] =
    Option(new java.io.File(parent).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix)
        && f.getName.drop(prefix.length).matches("\\d+")
        && nonEmpty(f))
      .map(f => f.getName.drop(prefix.length).toLong -> f)
      .sortBy(_._1).toSeq

  def hasParquet(dir: java.io.File): Boolean =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.endsWith(".parquet"))

  def hasListPartitions(dir: java.io.File): Boolean =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.startsWith("__list="))

  /** Publish `write`'s output at `dst` via stage + single atomic
    * rename; returns false without writing if `dst` is already
    * published (the batchId-keyed exactly-once skip — `foreachBatch`
    * is at-least-once, so a re-delivered batch must find its commit
    * and do nothing). Stale staging from a crashed attempt is swept
    * first; the rename is the commit point, so a reader never
    * observes a partially-written published directory. */
  def publishOnce(stagingPath: String, dst: java.io.File,
                  write: String => Unit): Boolean = {
    if (dst.exists()) return false
    val staging = new java.io.File(stagingPath)
    deleteRec(staging)
    write(staging.getAbsolutePath)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.move(staging.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    true
  }
}
