package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sized parquet output — the small-files guard every long-running
  * ingest needs at scale. A 1000-executor job that writes one file per
  * task per micro-batch produces millions of kilobyte files; every
  * later scan then pays per-file open/footer costs that dwarf the read
  * itself, and the namenode/listing layer pays the rest. The fix is the
  * same everywhere: rewrite N input files into ceil(rows/target) evenly
  * sized outputs.
  *
  * Scale shape: `writeSized` costs ONE round-robin repartition (no key,
  * no sort — the cheapest possible exchange) sized from a count job;
  * `maxRecordsPerFile` backstops the target so stragglers cannot exceed
  * it. Pre-clustered data (e.g. [[graft.operators.Curate.zorderLayout]])
  * should instead be written directly — its range partitioning IS the
  * file sizing — so `writeSized` deliberately takes the unclustered
  * path only. */
object FileSink {

  /** Write `df` as ~ceil(rows/targetRowsPerFile) parquet files under
    * `path`, none exceeding the target. Round-robin spreads each input
    * partition independently, so output partitions can run over the
    * target by up to one row per input partition; `maxRecordsPerFile`
    * hard-caps those stragglers (a few extra near-target files, never an
    * oversized one). Returns the row count written. */
  def writeSized(df: DataFrame, path: String,
                 targetRowsPerFile: Long): Long = {
    graft.streaming.StoreFiles.requireNotRetired(path, "parquet dir")
    require(targetRowsPerFile >= 1,
      s"targetRowsPerFile must be >= 1: $targetRowsPerFile")
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
      .min(Int.MaxValue.toLong).toInt
    df.repartition(files)
      .write.option("maxRecordsPerFile", targetRowsPerFile)
      .mode("overwrite").parquet(path)
    n
  }

  /** Compact an existing parquet directory into evenly sized files at
    * `outPath`. Returns (dataFilesBefore, dataFilesAfter, rows) — the
    * audit line an operational compactor logs. Never rewrites in place:
    * the swap (rename/retarget) is the caller's transactional step. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetRowsPerFile: Long): (Long, Long, Long) = {
    graft.streaming.StoreFiles.requireNotRetired(inPath, "parquet dir")
    val before = countDataFiles(spark, inPath)
    val rows = writeSized(spark.read.parquet(inPath), outPath,
      targetRowsPerFile)
    // lineage marker AFTER the rewrite commits — [[retire]]'s
    // precondition, the same `_graft_compacted_from` discipline as the
    // delta stores; `max` records the row count folded, which is what
    // retire's coverage check compares against (an append-only dir
    // that grew past the fold must be recompacted, not destroyed)
    graft.streaming.StoreFiles.writeCompactedFrom(outPath, inPath, rows)
    (before, countDataFiles(spark, outPath), rows)
  }

  /** Retention for the generic compactor — the delta stores'
    * [[graft.streaming.ShardSink.retire]] contract on a plain parquet
    * directory: delete the PRE-COMPACTION dir only when `compactedTo`
    * carries a [[compact]] lineage marker naming it AND the dir has not
    * grown past the fold (current row count vs the marker's recorded
    * count — append-only dirs only grow, so growth means data the fold
    * never saw). The `_graft_retired` tombstone is written before the
    * payload sweep and outlives it, so [[writeSized]]/[[compact]]/
    * [[countDataFiles]] against the retired path fail loudly naming
    * the successor; a raw `spark.read.parquet` finds no data files
    * (schema-inference failure), never a partial view. */
  def retire(spark: SparkSession, inPath: String,
             compactedTo: String): Unit = {
    graft.streaming.StoreFiles.beginRetire(inPath, compactedTo,
      Some(spark.read.parquet(inPath).count()))
    graft.streaming.StoreFiles.deletePayload(inPath)
  }

  /** Parquet data files under `path` (any Hadoop-visible scheme),
    * excluding _SUCCESS/metadata/hidden entries. */
  def countDataFiles(spark: SparkSession, path: String): Long = {
    graft.streaming.StoreFiles.requireNotRetired(path, "parquet dir")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
          n += 1
      }
      n
    }
  }
  /** Dynamic-partition overwrite: rewrite ONLY the partitions present in
    * `df`, leaving all other partitions of the target untouched — the
    * parquet-side idempotent daily load (re-running a day's batch
    * replaces that day, never truncates the table; the file analogue of
    * the JDBC SCD paths). Uses Spark's `partitionOverwriteMode=dynamic`
    * scoped to this write and restored after. Returns the distinct
    * partition values written. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCol: String): Seq[String] = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    df.select(partitionCol).distinct()
      .collect().map(r => String.valueOf(r.get(0))).toSeq.sorted
  }
}
