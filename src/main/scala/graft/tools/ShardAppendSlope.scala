package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeByteVocab}
import graft.streaming.ShardSink

/** Isolates [[graft.streaming.ShardSink.append]]'s cost as a function
  * of committed version count — the microscope for the refresh drain's
  * per-trigger slope (REFRESH_SLOPE48.json showed the shard stage
  * growing 3.1 -> 7.2 s across 48 un-compacted triggers while every
  * other stage stayed flat; this tool reproduces JUST the append loop
  * and splits each append into its component jobs so the growth term
  * is attributable, not guessed).
  *
  * Per append it times: the merged-read + audit collect (narrow
  * columns), the partial-tail payload fetch, and the delta pack +
  * write, by running the same sub-plans `append` runs. Output: one
  * JSON line per append to stdout and SHARD_APPEND_SLOPE.json with the
  * per-append vectors.
  *
  * Usage: runMain graft.tools.ShardAppendSlope [appends] [docsPer] */
object ShardAppendSlope {

  def main(args: Array[String]): Unit = {
    val appends = args.headOption.map(_.toInt).getOrElse(48)
    val docsPer = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.driver.memory", "48g")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("graft_appendslope_")
    val store = s"$base/store"
    def docs(lo: Long, n: Long) = RefreshScale
      .streamDocs(spark, lo, n, n)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("__ids",
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      .localCheckpoint(true)
    // seed: v0 from a 50k-doc prior-sized pack (the drain's shape)
    val seed = docs(0L, 50000L)
    ShardSink.append(spark, seed, "__ids", "doc_id", budget = 2048,
      shardCol = "source", storeDir = store)
    val walls = (0 until appends).map { i =>
      val b = docs(50000L + i * docsPer, docsPer)
      // sub-plan timings against the CURRENT store, mirroring append's
      // phases (read+audit / write) without publishing
      val t0 = System.nanoTime()
      val merged = ShardSink.read(spark, store, "source")
      val auditRows = merged
        .select(col("source"), col("seq_id"), col("n_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)), max(col("seq_id")), max(col("n_tokens")))
        .collect().length
      val tAudit = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      ShardSink.append(spark, b, "__ids", "doc_id", budget = 2048,
        shardCol = "source", storeDir = store)
      val tAppend = (System.nanoTime() - t1) / 1e9
      println(f"[appendslope] v=${i + 1} audit_probe=$tAudit%.2fs " +
        f"(shards=$auditRows) append=$tAppend%.2fs")
      (tAudit, tAppend)
    }
    val json =
      s"""{"recipe":"ShardSink.append cost vs committed version """ +
        s"""count: seed 50k docs, then $appends appends of $docsPer """ +
        s"""docs; audit_probe_s times the merged-read narrow """ +
        s"""aggregation alone, append_s the full append (read + """ +
        s"""audit + partial fetch + delta pack + publish)",""" +
        s""""appends":$appends,"docs_per":$docsPer,""" +
        s""""audit_probe_s":[${walls.map(w => f"${w._1}%.2f")
          .mkString(",")}],""" +
        s""""append_s":[${walls.map(w => f"${w._2}%.2f")
          .mkString(",")}]}""" + "\n"
    Files.writeString(Paths.get("SHARD_APPEND_SLOPE.json"), json)
    println("[appendslope] wrote SHARD_APPEND_SLOPE.json")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(base.toFile)
    spark.stop()
  }
}
