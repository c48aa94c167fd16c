package graft.tools

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeByteVocab}
import graft.operators.{Dedup, Similarity}
import graft.streaming.{RefreshPipeline, ShardSink, VectorIndexSink}

/** Real crash injection for the refresh chain. The pipeline's crash
  * windows are PROVEN by constructed poisoned states (rolled-back
  * commits, pre-published ledgers — RefreshPipelineSpec,
  * StoreRootSpec); those prove the windows we thought of. This harness
  * finds the ones we didn't: it runs the full cross-store drain
  * ([[RefreshPipeline.run]]: exact/near/decontam tiers, BPE pack,
  * shard store, vector index, fingerprint ledger, streaming
  * checkpoint) in a SEPARATE JVM and SIGKILLs it at a randomized point
  * of the drain, then heals in a second session (q174's two-session
  * shape: same stores, same checkpoint) and gates the final state on
  * the one-shot batch chain's oracle — equivalence of the served id
  * set, shard-store token mass, and the ledger fingerprint set
  * (RefreshScale's contracts, verbatim).
  *
  * Kill points are stratified across the drain window (plus seeded
  * jitter), so across `kills` iterations the SIGKILL lands in every
  * stage of the store -> index -> ledger -> checkpoint sequence, not
  * just wherever a uniform draw clusters. A kill that lands after the
  * child finished is recorded (interrupted=false) but still gated —
  * the harness requires that at least half the kills actually
  * interrupted the drain, or the evidence is vacuous.
  *
  * Child JVM: plain `java` against the compiled classes + the Spark
  * jars (the same --add-opens set build.sbt forks with), its Spark
  * scratch under the iteration dir so a kill never litters /tmp.
  *
  * Usage: runMain graft.tools.CrashHarness [kills] [outFile]
  *        runMain graft.tools.CrashHarness child <base> <prior> <triggers> <batchRows>
  */
object CrashHarness {

  final case class KillReport(kill: Int, killAfterMs: Long,
                              interrupted: Boolean, childExit: Int,
                              healDrainS: Double, equivalence: Boolean,
                              mass: Boolean, ledger: Boolean)

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Stage one iteration's fixtures under `base`: seeded stores (v0
    * pack + IVF-PQ base) and the id-ordered per-trigger doc files the
    * child will stream. Also computes the one-shot oracle digests the
    * heal is gated on. Returns (expected-id digest, expected mass,
    * expected ledger digest). */
  private def stage(spark: SparkSession, base: Path, prior: Long,
                    triggers: Int, batchRows: Long)
      : ((Long, Long), Long, (Long, Long)) = {
    val d = RefreshScale.priorDocs(spark, prior).localCheckpoint(true)
    val bench = RefreshScale.benchDocs(spark).localCheckpoint(true)
    val n = triggers * batchRows
    val all = RefreshScale.streamDocs(spark, prior, n, batchRows)
      .localCheckpoint(true)
    try {
      ShardSink.append(spark,
        d.withColumn("__ids",
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges)),
        "__ids", "doc_id", budget = 2048, shardCol = "source",
        storeDir = s"$base/store")
      Similarity.ivfPqSave(
        Similarity.ivfPqBuild(d.withColumn("embedding", RefreshScale.emb),
          vecCol = "embedding", idCol = "doc_id", nLists = 4, m = 4,
          kCodes = 8, iterations = 2),
        s"$base/ix")
      (0 until triggers).foreach { t =>
        val tmp = s"$base/tmp-$t"
        all.filter(col("__u") >= t * batchRows &&
            col("__u") < (t + 1) * batchRows)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("embedding", RefreshScale.emb)
          .coalesce(1).write.parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(s"$base/docs/d$t.parquet")
        dst.getParentFile.mkdirs()
        Files.move(f.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + t * 60000L)
        ()
      }
      // the one-shot batch chain — the heal's oracle
      val expected = Dedup.ngramDecontaminate(
          Dedup.nearIncremental(
            Dedup.exactIncremental(all.select(col("doc_id"),
              col("source"), col("text")), d, "text", "doc_id"),
            d, "text", "doc_id", numHashes = 32, bands = 8,
            threshold = 0.8, mode = Dedup.Portable),
          bench, "text", "doc_id", n = 5, minMatches = 2)
        .filter(!col("contaminated"))
        .select(col("doc_id"), col("text"))
        .localCheckpoint(true)
      try {
        val mass = (df: DataFrame) => df.select(
            size(Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
              .cast("long").as("__m"))
          .agg(coalesce(sum(col("__m")), lit(0L)))
          .collect()(0).getLong(0)
        (RefreshScale.setDigest(expected, col("doc_id")),
          mass(d) + mass(expected),
          RefreshScale.setDigest(expected,
            graft.functions.TextFunctions.fingerprint(col("text"))))
      } finally org.apache.spark.sql.graftglue.GraftGlue
        .releaseCheckpoint(expected)
    } finally {
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(bench)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(all)
    }
  }

  /** CHILD entry: drain until killed. Prints `drain-start` so the
    * parent can time its SIGKILL inside the drain window. */
  private def childMain(base: String, prior: Long, triggers: Int,
                        batchRows: Long): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$base/child-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = RefreshScale.priorDocs(spark, prior).localCheckpoint(true)
    val bench = RefreshScale.benchDocs(spark).localCheckpoint(true)
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$base/docs").schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$base/docs")
    println("[crash-child] drain-start")
    System.out.flush()
    RefreshPipeline.run(stream, d, bench,
      storeDir = s"$base/store", ledgerDir = s"$base/ledger",
      checkpointDir = s"$base/ck", indexDir = Some(s"$base/ix"))
    println("[crash-child] drain-done")
    System.out.flush()
    spark.stop()
  }

  /** One kill iteration: stage fresh fixtures, spawn the child, wait
    * for its drain-start marker, SIGKILL after `killAfterMs`, heal in
    * THIS session, gate on the staged oracle. */
  def runOnce(spark: SparkSession, kill: Int, killAfterMs: Long,
              prior: Long, triggers: Int, batchRows: Long): KillReport = {
    val base = Files.createTempDirectory(s"graft_crash_$kill-")
    try {
      val (expIds, expMass, expLedger) =
        stage(spark, base, prior, triggers, batchRows)
      val classesDir = sys.props.get("graft.crash.classes")
        .getOrElse("target/scala-2.13/classes")
      val cmd = (Seq("java") ++ AddOpens ++ Seq("-Xmx8g",
        "-cp", s"$classesDir:/opt/spark/jars/*",
        "graft.tools.CrashHarness", "child", base.toString,
        prior.toString, triggers.toString, batchRows.toString))
      val log = new java.io.File(s"$base/child.log")
      val p = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(log)
        .start()
      // wait for the drain to actually begin (child JVM + session
      // startup is tens of seconds and must not eat the kill window)
      val startDeadline = System.nanoTime() + 180e9.toLong
      var started = false
      while (!started && p.isAlive && System.nanoTime() < startDeadline) {
        Thread.sleep(50)
        started = log.exists() &&
          new String(Files.readAllBytes(log.toPath))
            .contains("drain-start")
      }
      Thread.sleep(killAfterMs)
      val interrupted = p.isAlive
      p.destroyForcibly()
      val childExit = { p.waitFor(); p.exitValue() }
      // HEAL: second session (this one), same stores, same checkpoint
      val tHeal = System.nanoTime()
      val d = RefreshScale.priorDocs(spark, prior)
      val bench = RefreshScale.benchDocs(spark)
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$base/docs").schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(s"$base/docs")
      RefreshPipeline.run(stream, d, bench,
        storeDir = s"$base/store", ledgerDir = s"$base/ledger",
        checkpointDir = s"$base/ck", indexDir = Some(s"$base/ix"))
      val healS = (System.nanoTime() - tHeal) / 1e9
      // the q174 oracle gates
      val served = VectorIndexSink.read(spark, s"$base/ix",
          idCol = "doc_id")
        .encoded.select(col("doc_id")).filter(col("doc_id") >= prior)
      val equivalence =
        RefreshScale.setDigest(served, col("doc_id")) == expIds
      val storeTokens = ShardSink.read(spark, s"$base/store")
        .agg(sum(col("n_tokens").cast("long"))).collect()(0).getLong(0)
      val ledger = spark.read.parquet(
        RefreshPipeline.ledgerLeafPaths(
          graft.streaming.StoreFiles.publishedDirs(s"$base/ledger", "b",
            graft.streaming.StoreFiles.hasLedgerParquet).map(_._2),
          None): _*)
      val ledgerOk =
        RefreshScale.setDigest(ledger, col("__pfp")) == expLedger
      KillReport(kill, killAfterMs, interrupted, childExit, healS,
        equivalence, storeTokens == expMass, ledgerOk)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base.toFile)
    }
  }

  /** Stratified kill offsets across [0, windowMs), seeded jitter. */
  private[graft] def killOffsets(kills: Int, windowMs: Long,
                                 seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until kills).map { i =>
      val lo = windowMs * i / kills
      val hi = windowMs * (i + 1) / kills
      lo + (rnd.nextDouble() * (hi - lo)).toLong
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("child")) {
      childMain(args(1), args(2).toLong, args(3).toInt, args(4).toLong)
      return
    }
    val kills = args.headOption.map(_.toInt).getOrElse(8)
    val out = args.lift(1).getOrElse("CRASH_HARNESS.json")
    val (prior, triggers, batchRows) = (2000L, 8, 400L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.driver.memory", "48g")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the kill window spans the child's expected drain wall; stratified
    // offsets walk it start to end so every stage of the
    // store -> index -> ledger -> checkpoint sequence gets hit
    val windowMs = sys.env.get("GRAFT_CRASH_WINDOW_MS")
      .map(_.toLong).getOrElse(30000L)
    val reports = killOffsets(kills, windowMs, seed = 13L)
      .zipWithIndex.map { case (off, i) =>
        val r = runOnce(spark, i, off, prior, triggers, batchRows)
        println(f"[crash] kill=$i afterMs=$off interrupted=" +
          f"${r.interrupted} exit=${r.childExit} heal=${r.healDrainS}%.1fs " +
          f"eq=${r.equivalence} mass=${r.mass} ledger=${r.ledger}")
        require(r.equivalence && r.mass && r.ledger,
          s"heal diverged from the one-shot oracle at kill $i " +
            s"(afterMs=$off interrupted=${r.interrupted})")
        r
      }
    val nInterrupted = reports.count(_.interrupted)
    require(nInterrupted * 2 >= kills,
      s"only $nInterrupted/$kills kills interrupted the drain - " +
        "widen GRAFT_CRASH_WINDOW_MS or the evidence is vacuous")
    val rows = reports.map(r =>
      s"""{"kill":${r.kill},"kill_after_ms":${r.killAfterMs},""" +
        s""""interrupted":${r.interrupted},"child_exit":${r.childExit},""" +
        f""""heal_drain_s":${r.healDrainS}%.1f,""" +
        s""""equivalence":${r.equivalence},"mass":${r.mass},""" +
        s""""ledger":${r.ledger}}""")
    val json = s"""{"recipe":"SIGKILL a separate-JVM refresh drain at """ +
      s"""stratified offsets, heal in a second session, gate on the """ +
      s"""one-shot oracle (q174 shape)","kills":$kills,""" +
      s""""prior":$prior,"triggers":$triggers,"batch_rows":$batchRows,""" +
      s""""window_ms":$windowMs,"interrupted":$nInterrupted,""" +
      s""""all_heals_match_oracle":true,""" +
      s""""reports":[${rows.mkString(",")}]}\n"""
    Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[crash] wrote $out ($nInterrupted/$kills interrupted, " +
      "all heals == oracle)")
    spark.stop()
  }
}
