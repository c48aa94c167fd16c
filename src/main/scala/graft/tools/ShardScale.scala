package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.operators.Curate
import graft.streaming.ShardSink

/** Once-per-round shard-store scale-evidence run — the ANN_SCALE
  * discipline applied to the OTHER delta store. ANN_SCALE.json measures
  * the vector index's verb set at n = 10^6 vectors; the shard store's
  * O(batch) claims ("a 1% crawl drop writes 1%, not 100%"; read's
  * latest-wins merge touches narrow columns only) have so far rested on
  * sf0.1 fixture scale (~60k docs). This main measures the COMPLETE
  * shard-store verb set — seed pack, two 1% crawl-drop appends, merged
  * read, asOf snapshot, describe, compact, retire — at n = 100k and
  * n = 10^6 synthetic tokenized documents, with every correctness
  * contract verified IN-RUN at that scale, and writes SHARD_SCALE.json,
  * the committed artifact SURVEY quotes.
  *
  * Deliberately NOT a bench row (the 1M seed pack alone would dominate
  * the suite); same rationale as [[AnnScale]].
  *
  * Corpus: deterministic, seeded by doc_id alone (reproduces
  * bit-for-bit): 200 round-robin shards — every 1% drop touches every
  * shard, the worst case for the per-shard tail top-up — and per-doc
  * token ids of pseudo-random length 20..100 (avg ~60) from pure
  * codegen'd column functions (no UDFs, no RNG state).
  *
  * Contracts verified at scale (each a `require`, not a log line):
  *  - merged read == one-shot [[Curate.packTokenIds]] of the full
  *    corpus (q157's corpus-wide equivalence, at 16x fixture scale),
  *    via an order-independent digest over
  *    md5(shard|seq_id|n_tokens|ids);
  *  - `asOf = v1` == one-shot pack of exactly base + first drop
  *    (q166's snapshot contract);
  *  - compacted store == merged view (q164's fold contract);
  *  - retired store fails loudly; the successor still serves the
  *    identical digest (q169's retention floor).
  * Usage: runMain graft.tools.ShardScale [maxN] [outFile] */
object ShardScale {

  /** Deterministic synthetic tokenized corpus, ids in [0, n). */
  private[graft] def synthDocs(spark: SparkSession, n: Long,
                               nShards: Int): DataFrame = {
    val h = pmod(col("doc_id") * lit(2654435761L), lit(1000003L))
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("source",
        concat(lit("src"),
          pmod(col("doc_id"), lit(nShards.toLong)).cast("string")))
      .withColumn("__len", (lit(20) + pmod(h, lit(81))).cast("int"))
      .withColumn("__ids",
        transform(sequence(lit(0), col("__len") - 1),
          i => pmod(col("doc_id") * 40503L + i.cast("long") * 69069L,
            lit(50257L)).cast("int")))
      .drop("__len")
  }

  /** Order-independent store digest: (rows, token mass, wrapping sum of
    * a 60-bit md5 prefix over the full row identity). Both sides of
    * every equality are computed by this same function in this same
    * session, so the wrapping long sum is a sound equality check. */
  private def digest(df: DataFrame): (Long, Long, Long) = {
    val r = df.select(
        conv(substring(md5(concat_ws("|", col("source"),
          col("seq_id").cast("string"), col("n_tokens").cast("string"),
          Bpe.idsString(col("token_ids")))), 1, 15),
          16, 10).cast("long").as("__h"),
        col("n_tokens").cast("long").as("__nt"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__nt")).cast("long").as("t"),
        sum(col("__h")).cast("long").as("h"))
      .collect()(0)
    (r.getAs[Long]("n"), r.getAs[Long]("t"), r.getAs[Long]("h"))
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toLong).getOrElse(1000000L)
    val out = args.lift(1).getOrElse("SHARD_SCALE.json")
    // single-shot verb walls at n=1M swing several-fold run-to-run on
    // this shared host (GC pressure from the corpus checkpoint lands on
    // whichever verb is executing) — the bench protocol's answer,
    // min-over-N, applied per metric: the whole per-scale block runs N
    // times (contracts REQUIRED every time), the artifact records each
    // metric's minimum
    val scaleRuns =
      sys.env.get("SPARK_GRAFT_SCALE_RUNS").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.driver.memory", "48g")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nShards = 200
    val budget = 2048
    val rows = Seq(100000L, 1000000L).filter(_ <= maxN).map { n =>
      val per = (1 to scaleRuns).map { _ =>
        measureOnce(spark, n, nShards, budget) }
      val ident = per.map(_._1).distinct
      require(ident.size == 1,
        s"non-deterministic corpus at n=$n: $ident")
      val (nSeqs, nTokens) = ident.head
      val m: Map[String, Double] = per.head._2.keys
        .map(k => k -> per.map(_._2(k)).min).toMap
      val dropN = n / 100
      println(f"[shardscale] n=$n (min over $scaleRuns) " +
        f"tokens=$nTokens seqs=$nSeqs " +
        m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2fs" }
          .mkString(" "))
      f"""{"n":$n,"drop_docs":$dropN,"n_shards":$nShards,""" +
        f""""budget":$budget,"runs":$scaleRuns,"n_sequences":$nSeqs,""" +
        f""""n_tokens":$nTokens,"seed_pack_s":${m("seed")}%.2f,""" +
        f""""append_1pct_s":${m("append1")}%.2f,""" +
        f""""append2_1pct_s":${m("append2")}%.2f,""" +
        f""""append_vs_seed":${m("append1") / m("seed")}%.3f,""" +
        f""""merged_digest_s":${m("merged_digest")}%.2f,""" +
        f""""asof_digest_s":${m("asof_digest")}%.2f,""" +
        f""""describe_s":${m("describe")}%.2f,""" +
        f""""compact_s":${m("compact")}%.2f,""" +
        f""""compacted_digest_s":${m("compacted_digest")}%.2f,""" +
        f""""retire_s":${m("retire")}%.2f,""" +
        f""""root_append_s":${m("root_append")}%.2f,""" +
        f""""root_cycle_s":${m("root_cycle")}%.2f,""" +
        f""""merged_equals_oneshot":true,"asof_equals_prefix_pack":true,""" +
        f""""compacted_equals_merged":true,"retired_read_fails":true,""" +
        f""""root_cycle_preserves":true}"""
    }
    val json = s"""{"recipe":"ShardSink append/read/asOf/describe/""" +
      s"""compact/retire over synthDocs","runs":[${rows.mkString(",")}]}\n"""
    Files.writeString(Paths.get(out), json)
    println(s"[shardscale] wrote ${rows.size} runs to $out")
    spark.stop()
  }

  /** One full per-scale measurement block: every verb timed once,
    * every contract `require`d. Returns ((n_sequences, n_tokens),
    * per-metric walls). */
  private def measureOnce(spark: SparkSession, n: Long, nShards: Int,
                          budget: Int)
      : ((Long, Long), Map[String, Double]) = {
      val dropN = n / 100 // each crawl drop is 1% of the base corpus
      val all = synthDocs(spark, n + 2 * dropN, nShards)
        .localCheckpoint(true)
      val dir = Files.createTempDirectory("graft_shardscale_")
      try {
        val base = all.filter(col("doc_id") < n)
        val drop1 = all.filter(col("doc_id") >= n
          && col("doc_id") < n + dropN)
        val drop2 = all.filter(col("doc_id") >= n + dropN)
        val store = s"$dir/store"
        val (_, seedS) = timed(ShardSink.append(spark, base, "__ids",
          "doc_id", budget, "source", store))
        val (_, app1S) = timed(ShardSink.append(spark, drop1, "__ids",
          "doc_id", budget, "source", store))
        val (_, app2S) = timed(ShardSink.append(spark, drop2, "__ids",
          "doc_id", budget, "source", store))
        // q157's equivalence at scale: id-ordered drops => the merged
        // delta view equals the one-shot pack of the whole corpus
        val (mergedD, mergedS) =
          timed(digest(ShardSink.read(spark, store)))
        val oneShot = digest(Curate.packTokenIds(all, "__ids", "doc_id",
          budget, "source"))
        require(mergedD == oneShot,
          s"merged view != one-shot pack at n=$n: $mergedD vs $oneShot")
        // q166's snapshot contract: asOf v1 == pack of base + drop1
        val (asOfD, asOfS) =
          timed(digest(ShardSink.read(spark, store, asOf = Some(1L))))
        val prefix = digest(Curate.packTokenIds(
          all.filter(col("doc_id") < n + dropN), "__ids", "doc_id",
          budget, "source"))
        require(asOfD == prefix,
          s"asOf(v1) != prefix pack at n=$n: $asOfD vs $prefix")
        val (dRows, descS) = timed(
          ShardSink.describe(spark, store).collect())
        require(dRows.length == 3, s"describe rows: ${dRows.length}")
        // q164's fold + q169's retention floor, timed at scale
        val (_, compS) = timed(
          ShardSink.compact(spark, store, s"$dir/c"))
        val (compD, compReadS) =
          timed(digest(ShardSink.read(spark, s"$dir/c")))
        require(compD == mergedD,
          s"compacted != merged at n=$n: $compD vs $mergedD")
        val (_, retS) = timed(ShardSink.retire(store, s"$dir/c"))
        val retiredLoud =
          try { ShardSink.read(spark, store); false }
          catch { case e: IllegalStateException =>
            e.getMessage.contains("retired") }
        require(retiredLoud, "retired store must fail loudly")
        require(digest(ShardSink.read(spark, s"$dir/c")) == mergedD,
          "survivor digest changed after retire")
        // the managed-root layer at scale: adopt the survivor as gen0
        // of a root, land one more 1% drop through the root, then time
        // ONE full fold-swap-retire cycle (StoreRoot.compactShard) —
        // the manifest layer should add only rename-time overhead over
        // the raw compact+retire measured above
        val root = s"$dir/root"
        new java.io.File(root).mkdirs()
        Files.move(Paths.get(s"$dir/c"), Paths.get(s"$root/gen0"))
        graft.streaming.StoreRoot.writeManifest(root, 0L)
        val drop3 = synthDocs(spark, n + 3 * dropN, nShards)
          .filter(col("doc_id") >= n + 2 * dropN)
        val (_, rAppS) = timed(graft.streaming.StoreRoot.appendShard(
          spark, root, drop3, "__ids", "doc_id", budget, "source",
          version = 3L))
        val d3 = digest(graft.streaming.StoreRoot.readShard(spark, root))
        val (_, rCycS) = timed(
          graft.streaming.StoreRoot.compactShard(spark, root))
        require(graft.streaming.StoreRoot.currentGen(root) == 1L
            && graft.streaming.StoreRoot.floor(root).contains(3L),
          "root cycle should land on generation 1 with floor v3")
        require(graft.streaming.StoreFiles.retiredTo(s"$root/gen0")
          .isDefined, "root cycle should retire gen0")
        require(digest(graft.streaming.StoreRoot.readShard(spark, root))
            == d3, s"root cycle moved the store view at n=$n")
        ((mergedD._1, mergedD._2), Map(
          "seed" -> seedS, "append1" -> app1S, "append2" -> app2S,
          "merged_digest" -> mergedS, "asof_digest" -> asOfS,
          "describe" -> descS, "compact" -> compS,
          "compacted_digest" -> compReadS, "retire" -> retS,
          "root_append" -> rAppS, "root_cycle" -> rCycS))
      } finally {
        org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(all)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir.toFile)
      }
  }
}
