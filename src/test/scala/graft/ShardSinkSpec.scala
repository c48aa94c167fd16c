package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeByteVocab}
import graft.operators.Curate
import graft.streaming.ShardSink

/** Streaming shard store: per-batch incremental appends through the real
  * micro-batch engine compose to the one-shot pack, shipped sequences
  * stay bit-stable across store versions. */
class ShardSinkSpec extends SparkSpec {
  import spark.implicits._

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1))

  test("id-ordered micro-batches compose to the one-shot pack; shipped " +
      "full sequences never change across store versions") {
    val base = java.nio.file.Files.createTempDirectory("graft_sinkspec_")
    try {
      val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("text").isNotNull).limit(200)
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("__ids",
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
        .localCheckpoint(true)
      val ids = all.select("doc_id").as[Long].collect().sorted
      val cut = ids(ids.length / 2)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, String)]
      def tuples(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "source", "text")
          .as[(Long, String, String)].collect().toSeq
      val stream = mem.toDF().toDF("doc_id", "source", "text")
        .withColumn("__ids",
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      // two drains against ONE checkpoint: batch 2 resumes from committed
      // offsets — the stop/restart path a weekly crawl loop actually runs
      mem.addData(tuples(all.filter(col("doc_id") <= cut)): _*)
      ShardSink.run(stream, "__ids", "doc_id", budget = 128,
        shardCol = "source", storeDir = s"$base/store",
        checkpointDir = s"$base/ck")
      mem.addData(tuples(all.filter(col("doc_id") > cut)): _*)
      ShardSink.run(stream, "__ids", "doc_id", budget = 128,
        shardCol = "source", storeDir = s"$base/store",
        checkpointDir = s"$base/ck")
      // final store == one-shot pack of the full corpus, bit-for-bit
      val got = ShardSink.read(spark, s"$base/store").collect()
        .map(r => key(r) -> r.getSeq[Int](2)).toMap
      val want = Curate.packTokenIds(all, "__ids", "doc_id", 128, "source")
        .collect().map(r => key(r) -> r.getSeq[Int](2)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, v) =>
        assert(v == want(k), s"sequence $k diverges from one-shot pack") }
      // two batches -> two committed DELTA versions; v1 holds only the
      // second batch's sequences plus at most one topped-up tail per
      // touched shard — a shipped FULL sequence of v0 is never
      // rewritten (the O(batch)-write contract), and the merged view
      // still serves it bit-stable
      val v0 = spark.read.parquet(s"$base/store/v0").collect()
        .map(r => key(r) -> ((r.getSeq[Int](2), r.getInt(3)))).toMap
      val v1 = spark.read.parquet(s"$base/store/v1").collect()
        .map(r => key(r) -> ((r.getSeq[Int](2), r.getInt(3)))).toMap
      val fullV0 = v0.filter(_._2._2 == 128)
      assert(fullV0.nonEmpty, "fixture too small: no full sequence in v0")
      v1.keySet.intersect(v0.keySet).foreach { k =>
        assert(v0(k)._2 < 128,
          s"full v0 sequence $k was rewritten in the v1 delta") }
      assert(v1.size < got.size,
        "v1 is a full snapshot, not a delta")
      fullV0.foreach { case (k, v) =>
        assert(got(k) == v._1,
          s"merged view lost shipped full sequence $k") }
      // at-least-once re-delivery: appending again under an
      // ALREADY-COMMITTED version key is a no-op — no v2, no duplicates
      val redelivered = ShardSink.append(spark,
        all.filter(col("doc_id") > cut), "__ids", "doc_id", budget = 128,
        shardCol = "source", storeDir = s"$base/store",
        version = Some(1L))
      assert(!redelivered)
      assert(!new java.io.File(s"$base/store/v2").exists())
      val got2 = ShardSink.read(spark, s"$base/store").collect()
        .map(r => key(r) -> r.getSeq[Int](2)).toMap
      assert(got2 == got)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("NULL shard keys survive the latest-wins merge: rows kept, " +
      "tails topped up, no seq_id restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_sinknull_")
    try {
      // two appends whose shard key is NULL for half the docs; the
      // null shard's partial tail from v0 must be topped up by v1 (a
      // null-unsafe merge would drop the shard from `existing` and
      // restart it at seq 0, duplicating sequence ids)
      def docs(lo: Long, hi: Long) = spark.range(lo, hi)
        .select(col("id").as("doc_id"),
          when(col("id") % 2 === 0, lit("s")).otherwise(lit(null))
            .as("source"),
          // 3 tokens per doc at budget 4 -> every shard keeps a
          // partial tail alive across appends
          array(col("id").cast("int"), col("id").cast("int"),
            col("id").cast("int")).as("__ids"))
      val b0 = ShardSink.append(spark, docs(0, 6), "__ids", "doc_id",
        budget = 4, shardCol = "source", storeDir = s"$base/store")
      val b1 = ShardSink.append(spark, docs(6, 12), "__ids", "doc_id",
        budget = 4, shardCol = "source", storeDir = s"$base/store")
      assert(b0 && b1)
      val got = ShardSink.read(spark, s"$base/store")
      import graft.operators.Curate
      val want = Curate.packTokenIds(docs(0, 12), "__ids", "doc_id",
        4, "source")
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("source"), col("seq_id").cast("long"),
          col("token_ids"), col("n_tokens").cast("long"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1),
          r.getSeq[Int](2), r.getLong(3))).toSet
      assert(canon(got) == canon(want))
      // both shards present, including the null one
      assert(canon(got).exists(_._1.isEmpty)
        && canon(got).exists(_._1.contains("s")))
      // dense seq_ids per shard — the corruption a dropped null shard
      // would have caused (and packTokenIdsIncremental's audit would
      // have raised on the THIRD append, not the second)
      canon(got).groupBy(_._1).foreach { case (_, rows) =>
        assert(rows.map(_._2) == (0L until rows.size).toSet) }
    } finally rmTree(base)
  }

  test("compact folds deltas into one physical version: view preserved " +
      "bit-for-bit (null shard included), superseded tails absent, " +
      "old store untouched") {
    val base = java.nio.file.Files.createTempDirectory("graft_sinkcmp_")
    try {
      def docs(lo: Long, hi: Long) = spark.range(lo, hi)
        .select(col("id").as("doc_id"),
          when(col("id") % 2 === 0, lit("s")).otherwise(lit(null))
            .as("source"),
          array(col("id").cast("int"), col("id").cast("int"),
            col("id").cast("int")).as("__ids"))
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("source"), col("seq_id").cast("long"),
          col("token_ids"), col("n_tokens").cast("long"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1),
          r.getSeq[Int](2), r.getLong(3))).toSet
      ShardSink.append(spark, docs(0, 6), "__ids", "doc_id",
        budget = 4, shardCol = "source", storeDir = s"$base/store")
      ShardSink.append(spark, docs(6, 12), "__ids", "doc_id",
        budget = 4, shardCol = "source", storeDir = s"$base/store")
      val before = canon(ShardSink.read(spark, s"$base/store"))
      ShardSink.compact(spark, s"$base/store", s"$base/c")
      // the compacted store serves the same view through the normal
      // reader, and holds it PHYSICALLY resolved: exactly one version
      // whose raw parquet equals the merged view row-for-row (v0's
      // topped-up tail is absent, not merely masked)
      assert(canon(ShardSink.read(spark, s"$base/c")) == before)
      assert(new java.io.File(s"$base/c").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet == Set("v0"))
      assert(canon(spark.read.parquet(s"$base/c/v0")) == before)
      // never in place: the old layout still serves undisturbed
      assert(canon(ShardSink.read(spark, s"$base/store")) == before)
      // a USED compaction target is refused loudly — publishOnce would
      // no-op on the existing v0 and readers would keep serving stale
      // contents as if freshly compacted
      intercept[IllegalArgumentException] {
        ShardSink.compact(spark, s"$base/c", s"$base/store")
      }
      // describe: per-version delta sizes + compaction debt. v0 packs
      // 3 docs/shard x 3 tokens at budget 4 -> 3 seqs/shard (4+4+1);
      // v1 tops up each tail and adds 2 more -> 3 delta rows/shard,
      // superseding exactly v0's tail per shard. NULL shard counts.
      val desc = ShardSink.describe(spark, s"$base/store").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(desc(0L) == ((6L, 2L, 18L, 2L)))
      assert(desc(1L) == ((6L, 2L, 20L, 0L)))
      // the compacted store carries no debt, one version
      val cdesc = ShardSink.describe(spark, s"$base/c").collect()
      assert(cdesc.length == 1)
      assert(cdesc.head.getLong(0) == 0L
        && cdesc.head.getLong(1) == 10L     // 5 seqs x 2 shards
        && cdesc.head.getLong(4) == 0L)
    } finally rmTree(base)
  }

  test("append guards an explicit out-of-order version: below-latest " +
      "uncommitted fails loudly, equal-to-committed is the re-delivery " +
      "no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft_vguard_")
    try {
      val docs = Seq((1L, "a", "x y"), (2L, "a", "z"), (3L, "b", "w"))
        .toDF("doc_id", "source", "text")
        .withColumn("__ids",
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      def app(pred: org.apache.spark.sql.Column, v: Long) =
        ShardSink.append(spark, docs.filter(pred), "__ids", "doc_id",
          budget = 4, shardCol = "source", storeDir = s"$base/store",
          version = Some(v))
      assert(app(col("doc_id") <= 1, 0L))
      assert(app(col("doc_id") === 2, 3L)) // gaps are fine (scheduler keys)
      // re-delivery of a committed version: harmless no-op, even though
      // it is below the latest
      assert(!app(col("doc_id") === 2, 3L))
      assert(!app(col("doc_id") <= 1, 0L))
      // an UNCOMMITTED version below the latest (restarted checkpoint
      // lineage meeting the scheduler path) would publish a delta
      // computed against a merged view that already includes later
      // versions — refused loudly instead of corrupting latest-wins
      val e = intercept[IllegalArgumentException] {
        app(col("doc_id") === 3, 2L)
      }
      assert(e.getMessage.contains("out-of-order"))
      // the store is undisturbed and still appendable in order
      assert(app(col("doc_id") === 3, 4L))
      assert(ShardSink.read(spark, s"$base/store").count() > 0)
    } finally rmTree(base)
  }

  test("schema evolution: a WIDENED later delta stays visible " +
      "(older files NULL-pad under the latest schema); a NARROWING " +
      "delta is refused at append time, not masked at read time") {
    val base = java.nio.file.Files.createTempDirectory("graft_drift_")
    try {
      def docs(lo: Long, hi: Long) = spark.range(lo, hi)
        .select(col("id").as("doc_id"), lit("s").as("source"),
          array(col("id").cast("int")).as("__ids"))
      ShardSink.append(spark, docs(0, 4), "__ids", "doc_id",
        budget = 4, shardCol = "source", storeDir = s"$base/store")
      // a later delta that ADDED a column (hand-planted: the pack verbs
      // themselves never widen, but a deployment's schema evolution
      // does) — the merged read takes the LATEST version's schema, so
      // the new column must be visible with v0's rows NULL-padded
      spark.read.parquet(s"$base/store/v0")
        .withColumn("seq_id", col("seq_id") + 100)
        .withColumn("quality", lit(0.5))
        .write.parquet(s"$base/store/v1")
      val got = ShardSink.read(spark, s"$base/store")
      assert(got.columns.contains("quality"))
      val byVersion = got.select(col("seq_id").cast("long"),
          col("quality")).collect()
        .map(r => (r.getLong(0) >= 100, r.isNullAt(1))).toSet
      assert(byVersion == Set((true, false), (false, true)),
        s"widened column not NULL-padded correctly: $byVersion")
      // the REVERSE direction is the silent-masking hazard the read's
      // latest-schema scan cannot detect (a narrower latest schema
      // stops selecting old columns) — so append refuses it loudly.
      // Hand-plant a store whose committed schema is WIDER than what
      // the pack produces; the next real append computes a delta
      // missing that column and must fail the publish
      graft.operators.Curate.packTokenIds(docs(0, 4), "__ids",
          "doc_id", 4, "source")
        .withColumn("provenance", lit("crawl-7"))
        .write.parquet(s"$base/wide/v0")
      val e = intercept[IllegalArgumentException] {
        ShardSink.append(spark, docs(4, 8), "__ids", "doc_id",
          budget = 4, shardCol = "source", storeDir = s"$base/wide")
      }
      assert(e.getMessage.contains("narrowed") &&
        e.getMessage.contains("provenance"), e.getMessage)
      // nothing was published: the store still serves v0 alone
      assert(!new java.io.File(s"$base/wide/v1").exists())
      assert(ShardSink.read(spark, s"$base/wide").count() ==
        spark.read.parquet(s"$base/wide/v0").count())
    } finally rmTree(base)
  }

  test("retention: retire deletes only a covered pre-compaction store; " +
      "late reads, asOf, appends all fail loudly naming the successor") {
    val base = java.nio.file.Files.createTempDirectory("graft_retire_")
    try {
      val docs = Seq((1L, "a", "x y"), (2L, "a", "z"), (3L, "b", "w"),
          (4L, "b", "v u"))
        .toDF("doc_id", "source", "text")
        .withColumn("__ids",
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
        .localCheckpoint(true)
      def app(pred: org.apache.spark.sql.Column) =
        ShardSink.append(spark, docs.filter(pred), "__ids", "doc_id",
          budget = 4, shardCol = "source", storeDir = s"$base/store")
      app(col("doc_id") <= 2)  // v0
      app(col("doc_id") === 3) // v1
      // no compaction happened: nothing names this store -> refused
      intercept[IllegalArgumentException] {
        ShardSink.retire(s"$base/store", s"$base/c")
      }
      ShardSink.compact(spark, s"$base/store", s"$base/c")
      // a target compacted from a DIFFERENT store -> refused
      ShardSink.compact(spark, s"$base/c", s"$base/c2")
      val foreign = intercept[IllegalArgumentException] {
        ShardSink.retire(s"$base/store", s"$base/c2")
      }
      assert(foreign.getMessage.contains("does not descend"))
      // the source grew past the fold: retiring would destroy v2 ->
      // refused until a fresh compaction covers it
      app(col("doc_id") === 4) // v2 > max folded v1
      val stale = intercept[IllegalArgumentException] {
        ShardSink.retire(s"$base/store", s"$base/c")
      }
      assert(stale.getMessage.contains("recompact"))
      ShardSink.compact(spark, s"$base/store", s"$base/c3")
      val want = ShardSink.read(spark, s"$base/c3").collect()
        .map(r => key(r) -> r.getSeq[Int](2)).toMap
      ShardSink.retire(s"$base/store", s"$base/c3")
      // the payload is gone, the tombstone marker survives
      assert(new java.io.File(s"$base/store").listFiles()
        .map(_.getName).toSeq == Seq("_graft_retired"))
      // every access path fails loudly and names the successor — the
      // retention floor: pre-compaction history (any asOf) is gone
      Seq(
        () => ShardSink.read(spark, s"$base/store"),
        () => ShardSink.read(spark, s"$base/store", asOf = Some(0L)),
        () => ShardSink.describe(spark, s"$base/store"),
        () => ShardSink.compact(spark, s"$base/store", s"$base/x")
      ).foreach { f =>
        val e = intercept[IllegalStateException](f())
        assert(e.getMessage.contains("retired")
          && e.getMessage.contains("c3"))
      }
      intercept[IllegalStateException] {
        ShardSink.append(spark, docs, "__ids", "doc_id", 4, "source",
          s"$base/store")
      }
      // a retired dir can never be a compaction TARGET either
      intercept[IllegalStateException] {
        ShardSink.compact(spark, s"$base/c3", s"$base/store")
      }
      // double retire fails loudly (not a silent second delete)
      intercept[IllegalStateException] {
        ShardSink.retire(s"$base/store", s"$base/c3")
      }
      // the successor is untouched and serves the folded view
      val got = ShardSink.read(spark, s"$base/c3").collect()
        .map(r => key(r) -> r.getSeq[Int](2)).toMap
      assert(got == want && got.nonEmpty)
    } finally rmTree(base)
  }

  test("carried tail state: cache-hit appends produce the same store " +
      "as fresh-JVM audit-path appends; an external version write " +
      "invalidates, and the audit (with its corrupt-store gate) is " +
      "back in force") {
    val base = java.nio.file.Files.createTempDirectory("graft_tailc_")
    try {
      val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("text").isNotNull).limit(120)
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("__ids",
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
        .localCheckpoint(true)
      val ids = all.select("doc_id").as[Long].collect().sorted
      def slice(lo: Long, hi: Long) =
        all.filter(col("doc_id") > lo && col("doc_id") <= hi)
      val cuts = Seq(-1L, ids(39), ids(79), ids.last)
      // leg A: three appends in one "session" — appends 2 and 3 take
      // the carried-tail-state path (same JVM, matching version)
      ShardSink.clearTailCache()
      (0 until 3).foreach { k =>
        ShardSink.append(spark, slice(cuts(k), cuts(k + 1)), "__ids",
          "doc_id", budget = 128, shardCol = "source",
          storeDir = s"$base/hot") }
      // leg B: identical appends, cache dropped before each — every
      // append re-derives tails from the store (the fresh-JVM path)
      (0 until 3).foreach { k =>
        ShardSink.clearTailCache()
        ShardSink.append(spark, slice(cuts(k), cuts(k + 1)), "__ids",
          "doc_id", budget = 128, shardCol = "source",
          storeDir = s"$base/cold") }
      def view(dir: String) = ShardSink.read(spark, dir).collect()
        .map(r => (key(r), r.getSeq[Int](2))).toMap
      val (hot, cold) = (view(s"$base/hot"), view(s"$base/cold"))
      assert(hot == cold && hot.nonEmpty,
        "cache-hit appends diverge from audit-path appends")
      // per-version deltas must be identical too (same files written)
      (0 until 3).foreach { v =>
        val h = spark.read.parquet(s"$base/hot/v$v").collect()
          .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
            r.getSeq[Int](r.fieldIndex("token_ids")))).toSet
        val c = spark.read.parquet(s"$base/cold/v$v").collect()
          .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
            r.getSeq[Int](r.fieldIndex("token_ids")))).toSet
        assert(h == c, s"delta v$v diverges between cache and audit")
      }
      // external write invalidation: a version dir published by
      // ANOTHER writer bumps the latest version; the next append must
      // MISS the cache and run the audit — proven by hand-corrupting
      // that external version (duplicate seq_id 0) and watching the
      // audit's loud gate fire instead of a silent cache-hit append
      val ext = new java.io.File(s"$base/hot/v3")
      spark.createDataFrame(Seq(
          ("corrupt", 0L, Seq(1, 2, 3), 3),
          ("corrupt", 0L, Seq(4, 5, 6), 3)))
        .toDF("source", "seq_id", "token_ids", "n_tokens")
        .coalesce(1).write.parquet(ext.getAbsolutePath)
      val e = intercept[IllegalStateException] {
        ShardSink.append(spark, slice(cuts(0), cuts(1))
            .withColumn("doc_id", col("doc_id") + 1000000L), "__ids",
          "doc_id", budget = 128, shardCol = "source",
          storeDir = s"$base/hot")
      }
      assert(e.getMessage.contains("corrupt shard store"),
        s"expected the audit gate, got: ${e.getMessage}")
    } finally rmTree(base)
  }

  private def rmTree(base: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(base).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().asScala
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
