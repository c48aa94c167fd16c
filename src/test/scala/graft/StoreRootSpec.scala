package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeByteVocab}
import graft.operators.{Curate, Similarity}
import graft.streaming.{RefreshPipeline, ShardSink, StoreFiles, StoreRoot, VectorIndexSink}

/** Generation-managed store roots: the compact-swap-retire state
  * machine, the global version timeline with its retention floor, the
  * cross-generation re-delivery skip, and every crash window between
  * the three commit points (fold, swap, retire). */
class StoreRootSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("text").isNotNull).limit(n)
    .select(col("doc_id"), col("source"), col("text"))
    .withColumn("__ids",
      Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))

  private def digest(df: org.apache.spark.sql.DataFrame): String =
    df.select(concat_ws("|",
        coalesce(col("source"), lit("<null>")),
        col("seq_id").cast("string"),
        col("n_tokens").cast("long").cast("string"),
        md5(Bpe.idsString(col("token_ids")))).as("p"))
      .agg(md5(concat_ws(";", sort_array(collect_list(col("p"))))))
      .collect()(0).getString(0)

  test("shard root: global version timeline across a compaction — " +
      "floor skip on re-delivery, asOf at/above the floor served, " +
      "below it refused, predecessor retired") {
    val base = java.nio.file.Files.createTempDirectory("graft_root_")
    try {
      val d = docs(120).localCheckpoint(true)
      val ids = d.select("doc_id").as[Long].collect().sorted
      val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
      val b0 = d.filter(col("doc_id") <= cut1)
      val b1 = d.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
      val b2 = d.filter(col("doc_id") > cut2)
      val root = s"$base/root"
      val g0 = StoreRoot.init(root)
      assert(StoreRoot.currentGen(root) == 0L &&
        StoreRoot.floor(root).isEmpty)
      // seed v0 + two appends on the gen0 timeline
      ShardSink.append(spark, b0, "__ids", "doc_id", 128, "source", g0)
      assert(StoreRoot.appendShard(spark, root, b1, "__ids", "doc_id",
        128, "source", version = 1L))
      assert(StoreRoot.appendShard(spark, root, b2, "__ids", "doc_id",
        128, "source", version = 2L))
      val preAsOf1 = digest(StoreRoot.readShard(spark, root,
        asOf = Some(1L)))
      val preFull = digest(StoreRoot.readShard(spark, root))
      assert(StoreRoot.compactShard(spark, root))
      assert(StoreRoot.currentGen(root) == 1L &&
        StoreRoot.floor(root).contains(2L))
      // the fold moved no data: full view and at-the-floor asOf identical
      assert(digest(StoreRoot.readShard(spark, root)) == preFull)
      assert(digest(StoreRoot.readShard(spark, root,
        asOf = Some(2L))) == preFull)
      // nothing to fold -> compaction no-ops (re-delivered trigger path)
      assert(!StoreRoot.compactShard(spark, root))
      // re-delivered appends across the boundary: at/below floor skip,
      // and the store digest does not move
      assert(!StoreRoot.appendShard(spark, root, b1, "__ids", "doc_id",
        128, "source", version = 1L))
      assert(!StoreRoot.appendShard(spark, root, b2, "__ids", "doc_id",
        128, "source", version = 2L))
      assert(digest(StoreRoot.readShard(spark, root)) == preFull)
      // asOf below the floor: loudly refused, names the floor
      val e = intercept[IllegalStateException] {
        StoreRoot.readShard(spark, root, asOf = Some(1L))
      }
      assert(e.getMessage.contains("retention floor") &&
        e.getMessage.contains("asOf=1"), e.getMessage)
      assert(preAsOf1 != preFull) // the refused snapshot was distinct
      // the predecessor is retired: direct reads fail loudly
      val r = intercept[IllegalStateException] {
        ShardSink.read(spark, s"$root/gen0").collect()
      }
      assert(r.getMessage.contains("retired"), r.getMessage)
      // the timeline continues: a post-compaction append serves merged
      assert(StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut2) // re-pack b2 under a NEW version
          .withColumn("doc_id", col("doc_id") + 1000000L),
        "__ids", "doc_id", 128, "source", version = 3L))
      assert(ShardSink.versionCount(StoreRoot.currentDir(root)) == 2)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("shard root: every crash window heals — committed fold resumes, " +
      "partial fold redoes, swapped-but-unretired predecessor swept") {
    val base = java.nio.file.Files.createTempDirectory("graft_rootcw_")
    try {
      val d = docs(80).localCheckpoint(true)
      val ids = d.select("doc_id").as[Long].collect().sorted
      val cut = ids(ids.length / 2)
      val root = s"$base/root"
      val g0 = StoreRoot.init(root)
      ShardSink.append(spark, d.filter(col("doc_id") <= cut),
        "__ids", "doc_id", 128, "source", g0)
      StoreRoot.appendShard(spark, root, d.filter(col("doc_id") > cut),
        "__ids", "doc_id", 128, "source", version = 1L)
      val want = digest(StoreRoot.readShard(spark, root))
      // window 1: fold committed (marker in place), crash before swap
      ShardSink.compact(spark, g0, s"$root/gen1")
      assert(StoreRoot.currentGen(root) == 0L) // reader still on gen0
      assert(StoreRoot.compactShard(spark, root)) // resumes: swap+retire
      assert(StoreRoot.currentGen(root) == 1L &&
        digest(StoreRoot.readShard(spark, root)) == want)
      // window 2: partial fold (no marker), crash mid-write — redone
      StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut)
          .withColumn("doc_id", col("doc_id") + 1000000L),
        "__ids", "doc_id", 128, "source", version = 3L)
      val want2 = digest(StoreRoot.readShard(spark, root))
      new java.io.File(s"$root/gen2/v0").mkdirs() // torn: no marker
      assert(StoreRoot.compactShard(spark, root))
      assert(StoreRoot.currentGen(root) == 2L &&
        StoreRoot.floor(root).contains(3L) &&
        digest(StoreRoot.readShard(spark, root)) == want2)
      // window 3: swap committed, crash before retire — the NEXT
      // compaction retires the predecessor before folding
      StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut)
          .withColumn("doc_id", col("doc_id") + 2000000L),
        "__ids", "doc_id", 128, "source", version = 4L)
      ShardSink.compact(spark, StoreRoot.currentDir(root), s"$root/gen3")
      StoreRoot.writeManifest(root, 3L) // crash before retire(gen2)
      assert(StoreFiles.retiredTo(s"$root/gen2").isEmpty)
      val want3 = digest(StoreRoot.readShard(spark, root))
      // no debt in gen3 -> compactShard only heals, returns false
      assert(!StoreRoot.compactShard(spark, root))
      assert(StoreFiles.retiredTo(s"$root/gen2").isDefined &&
        digest(StoreRoot.readShard(spark, root)) == want3)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("vector root: floor skip for appends AND tombstones, asOf " +
      "refusal, served ids preserved across the fold") {
    val base = java.nio.file.Files.createTempDirectory("graft_rootv_")
    try {
      val emb = transform(sequence(lit(0), lit(7)),
        i => sin(col("vec_id") * 3 + i).cast("float"))
      val vecs = spark.range(0, 60).select(col("id").as("vec_id"))
        .withColumn("embedding", emb).localCheckpoint(true)
      val root = s"$base/root"
      val g0 = StoreRoot.init(root)
      Similarity.ivfPqSave(
        Similarity.ivfPqBuild(vecs.filter(col("vec_id") < 40),
          vecCol = "embedding", idCol = "vec_id", nLists = 2, m = 4,
          kCodes = 8, iterations = 2), g0)
      assert(StoreRoot.appendVectors(spark, root, 0L,
        vecs.filter(col("vec_id") >= 40), idCol = "vec_id"))
      assert(StoreRoot.deleteVectors(spark, root, 1L,
        Seq(5L, 45L).toDF("vec_id")))
      def served(asOf: Option[Long]) =
        StoreRoot.readVectors(spark, root, idCol = "vec_id", asOf = asOf)
          .encoded.select("vec_id").as[Long].collect().toSet
      val want = served(None)
      assert(!want.contains(5L) && !want.contains(45L) &&
        want.contains(44L) && want.size == 58)
      assert(StoreRoot.compactVectors(spark, root))
      assert(StoreRoot.currentGen(root) == 1L &&
        StoreRoot.floor(root).contains(1L))
      assert(served(None) == want) // the fold moved no ids
      // re-delivered append/tombstone at/below the floor: skipped
      assert(!StoreRoot.appendVectors(spark, root, 0L,
        vecs.filter(col("vec_id") >= 40), idCol = "vec_id"))
      assert(!StoreRoot.deleteVectors(spark, root, 1L,
        Seq(5L).toDF("vec_id")))
      assert(served(None) == want)
      // asOf below the floor refused; at the floor served
      intercept[IllegalStateException] {
        StoreRoot.readVectors(spark, root, asOf = Some(0L))
      }
      assert(served(Some(1L)) == want)
      // the timeline continues above the floor
      assert(StoreRoot.deleteVectors(spark, root, 2L,
        Seq(44L).toDF("vec_id")))
      assert(served(None) == want - 44L)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(vecs)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("windowed retention (keep > 0): the trailing asOf window " +
      "survives the fold, copied deltas keep their re-delivery skip, " +
      "a retained tombstone still masks the folded base") {
    val base = java.nio.file.Files.createTempDirectory("graft_rootw_")
    try {
      val d = docs(120).localCheckpoint(true)
      val ids = d.select("doc_id").as[Long].collect().sorted
      val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
      val root = s"$base/root"
      ShardSink.append(spark, d.filter(col("doc_id") <= cut1),
        "__ids", "doc_id", 128, "source", StoreRoot.init(root))
      val b1 = d.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
      val b2 = d.filter(col("doc_id") > cut2)
      StoreRoot.appendShard(spark, root, b1, "__ids", "doc_id", 128,
        "source", version = 1L)
      StoreRoot.appendShard(spark, root, b2, "__ids", "doc_id", 128,
        "source", version = 2L)
      val asOf1 = digest(StoreRoot.readShard(spark, root,
        asOf = Some(1L)))
      val full = digest(StoreRoot.readShard(spark, root))
      assert(StoreRoot.compactShard(spark, root, keep = 1))
      // the window held v2 live: floor 1 (not 2), v2 still a delta dir
      assert(StoreRoot.floor(root).contains(1L) &&
        ShardSink.versionCount(StoreRoot.currentDir(root)) == 2)
      assert(digest(StoreRoot.readShard(spark, root)) == full)
      assert(digest(StoreRoot.readShard(spark, root,
        asOf = Some(1L))) == asOf1) // AT the floor: the base alone
      assert(digest(StoreRoot.readShard(spark, root,
        asOf = Some(2L))) == full) // inside the window: base + copy
      intercept[IllegalStateException] {
        StoreRoot.readShard(spark, root, asOf = Some(0L))
      }
      // the copied delta keeps its committed key: re-delivery skips
      assert(!StoreRoot.appendShard(spark, root, b2, "__ids", "doc_id",
        128, "source", version = 2L))
      assert(digest(StoreRoot.readShard(spark, root)) == full)
      // nothing beyond the window -> no-op; one more append -> debt
      assert(!StoreRoot.compactShard(spark, root, keep = 1))
      // vector side: the retained arm is a TOMBSTONE, which must keep
      // masking rows the fold absorbed into the base (tag -1)
      val emb = transform(sequence(lit(0), lit(7)),
        i => sin(col("vec_id") * 3 + i).cast("float"))
      val vecs = spark.range(0, 60).select(col("id").as("vec_id"))
        .withColumn("embedding", emb).localCheckpoint(true)
      val vr = s"$base/vroot"
      graft.operators.Similarity.ivfPqSave(
        graft.operators.Similarity.ivfPqBuild(
          vecs.filter(col("vec_id") < 40), vecCol = "embedding",
          idCol = "vec_id", nLists = 2, m = 4, kCodes = 8,
          iterations = 2), StoreRoot.init(vr))
      StoreRoot.appendVectors(spark, vr, 0L,
        vecs.filter(col("vec_id") >= 40), idCol = "vec_id")
      StoreRoot.deleteVectors(spark, vr, 1L, Seq(7L, 41L).toDF("vec_id"))
      def served(asOf: Option[Long]) =
        StoreRoot.readVectors(spark, vr, idCol = "vec_id", asOf = asOf)
          .encoded.select("vec_id").as[Long].collect().toSet
      val want = served(None)
      val want0 = served(Some(0L))
      assert(!want.contains(7L) && want0.contains(7L))
      assert(StoreRoot.compactVectors(spark, vr, keep = 1,
        idCol = "vec_id"))
      // floor 0: the fold absorbed only b0; tombstone d1 rode over
      assert(StoreRoot.floor(vr).contains(0L))
      assert(served(None) == want && served(Some(0L)) == want0)
      assert(!StoreRoot.deleteVectors(spark, vr, 1L,
        Seq(7L).toDF("vec_id"))) // copied tombstone: re-delivery skips
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(vecs)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("out-of-band fold: begin/finish completes through the same " +
      "states as the sync verb, appends landing mid-fold are topped " +
      "up verbatim, the floor stays at the fold cutoff") {
    val base = java.nio.file.Files.createTempDirectory("graft_rootoob_")
    try {
      val d = docs(120).localCheckpoint(true)
      val ids = d.select("doc_id").as[Long].collect().sorted
      val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
      val root = s"$base/root"
      ShardSink.append(spark, d.filter(col("doc_id") <= cut1),
        "__ids", "doc_id", 128, "source", StoreRoot.init(root))
      StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
        "__ids", "doc_id", 128, "source", version = 1L)
      val preLate = digest(StoreRoot.readShard(spark, root))
      // begin: the fold (covering v0..v1) runs on a background thread
      val fold = StoreRoot.beginCompactShard(spark, root)
      assert(fold.isDefined)
      // an append lands WHILE the fold is (possibly) in flight — legal
      // by design: the fold reads only the immutable versions it
      // listed at its own start; whatever it did not cover, finish's
      // top-up copies verbatim
      assert(StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut2),
        "__ids", "doc_id", 128, "source", version = 2L))
      val full = digest(StoreRoot.readShard(spark, root))
      StoreRoot.finishCompact(fold.get)
      assert(StoreRoot.currentGen(root) == 1L)
      // the racing append is in the new generation regardless of
      // whether the fold's own listing caught it (fold saw it -> it
      // folded; fold missed it -> top-up copied dir v2 verbatim)
      assert(digest(StoreRoot.readShard(spark, root)) == full)
      val floor = StoreRoot.floor(root).get
      assert(floor == 1L || floor == 2L, s"floor $floor")
      // above-the-floor asOf serves; the racing append's re-delivery
      // skips (floor skip if folded, publishOnce skip if copied)
      assert(digest(StoreRoot.readShard(spark, root,
        asOf = Some(2L))) == full)
      if (floor == 1L)
        assert(digest(StoreRoot.readShard(spark, root,
          asOf = Some(1L))) == preLate)
      assert(!StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut2),
        "__ids", "doc_id", 128, "source", version = 2L))
      assert(digest(StoreRoot.readShard(spark, root)) == full)
      assert(StoreFiles.retiredTo(s"$root/gen0").isDefined)
      // begin with no debt (when the fold covered everything) either
      // no-ops or folds the one copied delta; after at most one more
      // cycle the root is quiescent
      StoreRoot.compactShard(spark, root)
      assert(!StoreRoot.compactShard(spark, root))
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("fold session clone inherits the drain's RUNTIME SQL conf — " +
      "newSession() alone drops spark.conf.set entries, so a fold " +
      "could rewrite data under different SQL semantics — with the " +
      "throttle overrides applied on top") {
    val tzKey = "spark.sql.session.timeZone"
    val csKey = "spark.sql.caseSensitive"
    val tzPrev = spark.conf.get(tzKey)
    val csPrev = spark.conf.get(csKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      spark.conf.set(csKey, "true")
      // vacuousness check: a bare newSession re-derives SQLConf from
      // the base SparkConf and does NOT see the runtime value
      assert(spark.newSession().conf.get(tzKey) != "America/New_York")
      val clone = StoreRoot.throttledClone(spark)
      assert(clone.conf.get(tzKey) == "America/New_York")
      assert(clone.conf.get(csKey) == "true")
      // throttle overrides win over inherited values...
      assert(clone.conf.get("spark.sql.shuffle.partitions")
        == StoreRoot.FoldMaxTasks.toString)
      assert(clone.conf.get("spark.sql.files.maxPartitionBytes")
        == (1024L * 1024 * 1024).toString)
      // ...without touching the parent's own width
      assert(spark.conf.get("spark.sql.shuffle.partitions")
        != StoreRoot.FoldMaxTasks.toString)
    } finally {
      spark.conf.set(tzKey, tzPrev)
      spark.conf.set(csKey, csPrev)
    }
  }

  test("an abandoned fold leaves a state the next begin() resolves: " +
      "abandon cancels the fold's jobs and joins its thread without " +
      "throwing, and a fresh begin/finish completes the cycle with " +
      "the same served answer") {
    val base = java.nio.file.Files.createTempDirectory("graft_rootab_")
    try {
      val d = docs(120).localCheckpoint(true)
      val ids = d.select("doc_id").as[Long].collect().sorted
      val cut = ids(ids.length / 2)
      val root = s"$base/root"
      ShardSink.append(spark, d.filter(col("doc_id") <= cut),
        "__ids", "doc_id", 128, "source", StoreRoot.init(root))
      StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut),
        "__ids", "doc_id", 128, "source", version = 1L)
      val full = digest(StoreRoot.readShard(spark, root))
      // begin a background fold and abandon it immediately — the
      // abort path a failed drain takes; depending on timing the fold
      // is unstarted, mid-write (jobs cancelled), or already done.
      // abandon() must return without throwing in ALL of these states
      // and must not leave a writer alive.
      val fold = StoreRoot.beginCompactShard(spark, root)
      assert(fold.isDefined)
      fold.get.abandon()
      // whatever state the abandon froze (partial target swept and
      // redone; committed target resumed as top-up), the next cycle
      // completes and serves the identical answer
      val fold2 = StoreRoot.beginCompactShard(spark, root)
      fold2.foreach(StoreRoot.finishCompact)
      assert(StoreRoot.currentGen(root) == 1L)
      assert(digest(StoreRoot.readShard(spark, root)) == full)
      // abandon on an already-finished cycle's handle is a no-op
      fold2.foreach(_.abandon())
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("committed-fold resume is a TOP-UP, not a redo: versions " +
      "appended after the crash ride into the next generation " +
      "verbatim, shard and vector roots alike") {
    val base = java.nio.file.Files.createTempDirectory("graft_roottu_")
    try {
      val d = docs(120).localCheckpoint(true)
      val ids = d.select("doc_id").as[Long].collect().sorted
      val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
      val root = s"$base/root"
      val g0 = StoreRoot.init(root)
      ShardSink.append(spark, d.filter(col("doc_id") <= cut1),
        "__ids", "doc_id", 128, "source", g0)
      StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
        "__ids", "doc_id", 128, "source", version = 1L)
      // a fold commits (marker in place) covering v0..v1, then the
      // process dies before the swap; on restart an append lands FIRST
      ShardSink.compact(spark, g0, s"$root/gen1")
      assert(StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut2),
        "__ids", "doc_id", 128, "source", version = 2L))
      val full = digest(StoreRoot.readShard(spark, root))
      val v1Only = digest(StoreRoot.readShard(spark, root,
        asOf = Some(1L)))
      // the next compaction RESUMES the committed fold and tops up v2
      // — O(late-deltas); the old machine would have re-folded the
      // whole generation
      assert(StoreRoot.compactShard(spark, root))
      assert(StoreRoot.currentGen(root) == 1L)
      // floor pinned at the crashed fold's cutoff, v2 an addressable
      // copied delta — windowed-retention semantics for free
      assert(StoreRoot.floor(root).contains(1L))
      assert(new java.io.File(s"$root/gen1/v2").isDirectory)
      assert(digest(StoreRoot.readShard(spark, root)) == full)
      assert(digest(StoreRoot.readShard(spark, root,
        asOf = Some(1L))) == v1Only)
      assert(!StoreRoot.appendShard(spark, root,
        d.filter(col("doc_id") > cut2),
        "__ids", "doc_id", 128, "source", version = 2L))
      assert(digest(StoreRoot.readShard(spark, root)) == full)

      // vector root: same resume, with the late arm a TOMBSTONE whose
      // copied dir must keep masking rows the fold absorbed into the
      // base (batch tag -1)
      val emb = transform(sequence(lit(0), lit(7)),
        i => sin(col("vec_id") * 3 + i).cast("float"))
      val vecs = spark.range(0, 60).select(col("id").as("vec_id"))
        .withColumn("embedding", emb).localCheckpoint(true)
      val vr = s"$base/vroot"
      graft.operators.Similarity.ivfPqSave(
        graft.operators.Similarity.ivfPqBuild(
          vecs.filter(col("vec_id") < 40), vecCol = "embedding",
          idCol = "vec_id", nLists = 2, m = 4, kCodes = 8,
          iterations = 2), StoreRoot.init(vr))
      StoreRoot.appendVectors(spark, vr, 0L,
        vecs.filter(col("vec_id") >= 40), idCol = "vec_id")
      VectorIndexSink.compact(spark, s"$vr/gen0", s"$vr/gen1",
        idCol = "vec_id") // committed fold, crash before swap
      assert(StoreRoot.deleteVectors(spark, vr, 1L,
        Seq(5L, 45L).toDF("vec_id"))) // late tombstone into gen0
      assert(StoreRoot.compactVectors(spark, vr, idCol = "vec_id"))
      assert(StoreRoot.currentGen(vr) == 1L &&
        StoreRoot.floor(vr).contains(0L))
      val served = StoreRoot.readVectors(spark, vr, idCol = "vec_id")
        .encoded.select("vec_id").as[Long].collect().toSet
      assert(!served.contains(5L) && !served.contains(45L) &&
        served.size == 58)
      assert(!StoreRoot.deleteVectors(spark, vr, 1L,
        Seq(5L).toDF("vec_id"))) // copied tombstone: re-delivery skips
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(vecs)
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }

  test("runManaged == run: mid-stream compaction moves no answer, " +
      "ends on a fresh generation with the old one retired") {
    val base = java.nio.file.Files.createTempDirectory("graft_rootm_")
    try {
      val emb = transform(sequence(lit(0), lit(7)),
        i => sin(col("doc_id") * 3 + i).cast("float"))
      val d = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("text").isNotNull).limit(150)
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint(true)
      val prior = d.filter(col("doc_id") % 3 =!= 0)
      val newDocs = d.filter(col("doc_id") % 3 === 0)
      val benchmark = prior.filter(col("doc_id") % 17 === 3)
      val maxId = newDocs.agg(max(col("doc_id"))).collect()(0).getLong(0)
      val cuts = (0 to 3).map(k => maxId * k / 3)
      def dropFiles(dir: String): Unit = (0 until 3).foreach { k =>
        val part = newDocs.filter(
          col("doc_id") > cuts(k) - (if (k == 0) 1 else 0)
            && col("doc_id") <= cuts(k + 1))
        val tmp = s"$base/tmp$dir$k"
        part.coalesce(1).write.parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(s"$base/$dir/b$k.parquet")
        dst.getParentFile.mkdirs()
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + k * 60000L)
      }
      def stream(dir: String) = {
        val sch = spark.read.parquet(s"$base/$dir").schema
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
          .parquet(s"$base/$dir").withColumn("embedding", emb)
      }
      val priorTok = prior.withColumn("__ids",
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      // unmanaged reference run
      dropFiles("inA")
      ShardSink.append(spark, priorTok, "__ids", "doc_id", 512,
        "source", s"$base/store")
      Similarity.ivfPqSave(
        Similarity.ivfPqBuild(prior.withColumn("embedding", emb),
          vecCol = "embedding", idCol = "doc_id", nLists = 2, m = 4,
          kCodes = 8, iterations = 2), s"$base/ix")
      RefreshPipeline.run(stream("inA"), prior, benchmark,
        storeDir = s"$base/store", ledgerDir = s"$base/ledgerA",
        checkpointDir = s"$base/ckA", budget = 512,
        indexDir = Some(s"$base/ix"))
      val wantStore = digest(ShardSink.read(spark, s"$base/store"))
      val wantIds = VectorIndexSink.read(spark, s"$base/ix",
          idCol = "doc_id")
        .encoded.select("doc_id").as[Long].collect().toSet
      // managed run, compaction after every 2nd trigger (fires once
      // mid-stream at b1, so b2 appends into generation 1)
      dropFiles("inB")
      val sRoot = s"$base/sroot"; val iRoot = s"$base/iroot"
      ShardSink.append(spark, priorTok, "__ids", "doc_id", 512,
        "source", StoreRoot.init(sRoot))
      Similarity.ivfPqSave(
        Similarity.ivfPqBuild(prior.withColumn("embedding", emb),
          vecCol = "embedding", idCol = "doc_id", nLists = 2, m = 4,
          kCodes = 8, iterations = 2), StoreRoot.init(iRoot))
      RefreshPipeline.runManaged(stream("inB"), prior, benchmark,
        shardRoot = sRoot, ledgerDir = s"$base/ledgerB",
        checkpointDir = s"$base/ckB", compactEvery = 2, budget = 512,
        indexRoot = Some(iRoot))
      assert(StoreRoot.currentGen(sRoot) == 1L &&
        StoreRoot.currentGen(iRoot) == 1L)
      assert(digest(StoreRoot.readShard(spark, sRoot)) == wantStore)
      assert(StoreRoot.readVectors(spark, iRoot, idCol = "doc_id")
        .encoded.select("doc_id").as[Long].collect().toSet == wantIds)
      // predecessors retired, floors in force. The shard fold is cut
      // at its compaction point (versions v0..v2 -> floor 2); the
      // INDEX fold is serialized behind it (one fold in flight across
      // both roots), so by the time it begins the last trigger's arm
      // b2 is committed and folds too -> floor 2, not the b1 the
      // concurrent-begin design used to cut
      assert(StoreFiles.retiredTo(s"$sRoot/gen0").isDefined &&
        StoreFiles.retiredTo(s"$iRoot/gen0").isDefined)
      assert(StoreRoot.floor(sRoot).contains(2L) &&
        StoreRoot.floor(iRoot).contains(2L))
      org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(d)
    } finally StoreFiles.deleteRec(base.toFile)
  }
}
