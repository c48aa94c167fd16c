package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeVocab}
import graft.operators.Curate

/** The corpus-trained BPE contract: committed-vocab provenance, Spark vs
  * driver encoder parity, and the tokenCountCol/tokensCol/weightCol wiring
  * into the layout operators. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val docsParquet = "/root/testdata/sf0.001/documents.parquet"

  test("committed vocab IS the trainer's output on the fixture corpus") {
    val f = new java.io.File(docsParquet)
    assume(f.exists(), s"fixture corpus missing: $docsParquet")
    val texts = graft.tools.BpeTrain.corpus(spark, docsParquet)
    // fingerprint guard: a REGENERATED fixture corpus should skip (the
    // vocab would legitimately differ), not false-fail
    assume(graft.tools.BpeTrain.fingerprint(texts) == BpeVocab.corpusFingerprint,
      "fixture corpus changed since the vocab was trained")
    assert(Bpe.train(texts, BpeVocab.merges.size) == BpeVocab.merges)
  }

  test("Spark column encoder == driver reference encoder (counts + string)") {
    val samples = Seq(
      "the quick brown fox", "spark sort sort sort fast", "a", "", "   ",
      "UPPER Case & punct! 123", "aaa aaaa aaaaa")
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        Bpe.applyMerges(col("text"), BpeVocab.merges).as("enc"),
        Bpe.tokenCount(col("text"), BpeVocab.merges).as("n"))
      .orderBy("id").collect()
    got.foreach { r =>
      val expected = Bpe.encodeStr(samples(r.getLong(0).toInt), BpeVocab.merges)
      assert(r.getString(1) == expected)
      assert(r.getInt(2) == expected.length)
    }
    // merges strictly compress vs raw normalized length on real text
    val raw = Bpe.normalizeStr(samples.head).length
    assert(Bpe.encodeStr(samples.head, BpeVocab.merges).length < raw)
  }

  test("adversarial input containing PUA merge chars cannot alias tokens") {
    // a document that already contains U+E000.. must not be mistaken for
    // merged tokens: normalize maps every non-[a-z ] char to the
    // placeholder BEFORE any merge applies
    val sneaky = "abc  def"
    val enc = Bpe.encodeStr(sneaky, BpeVocab.merges)
    assert(Bpe.normalizeStr(sneaky) == "abc \u00a4\u00a4\u00a4 def")
    val viaSpark = Seq((1L, sneaky)).toDF("id", "text")
      .select(Bpe.applyMerges(col("text"), BpeVocab.merges)).collect()(0).getString(0)
    assert(viaSpark == enc)
  }

  test("trainer is deterministic and order-independent") {
    val texts = Seq("low lower lowest", "new newer newest", "low low new")
    val a = Bpe.train(texts, 10)
    val b = Bpe.train(texts.reverse, 10)
    assert(a == b)
    assert(a.nonEmpty)
    // early stop: no pair occurs twice -> fewer merges than asked
    assert(Bpe.train(Seq("ab"), 10).size <= 1)
  }

  test("byte tier: committed 1024-merge vocab IS the trainer's output on " +
      "the fixture corpus (provenance at production size)") {
    import graft.functions.BpeByteVocab
    val f = new java.io.File(docsParquet)
    assume(f.exists(), s"fixture corpus missing: $docsParquet")
    val texts = graft.tools.BpeTrain.corpus(spark, docsParquet)
    assume(graft.tools.BpeTrain.fingerprint(texts) ==
      BpeByteVocab.corpusFingerprint,
      "fixture corpus changed since the byte vocab was trained")
    assert(BpeByteVocab.merges.size == 1024)
    assert(Bpe.trainBytes(texts, 1024) == BpeByteVocab.merges)
  }

  test("byte tier: native chain expression == replace-chain reference on " +
      "ASCII (fixture docs + adversarial shapes); PUA input cannot alias") {
    import graft.functions.BpeByteVocab
    val adversarial = Seq(
      "The quick BROWN fox!", "  spaces   and\ttabs\n", "", "a",
      "quotes 'single' \"double\" and \\backslash",
      "digits 0123456789 mixed2with3letters",
      "repeat repeat repeat repeat repeat")
    val fixture = spark.read.parquet(docsParquet)
      .selectExpr("text").limit(40)
      .collect().map(_.getString(0)).toSeq
    val samples = (adversarial ++ fixture).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = samples.toDF("id", "text")
      .select(col("id"),
        Bpe.byteTokenCount(col("text"), BpeByteVocab.merges).as("n"))
      .orderBy("id").collect()
    got.foreach { r =>
      val s = samples(r.getLong(0).toInt)._2
      val expected = Bpe.encodeBytesStr(s, BpeByteVocab.merges).length
      assert(r.getInt(1) == expected, s"doc ${r.getLong(0)}: '$s'")
    }
    // compression is real at production size: fixture docs shrink well
    // below their raw byte length (~9x median on this corpus — the vocab
    // is trained on the same distribution)
    val raw = fixture.map(_.length).sum
    val enc = fixture.map(Bpe.encodeBytesStr(_, BpeByteVocab.merges).length).sum
    assert(enc * 2 < raw, s"weak compression: $enc tokens from $raw bytes")
    // byte-level is alias-proof BY CONSTRUCTION: a PUA char in the INPUT
    // is just its 3 UTF-8 bytes (0xEE ...), never a merge token — unlike
    // the char-level tier there is no normalize step to rely on
    val sneaky = ""
    val viaExpr = Seq((1L, sneaky)).toDF("id", "text")
      .select(Bpe.byteTokenCount(col("text"), BpeByteVocab.merges))
      .collect()(0).getInt(0)
    // 6 raw bytes, possibly merged among THEMSELVES by byte merges, but
    // never collapsing to the 2 "tokens" an aliasing encoder would see
    assert(viaExpr > 2, s"PUA input aliased to merge tokens: $viaExpr")
  }

  test("byte tier: token-id expression == reference chain mapped to ids; " +
      "count == ids.length; null -> null, empty -> empty") {
    import graft.functions.BpeByteVocab
    val samples = Seq(
      "The quick BROWN fox!", "  spaces   and\ttabs\n", "", "a",
      "repeat repeat repeat repeat repeat",
      "digits 0123456789 mixed2with3letters") ++
      spark.read.parquet(docsParquet).selectExpr("text").limit(25)
        .collect().map(_.getString(0)).toSeq
    val indexed = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = indexed.toDF("id", "text")
      .select(col("id"),
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges).as("ids"),
        Bpe.byteTokenCount(col("text"), BpeByteVocab.merges).as("n"))
      .orderBy("id").collect()
    rows.foreach { r =>
      val s = indexed(r.getLong(0).toInt)._2
      // reference ids: the replace-chain encoder's merged string, each
      // char decoded through the committed-table symbol space
      val expected = Bpe.encodeBytesStr(s, BpeByteVocab.merges)
        .map(Bpe.symbolOf).toSeq
      assert(r.getSeq[Int](1) == expected, s"ids diverge on '$s'")
      assert(r.getInt(2) == expected.size, s"count != ids.length on '$s'")
    }
    // NULL propagates
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(Bpe.byteTokenIds(col("text"), BpeByteVocab.merges)).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("byte tier: decode is the exact inverse of encode (fixture + " +
      "adversarial, incl. non-ASCII UTF-8); foreign ids fail loudly") {
    import graft.functions.BpeByteVocab
    // byte-level decode must round-trip ANY byte sequence — multi-byte
    // UTF-8 included (each byte is its own base symbol)
    val samples = Seq(
      "", "a", "The quick BROWN fox!", "tabs\tand\nnewlines",
      "unicode: éü中文 😀",
      "repeat repeat repeat repeat") ++
      spark.read.parquet(docsParquet).selectExpr("text").limit(20)
        .collect().map(_.getString(0)).toSeq
    val rows = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"),
        Bpe.byteDecode(
          Bpe.byteTokenIds(col("text"), BpeByteVocab.merges),
          BpeByteVocab.merges).as("rt"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"round trip broke on '${r.getString(1).take(40)}'")
    }
    // NULL propagates; an id outside the symbol space throws
    val nul = Seq((1L, null.asInstanceOf[Array[Int]])).toDF("id", "ids")
      .select(Bpe.byteDecode(col("ids"), BpeByteVocab.merges)).collect()
    assert(nul(0).isNullAt(0))
    val bad = Seq((1L, Array(0, 5000))).toDF("id", "ids")
    assertThrows[Exception] {
      bad.select(Bpe.byteDecode(col("ids"), BpeByteVocab.merges)).collect()
    }
  }

  test("packTokenIds: every sequence but a shard's last holds exactly " +
      "budget ids; concatenation reproduces the per-shard doc stream") {
    import graft.functions.BpeByteVocab
    val docs = spark.read.parquet(docsParquet)
      .filter(col("text").isNotNull).limit(60)
      .withColumn("__ids",
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
    val packed = Curate.packTokenIds(docs, "__ids", "doc_id",
        budget = 512, shardCol = "source")
      .orderBy("source", "seq_id").collect()
    val byShard = packed.groupBy(_.getString(0))
    byShard.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // dense seq ids from 0; all full except possibly the last
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong))
      sorted.dropRight(1).foreach(r => assert(r.getInt(3) == 512,
        s"$src seq ${r.getLong(1)} not full: ${r.getInt(3)}"))
      assert(sorted.last.getInt(3) <= 512)
    }
    // the concatenated stream == per-doc ids concatenated in doc order
    val expect = docs.select(col("source"), col("doc_id"), col("__ids"))
      .collect().groupBy(_.getString(0)).map { case (src, rs) =>
        src -> rs.sortBy(_.getLong(1)).flatMap(_.getSeq[Int](2)).toSeq }
    byShard.foreach { case (src, rows) =>
      val got = rows.sortBy(_.getLong(1)).flatMap(_.getSeq[Int](2)).toSeq
      assert(got == expect(src), s"stream diverges for shard $src")
    }
  }

  test("packTokenIdsSkewRobust == packTokenIds bit-for-bit: fixture " +
      "docs plus null ids and a null shard; incremental parity too") {
    import graft.functions.BpeByteVocab
    val base = spark.read.parquet(docsParquet)
      .filter(col("text").isNotNull).limit(60)
      .withColumn("__ids",
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      .select(col("doc_id"), col("source"), col("__ids"))
    // degenerate rows the join form must keep grouping like the window
    // form: a null ids array (packs as zero tokens) and a null shard
    val extras = Seq(
      (900001L, "a", null.asInstanceOf[Seq[Int]]),
      (900002L, null.asInstanceOf[String], Seq(1, 2, 3)),
      (900003L, null.asInstanceOf[String], Seq(4, 5)))
      .toDF("doc_id", "source", "__ids")
    val docs = base.unionByName(extras).localCheckpoint(true)
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (r.getSeq[Int](2), r.getInt(3))).toMap
    val a = keyed(Curate.packTokenIds(docs, "__ids", "doc_id",
      budget = 512, shardCol = "source")
      .select("source", "seq_id", "token_ids", "n_tokens").collect())
    val b = keyed(Curate.packTokenIdsSkewRobust(docs, "__ids", "doc_id",
      budget = 512, shardCol = "source")
      .select("source", "seq_id", "token_ids", "n_tokens").collect())
    assert(a == b, "skew-robust pack diverged from the window pack")
    // incremental parity: same delta either way
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cutoff = ids(ids.length / 2)
    val existing = Curate.packTokenIds(
        docs.filter(col("doc_id") <= cutoff), "__ids", "doc_id",
        512, "source")
      .localCheckpoint(true)
    val fresh = docs.filter(col("doc_id") > cutoff)
    val d1 = keyed(Curate.packTokenIdsIncremental(existing, fresh,
      "__ids", "doc_id", 512, "source")
      .select("source", "seq_id", "token_ids", "n_tokens").collect())
    val d2 = keyed(Curate.packTokenIdsIncremental(existing, fresh,
      "__ids", "doc_id", 512, "source", skewRobust = true)
      .select("source", "seq_id", "token_ids", "n_tokens").collect())
    assert(d1 == d2, "skew-robust incremental delta diverged")
  }

  test("skew-robust pack FAILS LOUDLY on duplicate (shard, id) keys " +
      "instead of silently multiplying payloads; guard adds no exchange") {
    val dup = Seq(
      ("a", 1L, Seq(1, 2, 3)), ("a", 1L, Seq(4, 5)),
      ("a", 2L, Seq(6)), ("b", 1L, Seq(7, 8)))
      .toDF("source", "doc_id", "__ids")
    // the window form packs duplicate keys as separate rows; the join
    // form would multiply them (4 rows from the 2 duplicates) — the
    // in-plan guard turns that silent corruption into an error
    def allMsgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Exception] {
      Curate.packTokenIdsSkewRobust(dup, "__ids", "doc_id",
        budget = 512, shardCol = "source").collect()
    }
    assert(allMsgs(e).contains("duplicate (shard, id) key"),
      s"wrong failure: ${allMsgs(e)}")
    // same guard on the incremental skew leg (the path
    // ShardSink.append(skewRobust) exposes to the persistent store)
    val existing = Curate.packTokenIds(
      Seq(("a", 0L, Seq(9))).toDF("source", "doc_id", "__ids"),
      "__ids", "doc_id", 512, "source").localCheckpoint(true)
    val e2 = intercept[Exception] {
      Curate.packTokenIdsIncremental(existing, dup, "__ids", "doc_id",
        512, "source", skewRobust = true).collect()
    }
    assert(allMsgs(e2).contains("duplicate (shard, id) key"),
      s"wrong failure: ${allMsgs(e2)}")
    // the guard window must ride the running count's exchange + sort:
    // Exchange count identical to the unguarded r13 plan shape (the
    // narrow cum frame costs ONE shuffle on the shard key; the merge
    // join adds its two; the final grouping one — the guard adds zero)
    val unique = Seq(("a", 1L, Seq(1)), ("b", 2L, Seq(2)))
      .toDF("source", "doc_id", "__ids")
    val plan = Curate.packTokenIdsSkewRobust(unique, "__ids", "doc_id",
        512, "source")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 4,
      s"duplicate-key guard added an exchange: $exchanges in\n$plan")
  }

  test("packTokenIdsIncremental: delta == full repack's new/changed " +
      "sequences; shipped full sequences never re-emit; tail tops up") {
    import graft.functions.BpeByteVocab
    val all = spark.read.parquet(docsParquet)
      .filter(col("text").isNotNull).limit(60)
      .withColumn("__ids",
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      .localCheckpoint(true)
    // old corpus = first two thirds by id, new batch = the rest (new ids
    // sort after old, so incremental must equal the full repack exactly)
    val ids = all.select("doc_id").as[Long].collect().sorted
    val cutoff = ids(ids.length * 2 / 3)
    val old = all.filter(col("doc_id") <= cutoff)
    val fresh = all.filter(col("doc_id") > cutoff)
    val budget = 512
    val existing = Curate.packTokenIds(old, "__ids", "doc_id",
      budget, "source").localCheckpoint(true)
    val delta = Curate.packTokenIdsIncremental(existing, fresh,
      "__ids", "doc_id", budget, "source").collect()
    val full = Curate.packTokenIds(all, "__ids", "doc_id",
      budget, "source").collect()
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    def ids3(r: org.apache.spark.sql.Row) = r.getSeq[Int](2)
    val fullMap = full.map(r => key(r) -> ids3(r)).toMap
    val existMap = existing.collect().map(r => key(r) -> ids3(r)).toMap
    // every delta sequence matches the full repack bit-for-bit
    delta.foreach { r =>
      assert(fullMap(key(r)) == ids3(r), s"delta diverges at ${key(r)}") }
    // delta covers exactly the sequences the repack changed or added
    val expectedDelta = fullMap.keySet.filter { k =>
      existMap.get(k) match {
        case Some(prev) => prev != fullMap(k) // the topped-up partial
        case None => true                     // brand-new sequence
      }
    } -- existMap.keySet.filter(k => // shards with no new docs: no delta
      !delta.exists(r => r.getString(0) == k._1))
    val deltaKeys = delta.map(key).toSet
    assert(deltaKeys.subsetOf(fullMap.keySet))
    expectedDelta.filter(k => deltaKeys.exists(_._1 == k._1)).foreach { k =>
      assert(deltaKeys.contains(k), s"missing delta seq $k") }
    // no shipped FULL sequence re-emits
    existing.collect().filter(_.getInt(3) == budget).map(key).foreach { k =>
      assert(!deltaKeys.contains(k), s"full shipped seq $k re-emitted") }
    // malformed existing layout (an over-budget row) fails loudly
    val bogus = Seq(("s0", 0L, Array.fill(budget + 1)(1), budget + 1))
      .toDF("source", "seq_id", "token_ids", "n_tokens")
    assertThrows[Exception] {
      Curate.packTokenIdsIncremental(bogus, fresh, "__ids", "doc_id",
        budget, "source").collect()
    }
    // a mid-shard PARTIAL sequence (only the max seq_id may be short)
    // fails loudly instead of silently corrupting __base
    val midPartial = Seq(
      ("s0", 0L, Array.fill(10)(1), 10),          // partial, NOT the tail
      ("s0", 1L, Array.fill(budget)(1), budget))
      .toDF("source", "seq_id", "token_ids", "n_tokens")
    assertThrows[Exception] {
      Curate.packTokenIdsIncremental(midPartial, fresh, "__ids", "doc_id",
        budget, "source").collect()
    }
    // duplicated / non-dense seq_ids fail loudly
    val dupSeq = Seq(
      ("s0", 0L, Array.fill(budget)(1), budget),
      ("s0", 0L, Array.fill(budget)(1), budget))
      .toDF("source", "seq_id", "token_ids", "n_tokens")
    assertThrows[Exception] {
      Curate.packTokenIdsIncremental(dupSeq, fresh, "__ids", "doc_id",
        budget, "source").collect()
    }
    val gapSeq = Seq(
      ("s0", 1L, Array.fill(budget)(1), budget),  // no seq_id 0
      ("s0", 2L, Array.fill(7)(1), 7))
      .toDF("source", "seq_id", "token_ids", "n_tokens")
    assertThrows[Exception] {
      Curate.packTokenIdsIncremental(gapSeq, fresh, "__ids", "doc_id",
        budget, "source").collect()
    }
  }

  test("byte tier: trainer is deterministic, order-independent, and " +
      "early-stops when nothing repeats") {
    val texts = Seq("low lower lowest", "New NEWER newest", "low low new")
    val a = Bpe.trainBytes(texts, 16)
    val b = Bpe.trainBytes(texts.reverse, 16)
    assert(a == b)
    assert(a.nonEmpty)
    assert(Bpe.trainBytes(Seq("xy"), 10).isEmpty ||
      Bpe.trainBytes(Seq("xy"), 10).size <= 1)
    // case is NOT folded at the byte tier: "New" vs "new" share no pair
    // with each other through lowercasing (the char tier would)
    val enc1 = Bpe.encodeBytesStr("NEWER", a)
    val enc2 = Bpe.encodeBytesStr("newer", a)
    assert(enc1 != enc2)
  }

  test("compressionGate: natural text passes, random gibberish flags " +
      "low_compression, NULL text routes to null_text") {
    import graft.functions.BpeByteVocab
    val rng = new scala.util.Random(5)
    val gibberish = (1 to 300).map(_ => ('!' + rng.nextInt(90)).toChar).mkString
    val natural = spark.read.parquet(docsParquet)
      .selectExpr("text").limit(1).collect()(0).getString(0)
    val df = Seq((1L, natural), (2L, gibberish),
        (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Curate.compressionGate(df, "text", BpeByteVocab.merges,
      minRatioTenths = 30).orderBy("id").collect()
    // corpus-distribution text compresses far above 3 bytes/token
    assert(out(0).getAs[String]("compress_reason") == null, out(0).toString)
    assert(out(0).getAs[Long]("n_bytes") > out(0).getAs[Long]("n_tokens"))
    // uniform printable noise stays near 1 byte/token under a vocab
    // trained on natural text — the junk signature the gate exists for
    assert(out(1).getAs[String]("compress_reason") == "low_compression",
      s"gibberish ratio: ${out(1).getAs[Long]("n_bytes")}/" +
        s"${out(1).getAs[Long]("n_tokens")}")
    assert(out(2).getAs[String]("compress_reason") == "null_text")
    assert(out(2).isNullAt(out(2).fieldIndex("n_bytes")))
  }

  test("packSequences honors a caller-provided tokenCountCol") {
    val df = Seq((1L, "x", "a"), (2L, "y", "a"), (3L, "z", "a"))
      .toDF("id", "text", "src")
      .withColumn("my_count", col("id") * 100)
    val out = Curate.packSequences(df, "text", "id", budget = 250,
        shardCol = "src", tokenCountCol = Some("my_count"))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("token_count")).toSeq == Seq(100L, 200L, 300L))
    // cum = 0, 100, 300 -> seq_id = 0, 0, 1
    assert(out.map(_.getAs[Long]("seq_id")).toSeq == Seq(0L, 0L, 1L))
  }

  test("mixCorpus weightCol budgets by token mass, not doc count") {
    // two strata, same doc counts, 10x different weight mass
    val docs = ((1L to 100L).map(i => (i, "light", 10L)) ++
      (101L to 200L).map(i => (i, "heavy", 100L))).toDF("id", "src", "w")
    val counts = Curate.strataCounts(docs, "src", Seq("light", "heavy"),
      weightCol = Some("w"))
    assert(counts == Map("light" -> 1000L, "heavy" -> 10000L))
    val mixed = Curate.mixCorpus(docs, "src", "id",
        Map("light" -> 0.5, "heavy" -> 0.5), budget = 2000L,
        weightCol = Some("w"))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // light: budget share 1000 tokens / 1000 mass -> rate 1.0, keep all 100
    assert(mixed("light") == 100L)
    // heavy: 1000 / 10000 -> rate 0.1 of docs (hash-deterministic band)
    assert(mixed("heavy") < 30L && mixed("heavy") > 1L, mixed.toString)
  }

  test("chunkSliding over BPE tokens rejoins losslessly with joinSep empty") {
    val df = Seq((1L, "spark fast spark fast spark")).toDF("id", "text")
      .withColumn("bpe", split(Bpe.applyMerges(col("text"), BpeVocab.merges), ""))
    val chunks = Curate.chunkSliding(df, "text", "id", chunkSize = 4,
        stride = 4, tokensCol = Some("bpe"), joinSep = "")
      .orderBy("chunk_id").collect()
    val enc = Bpe.encodeStr("spark fast spark fast spark", BpeVocab.merges)
    assert(chunks.map(_.getAs[String]("chunk_text")).mkString == enc)
    assert(chunks.map(_.getAs[Long]("n_tokens")).sum == enc.length)
  }
}
